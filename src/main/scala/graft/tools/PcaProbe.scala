package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Pca

/** Captured-variance probe for the embed_pca floor (builder tool). */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val m = Pca.fit(emb, "embedding", 8)
      val frac = m.eigenvalues.take(8).sum / m.totalVariance
      println(f"$sf captured8=$frac%.4f totalVar=${m.totalVariance}%.4f")
    }
    spark.stop()
  }
}
