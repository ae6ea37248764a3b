package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Similarity
/** Recall/latency probe for PQ parameter choices (builder tool). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet").cache()
      val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
        .as[(Long, Double)].collect().map(_._1).toSet
      for ((m, ks, it, rr) <- Seq((16,32,1,64),(16,32,1,128),(12,32,2,64),(16,32,2,64))) {
        val t0 = System.nanoTime
        val pq = Similarity.pqTopK(emb, "vec_id", "embedding", 0L, 10, m, ks, it, rr)
          .as[(Long, Double)].collect().map(_._1).toSet
        val rec = pq.intersect(brute).size
        println(f"$sf m=$m ks=$ks it=$it rr=$rr recall=$rec/10 ${(System.nanoTime-t0)/1e9}%.1fs")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
