package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.TableCatalog

/** Scratch probe: raw recall/precision values for the hash-dependent
  * sketch queries at each SF, to pick metric-floor thresholds with margin.
  * (Temporary tool — not part of the engine surface.)
  */
object MetricProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = TableCatalog.load(spark, dir, "documents")
        .repartition(16)
      val emb = TableCatalog.load(spark, dir, "embeddings")

      val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 8, 0.2)
        .localCheckpoint(false)
      val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 8, 64, 32, 0.4)
        .select(col("id_a"), col("id_b")).localCheckpoint(false)
      val exact = truth.where(col("jaccard") >= 0.4)
      val nExact = exact.count(); val nLsh = lsh.count()
      val nHit = exact.join(lsh, Seq("id_a", "id_b")).count()
      val nLoose = lsh.join(truth.select(col("id_a"), col("id_b")),
        Seq("id_a", "id_b")).count()
      println(f"[$sf] minhash n_exact=$nExact n_lsh=$nLsh recall=${
        nHit.toDouble / math.max(nExact, 1)}%.3f precision_loose=${
        nLoose.toDouble / math.max(nLsh, 1)}%.3f")

      val truthHi = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 8, 0.8)
        .select(col("id_a"), col("id_b")).localCheckpoint(false)
      val sh = Dedup.simhashPairs(docs, "doc_id", "text", 3)
        .select(col("id_a"), col("id_b")).localCheckpoint(false)
      val nHi = truthHi.count()
      val nShHit = truthHi.join(sh, Seq("id_a", "id_b")).count()
      println(f"[$sf] simhash n_exact_hi=$nHi n_sh=${sh.count()} recall=${
        nShHit.toDouble / math.max(nHi, 1)}%.3f")

      val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
        .localCheckpoint(false)
      val lshAnn = Similarity.lshTopK(emb, "vec_id", "embedding", 0L, 10, 4)
      val lshHit = bf.select("vec_id").join(lshAnn.select("vec_id"), "vec_id").count()
      val sumCos = bf.agg(round(sum("cos"), 6)).head().getDouble(0)
      val ivfRecalls = (for (nProbe <- Seq(4, 8); iters <- Seq(0, 2)) yield {
        val ivfAnn = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, 16,
          nProbe, iters)
        val hit = bf.select("vec_id").join(ivfAnn.select("vec_id"), "vec_id").count()
        s"p$nProbe/i$iters=${hit / 10.0}"
      }).mkString(" ")
      println(f"[$sf] ann sum_cos=$sumCos lsh_recall=${lshHit / 10.0}%.2f ivf_recall $ivfRecalls")
    }
    spark.stop()
  }
}
