package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.TableCatalog

/** Scratch probe: macro-averaged batch-ANN recall (IVF and PQ persisted
  * layouts) at each SF, to pin the sim_ann_*_batch floor comments to
  * measured values. (Temporary tool — not part of the engine surface.)
  */
object BatchAnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = TableCatalog.load(spark, dir, "embeddings")
      val queries = emb.where(pmod(col("vec_id"), lit(25)) === 0)
      val exact = Similarity.bruteForceBatchTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", 10).localCheckpoint(false)

      def macroRecall(ann: org.apache.spark.sql.DataFrame): Double =
        exact.select(col("q_id"), col("vec_id").as("eid"))
          .join(ann.select(col("q_id"), col("vec_id").as("eid"))
            .withColumn("m", lit(1)), Seq("q_id", "eid"), "left")
          .groupBy(col("q_id"))
          .agg(count(lit(1)).as("n"), count(col("m")).as("h"))
          .agg(avg(col("h") / col("n"))).head().getDouble(0)

      val ivfPath = java.nio.file.Files.createTempDirectory("probe_ivfb_")
        .toString
      Similarity.ivfWrite(emb, "vec_id", "embedding", ivfPath,
        nLists = 16, kMeansIters = 2)
      val rIvf = macroRecall(Similarity.ivfBatchTopK(spark, ivfPath,
        queries, "vec_id", "embedding", 10, nProbe = 8))

      val pqPath = java.nio.file.Files.createTempDirectory("probe_pqb_")
        .toString
      Similarity.pqWrite(emb, "vec_id", "embedding", pqPath,
        m = 16, ksub = 32, kMeansIters = 2)
      val rPq = macroRecall(Similarity.pqBatchTopK(spark, pqPath,
        queries, "vec_id", "embedding", 10, rerank = 64))

      val sqPath = java.nio.file.Files.createTempDirectory("probe_sqb_")
        .toString
      Similarity.ivfSqWrite(emb, "vec_id", "embedding", sqPath,
        nLists = 16, kMeansIters = 2)
      val rSq = macroRecall(Similarity.ivfSqBatchTopK(spark, sqPath,
        queries, "vec_id", "embedding", 10, nProbe = 12, rerank = 64))

      val bqPath = java.nio.file.Files.createTempDirectory("probe_bqb_")
        .toString
      Similarity.ivfBqWrite(emb, "vec_id", "embedding", bqPath,
        nLists = 16, kMeansIters = 2)
      val rBq = macroRecall(Similarity.ivfBqBatchTopK(spark, bqPath,
        queries, "vec_id", "embedding", 10, nProbe = 12, rerank = 128))

      println(f"[$sf] n_queries=${queries.count()} ivf_batch_recall=$rIvf%.3f pq_batch_recall=$rPq%.3f ivfsq_batch_recall=$rSq%.3f ivfbq_batch_recall=$rBq%.3f")
    }
    spark.stop()
  }
}
