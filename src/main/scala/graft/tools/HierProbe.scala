package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.TableCatalog

/** Scratch probe: macro-averaged batch-ANN recall of the TWO-LEVEL IVF
  * read path vs the flat literal path at nLists ∝ n, across probe widths —
  * pins the hier spec's floor and the superProbe default to measured
  * values. (Temporary tool — not part of the engine surface.)
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
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

    for (nLists <- Seq(100)) {
      val path = java.nio.file.Files.createTempDirectory("probe_hier_")
        .toString
      Similarity.ivfWrite(emb, "vec_id", "embedding", path,
        nLists = nLists, kMeansIters = 1)
      for (nProbe <- Seq(8, 16, 24, 32)) {
        val r = macroRecall(Similarity.ivfBatchTopK(spark, path, queries,
          "vec_id", "embedding", 10, nProbe = nProbe))
        println(f"[hier] nLists=$nLists nProbe=$nProbe recall=$r%.3f")
      }
    }
    // IVFADC: flat gate config (nLists=16 — the sim_ann_* gate family) and
    // the at-scale hier config, across SFs
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dirN = s"/root/testdata/$sf"
      val embN = TableCatalog.load(spark, dirN, "embeddings")
      val queriesN = embN.where(pmod(col("vec_id"), lit(25)) === 0)
      val exactN = Similarity.bruteForceBatchTopK(embN, "vec_id",
        "embedding", queriesN, "vec_id", "embedding", 10)
        .localCheckpoint(false)
      def macroRecallN(ann: org.apache.spark.sql.DataFrame): Double =
        exactN.select(col("q_id"), col("vec_id").as("eid"))
          .join(ann.select(col("q_id"), col("vec_id").as("eid"))
            .withColumn("m", lit(1)), Seq("q_id", "eid"), "left")
          .groupBy(col("q_id"))
          .agg(count(lit(1)).as("n"), count(col("m")).as("h"))
          .agg(avg(col("h") / col("n"))).head().getDouble(0)
      val p16 = java.nio.file.Files.createTempDirectory("probe_ivfpq_")
        .toString
      Similarity.ivfPqWrite(embN, "vec_id", "embedding", p16,
        nLists = 16, m = 16, ksub = 32, kMeansIters = 2)
      for (nProbe <- Seq(8, 12)) {
        val r = macroRecallN(Similarity.ivfPqBatchTopK(spark, p16, queriesN,
          "vec_id", "embedding", 10, nProbe = nProbe, rerank = 64))
        println(f"[ivfpq] $sf nLists=16 nProbe=$nProbe recall=$r%.3f")
      }
    }
    spark.stop()
  }
}
