package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.TableCatalog

/** Scratch probe: macro-averaged batch recall of the SQ8 / BQ / raw-IVF
  * read paths at the STAGED 10× corpus under the at-scale layout policy
  * (nLists ∝ n → two-level hier regime) — evidence the quantized tiers
  * hold their recall when the coarse quantizer goes hierarchical, not
  * just at the flat gate configs. (Temporary tool — not part of the
  * engine surface.)
  */
object ScaleRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = TableCatalog.load(spark, dir, "embeddings")
    val n = emb.count()
    val nLists = math.max(16, (n / 125L).toInt)
    // 1-in-250 queries keeps the brute-force baseline tractable at 10×
    val queries = emb.where(pmod(col("vec_id"), lit(250)) === 0)
    val exact = Similarity.bruteForceBatchTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10).localCheckpoint(false)
    def macroRecall(ann: org.apache.spark.sql.DataFrame): Double =
      exact.select(col("q_id"), col("vec_id").as("eid"))
        .join(ann.select(col("q_id"), col("vec_id").as("eid"))
          .withColumn("m", lit(1)), Seq("q_id", "eid"), "left")
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n"), count(col("m")).as("h"))
        .agg(avg(col("h") / col("n"))).head().getDouble(0)
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString

    val ivfPath = tmp("srp_ivf_")
    Similarity.ivfWrite(emb, "vec_id", "embedding", ivfPath,
      nLists = nLists, kMeansIters = 1)
    for (np <- Seq(4, 12, 24, 48)) {
      val r = macroRecall(Similarity.ivfBatchTopK(spark, ivfPath,
        queries, "vec_id", "embedding", 10, nProbe = np))
      println(f"[scale-recall] ivf nProbe=$np recall=$r%.3f")
    }
    val rIvf = macroRecall(Similarity.ivfBatchTopK(spark, ivfPath,
      queries, "vec_id", "embedding", 10, nProbe = 12))
    // the self-sizing DEFAULT (nProbe = AutoProbe → autoNProbe(nLists)) —
    // the r9 verdict's ask: default recall must HOLD across layouts
    // instead of decaying with nLists ∝ n
    val auto = Similarity.autoNProbe(nLists)
    val t0 = System.nanoTime()
    val rAuto = macroRecall(Similarity.ivfBatchTopK(spark, ivfPath,
      queries, "vec_id", "embedding", 10))
    val autoSec = (System.nanoTime() - t0) / 1e9
    println(f"[scale-recall] ivf AUTO nProbe=$auto recall=$rAuto%.3f " +
      f"(${autoSec}%.1fs)")

    val sqPath = tmp("srp_sq_")
    Similarity.ivfSqWrite(emb, "vec_id", "embedding", sqPath,
      nLists = nLists, kMeansIters = 1)
    val rSq = macroRecall(Similarity.ivfSqBatchTopK(spark, sqPath,
      queries, "vec_id", "embedding", 10, nProbe = 12, rerank = 64))
    val rSqAuto = macroRecall(Similarity.ivfSqBatchTopK(spark, sqPath,
      queries, "vec_id", "embedding", 10))

    val bqPath = tmp("srp_bq_")
    Similarity.ivfBqWrite(emb, "vec_id", "embedding", bqPath,
      nLists = nLists, kMeansIters = 1)
    val rBq = macroRecall(Similarity.ivfBqBatchTopK(spark, bqPath,
      queries, "vec_id", "embedding", 10, nProbe = 12, rerank = 128))
    val rBqAuto = macroRecall(Similarity.ivfBqBatchTopK(spark, bqPath,
      queries, "vec_id", "embedding", 10))

    println(f"[scale-recall] n=$n nLists=$nLists queries=${queries.count()} " +
      f"fixed12: ivf=$rIvf%.3f sq8=$rSq%.3f bq=$rBq%.3f | " +
      f"auto($auto): ivf=$rAuto%.3f sq8=$rSqAuto%.3f bq=$rBqAuto%.3f")
    spark.stop()
  }
}
