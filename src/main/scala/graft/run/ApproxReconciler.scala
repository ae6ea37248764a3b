package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable approximate reconciliation for 100 TB runs (SURVEY.md §7.3).
  *
  * The reference reconciles with an exact `count()` per extraction — fine
  * per run, but distinct-key reconciliation ACROSS many runs/parts would
  * need a re-scan of everything. HLL sketches (Spark's built-in
  * DataSketches functions) make the per-run artifact mergeable: each run
  * persists a small binary sketch of its key column; any subset of runs can
  * be unioned and estimated without touching the data again.
  */
object ApproxReconciler {

  /** One binary HLL sketch of `keyCol` for a run — store next to the ledger
    * row (kilobytes, regardless of row count). */
  def keySketch(df: DataFrame, keyCol: String, lgK: Int = 12): Array[Byte] =
    df.agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("sk"))
      .head().getAs[Array[Byte]]("sk")

  /** Merge previously persisted sketches and estimate the distinct-key
    * count across all of them — the cross-run reconciliation the exact
    * count cannot do without a full re-scan. */
  def estimateDistinct(spark: SparkSession, sketches: Seq[Array[Byte]]): Long = {
    import spark.implicits._
    sketches.toDF("sk")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
  }

  /** Exact distinct count for validation at test scale. */
  def exactDistinct(df: DataFrame, keyCol: String): Long =
    df.select(keyCol).distinct().count()
}
