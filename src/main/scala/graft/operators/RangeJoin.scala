package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: `points.value ∈ [ranges.lo, ranges.hi)` as an
  * EQUI-join.
  *
  * Spark's built-in planning for a pure range predicate is
  * BroadcastNestedLoopJoin — O(|points| × |ranges|) comparisons and a
  * broadcast of one whole side, which dies at 100 TB. Binning restores
  * hash-partitioned parallelism: each point maps to ONE bin
  * (`floor(p / w)`), each range explodes to every bin it covers
  * (`floor(lo/w) .. floor(hi/w)` — compact when `w` is chosen near the
  * typical range span), the equi-join on bin runs as a normal shuffled hash
  * join, and the exact `[lo, hi)` predicate filters within the bin. A
  * (point, range) match lands in exactly one bin — the point's — so the
  * result needs no dedup.
  *
  * Pick `binWidth` ≈ the median range span: the per-range bin fan-out is
  * then ~2 rows, and bin populations stay balanced. Pathological skew (one
  * giant range) fans that range across many bins, which is exactly the
  * replication a parallel plan wants.
  */
object RangeJoin {

  def binnedRangeJoin(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val r = ranges.withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(r, Seq("_bin"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }

  /** Reference semantics (cross join + filter) — validation only; the plan
    * this operator exists to avoid. */
  def naiveRangeJoin(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String): DataFrame =
    points.crossJoin(ranges)
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
}
