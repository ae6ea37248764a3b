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
      binWidth: Long, maxBinsPerRange: Long = 100000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val loBin = floor(col(loCol) / binWidth).cast("long")
    val hiBin = floor(col(hiCol) / binWidth).cast("long")
    // Fail fast on pathological fan-out (an open-ended sentinel hi, or a
    // binWidth far below the range spans, would ask sequence() for millions
    // of elements per row and die mid-shuffle with an opaque error).
    val guarded = when(hiBin - loBin >= maxBinsPerRange,
      raise_error(concat(lit(s"range spans more than $maxBinsPerRange bins " +
        s"at binWidth=$binWidth; widen binWidth or clean the range: lo="),
        col(loCol).cast("string"), lit(" hi="), col(hiCol).cast("string"))))
      .otherwise(hiBin)
    val r = ranges.withColumn("_bin", explode(sequence(loBin, guarded)))
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
