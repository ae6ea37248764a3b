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
  /** Interval-OVERLAP join: pairs (a, b) with
    * `[a.lo, a.hi] ∩ [b.lo, b.hi] ≠ ∅` (closed intervals:
    * `a.lo ≤ b.hi ∧ b.lo ≤ a.hi`) — the temporal/genomic sibling of the
    * point-in-range join, where BOTH sides are intervals and Spark's
    * native plan is again the nested loop.
    *
    * Both sides explode to their covered bins and equi-join on the bin
    * key; the exact overlap predicate filters inside the bin. A true pair
    * shares every bin its overlap spans, so instead of a post-join
    * `distinct` (a second shuffle of the full result) the join CREDITS
    * exactly one bin — the one containing the overlap's START,
    * `max(a.lo, b.lo)`, which both intervals cover by definition — as a
    * third equi-side conjunct evaluated in codegen. One shuffle, no dedup,
    * O(pairs-that-overlap) output.
    *
    * `binWidth` ≈ the median interval span keeps per-interval fan-out ~2;
    * `maxBinsPerInterval` is the runaway guard (one year-long interval in
    * a seconds-binned table would otherwise explode to 31 M rows —
    * raising is a deliberate act). Column names must be disjoint across
    * the two sides (the output carries both).
    */
  def intervalOverlapJoin(left: DataFrame, loL: String, hiL: String,
      right: DataFrame, loR: String, hiR: String,
      binWidth: Double, maxBinsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left/right column names must be disjoint (output carries both)")
    def binned(df: DataFrame, lo: String, hi: String) = {
      val b0 = floor(col(lo) / binWidth).cast("long")
      val b1 = floor(col(hi) / binWidth).cast("long")
      // fan-out guard FAILS (raise_error) rather than silently dropping
      // or truncating the offending interval — both would lose matches
      df.withColumn("__bin", explode(
          when(b1 - b0 < maxBinsPerInterval, sequence(b0, b1))
            .otherwise(expr(
              "raise_error('interval spans more bins than " +
                "maxBinsPerInterval — raising the cap is a deliberate act')"
            ).cast("array<bigint>"))))
    }
    val a = binned(left, loL, hiL).as("a")
    val b = binned(right, loR, hiR).as("b")
    val creditBin = floor(
      greatest(col(s"a.$loL"), col(s"b.$loR")) / binWidth).cast("long")
    a.join(b,
        col("a.__bin") === col("b.__bin") &&
          col(s"a.$loL") <= col(s"b.$hiR") &&
          col(s"b.$loR") <= col(s"a.$hiL") &&
          col("a.__bin") === creditBin)
      .select(left.columns.map(c => col(s"a.$c")) ++
        right.columns.map(c => col(s"b.$c")): _*)
  }

  def naiveRangeJoin(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String): DataFrame =
    points.crossJoin(ranges)
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
}
