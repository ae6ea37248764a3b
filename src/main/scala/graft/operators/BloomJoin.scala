package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit Bloom-filter semi-join reduction: build a Bloom filter over the
  * build side's keys (distributed partial sketches merged driver-side —
  * `DataFrame.stat.bloomFilter`), broadcast it, and pre-filter the probe
  * side MAP-SIDE before its shuffle; an exact left-semi join then removes
  * the false positives, so the result is row-identical to the plain semi
  * join.
  *
  * When to reach for it (vs letting Catalyst work): Spark's own runtime
  * bloom filter (InjectRuntimeFilter, pinned in PlanAuditSpec) only fires
  * for selective-scan creation sides within one query plan and inside its
  * size thresholds. This operator is the USER-DRIVEN form for everything
  * outside that envelope — a build side that is itself a computed frame, a
  * probe reused across several queries, or a build too big to broadcast as
  * a join hash table but whose bloom fits comfortably (~1.2 MB per million
  * keys at 1% fpp, vs 8+ bytes/key plus object overhead for the hash
  * relation). At 100 TB the probe shuffle then moves matches + fpp·misses
  * instead of every row.
  *
  * The probe filter is a Scala UDF over a broadcast — deliberate: the
  * built-in `might_contain` expression is internal-only (reserved for the
  * optimizer rule), and a literal-embedded bloom would bloat the plan; a
  * broadcast-closing UDF is the standard production shape. Null probe keys
  * are dropped up front (a semi join never matches them).
  */
object BloomJoin {

  /** Exact left-semi join of `probe` against `build`, bloom-reduced before
    * the shuffle.
    *
    * @param expectedItems sizing for the bloom (distinct build keys); pass
    *                      a known bound to skip the sizing count pass
    * @param fpp           target false-positive rate
    */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long = 0L, fpp: Double = 0.01): DataFrame = {
    // The bloom hashes raw key bytes, so probe and build must agree on the
    // key's dataType EXACTLY. A plain semi join would implicitly coerce
    // (long probe vs string build still matches); the bloom pre-filter would
    // hash the two representations differently and silently drop genuine
    // matches — violating the row-identical contract. Fail fast instead.
    val probeType = probe.schema(probeKey).dataType
    val buildType = build.schema(buildKey).dataType
    require(probeType == buildType,
      s"bloomSemiJoin requires identical key types; got probe $probeKey: " +
        s"${probeType.simpleString} vs build $buildKey: " +
        s"${buildType.simpleString}. Cast both sides to a common type first.")
    val keys = build.select(col(buildKey)).where(col(buildKey).isNotNull)
    // Sizing pass only when the caller has no bound — one column-pruned
    // scan of the build side (cheap next to the probe scan it saves).
    val n = if (expectedItems > 0L) expectedItems
      else math.max(keys.count(), 1L)
    val bf = keys.stat.bloomFilter(buildKey, n, fpp)
    val spark = probe.sparkSession
    val bcast = spark.sparkContext.broadcast(bf)
    val isString = probe.schema(probeKey).dataType ==
      org.apache.spark.sql.types.StringType
    val mightContain: Column =
      if (isString) udf((k: String) => bcast.value.mightContainString(k))
        .apply(col(probeKey))
      else udf((k: Long) => bcast.value.mightContainLong(k))
        .apply(col(probeKey).cast("long"))
    probe
      .where(col(probeKey).isNotNull && mightContain)
      .join(build.select(col(buildKey).as(probeKey)),
        Seq(probeKey), "left_semi")
  }
}
