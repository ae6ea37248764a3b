package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Explicit Bloom-filter semi-join reduction: build a Bloom filter over the
  * build side's keys with Spark's native `bloom_filter_agg` (distributed
  * partial sketches, merged in the aggregate — never on the driver), probe
  * it MAP-SIDE with the codegen'd `might_contain` expression before the
  * probe shuffle; an exact left-semi join then removes the false positives,
  * so the result is row-identical to the plain semi join.
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
  * The probe predicate is `BloomFilterMightContain(scalar-subquery,
  * xxhash64(key))` — the exact shape InjectRuntimeFilter plants, which is
  * the ONLY shape the expression's type check admits (constant or scalar
  * subquery). It stays inside whole-stage codegen; the previous
  * implementation probed through a Scala UDF, which closed over a broadcast
  * fine but broke codegen in the hot probe path (VERDICT r5 item 5). Both
  * sides hash through XxHash64(seed=42), matching what the aggregate's
  * update path expects (LongType child).
  *
  * Null probe keys are dropped up front (a semi join never matches them).
  */
object BloomJoin {

  /** `bloom_filter_agg` / `might_contain` are internal expressions (no
    * public registry entry); expose them to the SQL parser under graft names
    * so the scalar-subquery probe shape is expressible. Idempotent.
    */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      es => es match {
        case Seq(k, n, bits) =>
          new BloomFilterAggregate(new XxHash64(Seq(k)), n, bits)
            .toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(key, estimatedItems, numBits)")
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      es => es match {
        case Seq(bloom, k) => BloomFilterMightContain(bloom, new XxHash64(Seq(k)))
        case _ => throw new IllegalArgumentException(
          "graft_might_contain(bloom, key)")
      },
      "built-in")
  }

  // Unique-per-build temp-view names for the scalar subquery (the subquery
  // resolves against the catalog at analysis time, so the view must outlive
  // this call; a monotonic suffix keeps repeated calls from aliasing each
  // other's builds).
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

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
    val spark = probe.sparkSession
    registerFunctions(spark)
    val keys = build.select(col(buildKey).as("k")).where(col("k").isNotNull)
    // Sizing pass only when the caller has no bound — one column-pruned
    // scan of the build side (cheap next to the probe scan it saves).
    val n = if (expectedItems > 0L) expectedItems
      else math.max(keys.count(), 1L)
    // Optimal bits for the target fpp: m = -n·ln(p)/ln(2)²; the aggregate
    // itself caps at spark.sql.optimizer.runtime.bloomFilter.maxNumBits.
    val numBits = math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val viewName = s"graft_bloom_build_${viewSeq.incrementAndGet()}"
    keys.createOrReplaceTempView(viewName)
    val pred = expr(
      s"""graft_might_contain(
         |  (SELECT graft_bloom_agg(k, ${n}L, ${numBits}L) FROM $viewName),
         |  `$probeKey`)""".stripMargin)
    probe
      .where(col(probeKey).isNotNull && pred)
      .join(build.select(col(buildKey).as(probeKey)),
        Seq(probeKey), "left_semi")
  }
}
