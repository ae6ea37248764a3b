package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned range join: result-identical to the naive cross-join form, with an
  * equi-join plan (no BroadcastNestedLoopJoin / CartesianProduct).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // distinct: the synthetic lineitem does not enforce PK uniqueness, and
  // the per-point match-count assertion needs a unique point identity
  private lazy val points = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select(col("l_orderkey"), col("l_linenumber"),
      col("l_extendedprice").as("p"))
    .distinct()

  private lazy val ranges = Seq(
    // overlapping bands, one spanning many bins, one empty, one point-width
    (0L, 0.0, 20000.0), (1L, 15000.0, 25000.0), (2L, 24000.0, 24000.5),
    (3L, 1.0e7, 2.0e7))
    .toDF("range_id", "lo", "hi")

  test("binned join equals naive cross-join semantics") {
    val binned = RangeJoin.binnedRangeJoin(points, "p", ranges, "lo", "hi",
      binWidth = 5000)
    val naive = RangeJoin.naiveRangeJoin(points, "p", ranges, "lo", "hi")
    assert(binned.count() == naive.count())
    assert(binned.except(naive).isEmpty && naive.except(binned).isEmpty)
    // a point inside two overlapping bands matched both, exactly once each
    val overlapHits = binned.where(col("p") >= 15000 && col("p") < 20000)
      .groupBy(col("l_orderkey"), col("l_linenumber"), col("p"))
      .count().agg(min("count"), max("count")).head()
    assert(overlapHits.getLong(0) == 2 && overlapHits.getLong(1) == 2)
  }

  test("plan is an equi-join on bins, not a nested-loop") {
    val plan = RangeJoin.binnedRangeJoin(points, "p", ranges, "lo", "hi",
      binWidth = 5000).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop in plan:\n$plan")
  }

  test("degenerate inputs: empty ranges, zero-width range") {
    val empty = ranges.where(col("range_id") < 0)
    assert(RangeJoin.binnedRangeJoin(points, "p", empty, "lo", "hi", 100).isEmpty)
    intercept[IllegalArgumentException] {
      RangeJoin.binnedRangeJoin(points, "p", ranges, "lo", "hi", 0)
    }
  }

  test("pathological fan-out fails fast with a clear message") {
    val wild = Seq((0L, 0.0, 1.0e15)).toDF("range_id", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.binnedRangeJoin(points, "p", wild, "lo", "hi",
        binWidth = 400, maxBinsPerRange = 1000).count()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("bins") || e.getCause != null))
  }
  test("intervalOverlapJoin == naive cross filter; closed endpoints; no dup pairs") {
    val rnd = new scala.util.Random(13)
    val a = (1 to 80).map { i =>
      val lo = rnd.nextInt(2000).toDouble
      (i.toLong, lo, lo + rnd.nextInt(900)) }.toDF("aid", "lo", "hi")
    val b = (1 to 120).map { i =>
      val lo = rnd.nextInt(2500).toDouble
      (i.toLong, lo, lo + rnd.nextInt(400)) }.toDF("bid", "b_lo", "b_hi")
    val got = graft.operators.RangeJoin.intervalOverlapJoin(
        a, "lo", "hi", b, "b_lo", "b_hi", binWidth = 300)
      .select($"aid", $"bid").as[(Long, Long)].collect().toSeq
    val want = a.crossJoin(b)
      .where($"lo" <= $"b_hi" && $"b_lo" <= $"hi")
      .select($"aid", $"bid").as[(Long, Long)].collect().toSeq
    assert(got.sorted == want.sorted, "must equal naive incl. multiplicity")
    assert(got.size == got.toSet.size, "each overlapping pair exactly once")

    // exact endpoint touch is an overlap under closed intervals
    val t1 = Seq((1L, 0.0, 100.0)).toDF("aid", "lo", "hi")
    val t2 = Seq((9L, 100.0, 200.0)).toDF("bid", "b_lo", "b_hi")
    assert(graft.operators.RangeJoin.intervalOverlapJoin(
      t1, "lo", "hi", t2, "b_lo", "b_hi", binWidth = 64).count() == 1)

    // the fan-out guard raises instead of silently dropping the interval
    val wide = Seq((1L, 0.0, 1e9)).toDF("aid", "lo", "hi")
    intercept[Exception] {
      graft.operators.RangeJoin.intervalOverlapJoin(
        wide, "lo", "hi", t2, "b_lo", "b_hi", binWidth = 1.0,
        maxBinsPerInterval = 1000).count()
    }
  }
}
