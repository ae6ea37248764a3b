package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** As-of join semantics on crafted rows: inclusive match, no-match nulls,
  * most-recent-wins, per-key isolation.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("matches the most recent right row at or before the left timestamp") {
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:05")),
      (2L, 10L, ts("2024-01-01 10:00:10")),
      (3L, 20L, ts("2024-01-01 09:00:00")), // before any quote
      (4L, 30L, ts("2024-01-01 12:00:00"))  // key with no quotes at all
    ).toDF("trade_id", "acct", "t_ts")
    val quotes = Seq(
      (10L, ts("2024-01-01 10:00:00"), 100.0),
      (10L, ts("2024-01-01 10:00:10"), 101.0), // equal ts: inclusive
      (20L, ts("2024-01-01 09:30:00"), 50.0)
    ).toDF("acct", "q_ts", "px")
    val out = AsOfJoin.asOfLeftJoin(trades, quotes, "acct", "t_ts", "q_ts")
      .orderBy("trade_id")
      .select($"trade_id", $"px", $"q_ts")
      .as[(Long, Option[Double], Option[java.sql.Timestamp])].collect()
    assert(out(0) == ((1L, Some(100.0), Some(ts("2024-01-01 10:00:00")))))
    assert(out(1) == ((2L, Some(101.0), Some(ts("2024-01-01 10:00:10")))))
    assert(out(2) == ((3L, None, None)))
    assert(out(3) == ((4L, None, None)))
  }

  test("left row count is preserved (left join semantics)") {
    val ev = graft.sources.TableCatalog.load(spark, sf0001, "events")
    val purchases = ev.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val views = ev.where($"event_type" === "view")
      .groupBy($"user_id", $"ts".as("view_ts"))
      .agg(max($"event_id").as("view_event_id"))
    val joined = AsOfJoin.asOfLeftJoin(purchases, views, "user_id", "ts", "view_ts")
    assert(joined.count() == purchases.count())
    // every matched view precedes (or equals) its purchase
    val bad = joined.where($"view_ts".isNotNull && $"view_ts" > $"ts").count()
    assert(bad == 0)
  }
}
