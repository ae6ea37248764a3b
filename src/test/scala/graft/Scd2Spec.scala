package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** SCD2 compression semantics on crafted histories: run collapsing, A→B→A
  * reopen, null-state runs, multi-column state, same-ts tiebreak, and the
  * incremental merge (extend-open vs close-open vs untouched-closed).
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private val K = Seq("k")
  private val S = Seq("state")

  private def compress(rows: Seq[(Long, java.sql.Date, Long, String)]) =
    Scd2.fromEvents(rows.toDF("k", "ts", "seq", "state"), K, "ts", Seq("seq"), S)

  test("consecutive equal states collapse; A->B->A reopens a new interval") {
    val out = compress(Seq(
      (1L, d("2024-01-01"), 1L, "A"),
      (1L, d("2024-01-05"), 2L, "A"), // same run
      (1L, d("2024-02-01"), 3L, "B"),
      (1L, d("2024-03-01"), 4L, "A")  // re-entry: NEW interval, not merged
    )).orderBy("effective_from")
      .as[(Long, String, java.sql.Date, Option[java.sql.Date], Boolean, Long)]
      .collect()
    assert(out.toSeq == Seq(
      (1L, "A", d("2024-01-01"), Some(d("2024-02-01")), false, 2L),
      (1L, "B", d("2024-02-01"), Some(d("2024-03-01")), false, 1L),
      (1L, "A", d("2024-03-01"), None, true, 1L)))
  }

  test("null states form runs (null-safe comparison), keys are independent") {
    val out = Scd2.fromEvents(Seq(
      (1L, d("2024-01-01"), 1L, Option.empty[String]),
      (1L, d("2024-01-02"), 2L, Option.empty[String]),
      (1L, d("2024-01-03"), 3L, Some("A")),
      (2L, d("2024-01-01"), 1L, Some("A"))
    ).toDF("k", "ts", "seq", "state"), K, "ts", Seq("seq"), S)
    assert(out.count() == 3)
    val k1 = out.where($"k" === 1).orderBy("effective_from")
      .select($"state", $"n_events", $"is_current")
      .as[(Option[String], Long, Boolean)].collect().toSeq
    assert(k1 == Seq((None, 2L, false), (Some("A"), 1L, true)))
    assert(out.where($"k" === 2).select($"is_current").as[Boolean].head())
  }

  test("same-ts events break ties deterministically on tieBreak order") {
    val out = compress(Seq(
      (1L, d("2024-01-01"), 2L, "B"),
      (1L, d("2024-01-01"), 1L, "A") // seq 1 first => A opens, B follows
    )).orderBy("effective_from", "n_events")
      .select($"state", $"is_current").as[(String, Boolean)].collect().toSeq
    assert(out == Seq(("A", false), ("B", true)))
  }

  test("multi-column state changes when ANY tracked column changes") {
    val df = Seq(
      (1L, d("2024-01-01"), 1L, "A", 10),
      (1L, d("2024-01-02"), 2L, "A", 11), // second col changed
      (1L, d("2024-01-03"), 3L, "A", 11)
    ).toDF("k", "ts", "seq", "s1", "s2")
    val out = Scd2.fromEvents(df, K, "ts", Seq("seq"), Seq("s1", "s2"))
    assert(out.count() == 2)
    assert(out.where($"is_current").select($"s2").as[Int].head() == 11)
  }

  test("applyChanges: closed rows untouched, open extended or closed") {
    val current = Scd2.fromEvents(Seq(
      (1L, d("2024-01-01"), 1L, "A"),
      (1L, d("2024-02-01"), 2L, "B"), // k=1 open in B since Feb
      (2L, d("2024-01-01"), 1L, "X")  // k=2 open in X
    ).toDF("k", "ts", "seq", "state"), K, "ts", Seq("seq"), S)
    val batch = Seq(
      (1L, d("2024-03-01"), 3L, "B"), // same state: extend, no new version
      (2L, d("2024-03-01"), 3L, "Y")  // changed: close X at Mar, open Y
    ).toDF("k", "ts", "seq", "state")
    val merged = Scd2.applyChanges(current, batch, K, "ts", Seq("seq"), S)
    val k1 = merged.where($"k" === 1).orderBy("effective_from")
      .select($"state", $"effective_to".isNull, $"n_events")
      .as[(String, Boolean, Long)].collect().toSeq
    // closed A row byte-identical (1 event); open B absorbed the new
    // event (opening event + extension = 2)
    assert(k1 == Seq(("A", false, 1L), ("B", true, 2L)))
    val k2 = merged.where($"k" === 2).orderBy("effective_from")
      .select($"state", $"effective_to", $"is_current")
      .as[(String, Option[java.sql.Date], Boolean)].collect().toSeq
    assert(k2 == Seq(("X", Some(d("2024-03-01")), false), ("Y", None, true)))
  }

  test("applyChanges failOnLateEvents rejects events predating the open interval") {
    val current = Scd2.fromEvents(Seq(
      (1L, d("2024-01-01"), 1L, "A"),
      (1L, d("2024-02-01"), 2L, "B") // open B since Feb
    ).toDF("k", "ts", "seq", "state"), K, "ts", Seq("seq"), S)
    val late = Seq((1L, d("2024-01-15"), 3L, "C")) // inside closed A history
      .toDF("k", "ts", "seq", "state")
    val e = intercept[IllegalArgumentException] {
      Scd2.applyChanges(current, late, K, "ts", Seq("seq"), S,
        failOnLateEvents = true)
    }
    assert(e.getMessage.contains("predate"))
    // an in-order batch passes untouched under the same guard
    val ok = Seq((1L, d("2024-03-01"), 3L, "C")).toDF("k", "ts", "seq", "state")
    val merged = Scd2.applyChanges(current, ok, K, "ts", Seq("seq"), S,
      failOnLateEvents = true)
    assert(merged.where($"is_current").select($"state").as[String].head() == "C")
  }

  test("partitionLateEvents quarantines only events predating their open interval") {
    val current = Scd2.fromEvents(Seq(
      (1L, d("2024-01-01"), 1L, "A"),
      (1L, d("2024-02-01"), 2L, "B"), // k=1 open B since Feb
      (2L, d("2024-01-01"), 1L, "X")  // k=2 open X since Jan
    ).toDF("k", "ts", "seq", "state"), K, "ts", Seq("seq"), S)
    val batch = Seq(
      (1L, d("2024-01-15"), 3L, "C"), // late: inside k=1's closed history
      (1L, d("2024-03-01"), 4L, "C"), // on-time for k=1
      (2L, d("2024-01-01"), 5L, "Y"), // equal to open_from: on-time (>=)
      (9L, d("2020-01-01"), 6L, "Z")  // unknown key: on-time by definition
    ).toDF("k", "ts", "seq", "state")
    val (onTime, late) = Scd2.partitionLateEvents(current, batch, K, "ts")
    assert(late.select($"seq").as[Long].collect().toSeq == Seq(3L))
    assert(onTime.select($"seq").as[Long].collect().sorted.toSeq ==
      Seq(4L, 5L, 6L))
    assert(onTime.columns.toSeq == batch.columns.toSeq) // no helper leakage
    // the quarantined remainder applies cleanly under the strict guard
    val merged = Scd2.applyChanges(current, onTime, K, "ts", Seq("seq"), S,
      failOnLateEvents = true)
    assert(merged.where($"k" === 1 && $"is_current")
      .select($"state").as[String].head() == "C")
  }

  test("applyChanges folded over event-time-ordered batches == batch recompute") {
    // Random-ish (seeded) event stream over 20 keys / 5 states, split into
    // 5 event-time windows and folded through applyChanges — the stream-
    // maintenance shape. Must equal fromEvents over the union on every
    // column except n_events (open intervals re-enter as one event).
    val rnd = new scala.util.Random(42)
    val events = (1 to 400).map { i =>
      (rnd.nextInt(20).toLong, d(f"202${i / 100}%d-0${1 + rnd.nextInt(8)}%d-0${1 + rnd.nextInt(9)}%d"),
        i.toLong, s"S${rnd.nextInt(5)}")
    }
    val df = events.toDF("k", "ts", "seq", "state")
    val batchResult = Scd2.fromEvents(df, K, "ts", Seq("seq"), S)
      .drop("n_events")
    val bounds = Seq("2021-01-01", "2022-01-01", "2023-01-01", "2023-06-01")
      .map(d)
    val windows: Seq[org.apache.spark.sql.DataFrame] = {
      val lows = d("1900-01-01") +: bounds
      val highs = bounds :+ d("2100-01-01")
      lows.zip(highs).map { case (lo, hi) =>
        df.where($"ts" >= lit(lo) && $"ts" < lit(hi)) }
    }
    val folded = windows.tail.foldLeft(
      Scd2.fromEvents(windows.head, K, "ts", Seq("seq"), S)) { (cur, b) =>
        Scd2.applyChanges(cur, b, K, "ts", Seq("seq"), S)
      }.drop("n_events")
    assert(folded.exceptAll(batchResult).isEmpty &&
      batchResult.exceptAll(folded).isEmpty,
      "incremental fold diverged from batch recompute")
  }

  test("intervals tile each key: next effective_from == previous effective_to") {
    val orders = graft.sources.TableCatalog.load(spark, sf0001, "orders")
    val hist = Scd2.fromEvents(orders, Seq("o_custkey"), "o_orderdate",
      Seq("o_orderkey"), Seq("o_orderpriority"))
    // Secondary order on effective_to keeps the check deterministic when
    // two intervals of one key share an effective_from (same-ts events).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey")
      .orderBy($"effective_from", $"effective_to".asc_nulls_last)
    val bad = hist
      .withColumn("next_from", lead($"effective_from", 1).over(w))
      .where(($"effective_to" =!= $"next_from") ||
        ($"effective_to".isNull =!= $"next_from".isNull))
    assert(bad.count() == 0)
    // exactly one open row per key
    val opens = hist.groupBy($"o_custkey")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("n"))
      .where($"n" =!= 1)
    assert(opens.count() == 0)
    // total n_events equals source row count
    val total = hist.agg(sum($"n_events")).as[Long].head()
    assert(total == orders.count())
  }
}
