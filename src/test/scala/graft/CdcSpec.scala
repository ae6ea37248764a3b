package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.{PosixLinkCommitStore, SnapshotLake}
import graft.streaming.ChangeDataCapture

/** CDC changelog apply: LWW collapse, cross-batch ordering guards,
  * exactly-once replay, delete semantics, streaming end-to-end.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val store = PosixLinkCommitStore
  private def fresh(name: String) =
    Files.createTempDirectory("graft_cdc_").resolve(name).toString

  private def chg(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("k", "ts", "tie", "op", "v")

  private def state(t: String): Set[(Long, Long, Double)] =
    SnapshotLake.read(spark, t, None, store)
      .select($"k", $"ts", $"v").as[(Long, Long, Double)].collect().toSet

  test("single batch: newest change per key wins; deletes drop; absent-key delete no-ops") {
    val t = fresh("m")
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 10L, 1L, "I", 1.0), (1L, 20L, 2L, "U", 2.0),
        (2L, 10L, 3L, "I", 5.0), (2L, 30L, 4L, "D", 0.0),
        (3L, 15L, 5L, "I", 7.0),
        (4L, 9L, 6L, "D", 0.0)), // delete for a key never inserted
      Seq("k"), "ts", "tie", "op", Seq("v"), store = store)
    assert(state(t) == Set((1L, 20L, 2.0), (3L, 15L, 7.0)))
  }

  test("cross-batch LWW: an out-of-order older batch cannot regress rows") {
    val t = fresh("m")
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 100L, 1L, "I", 9.0), (2L, 100L, 2L, "I", 8.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b0"), store = store)
    // older updates + an older delete arrive late: both must lose LWW
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 50L, 3L, "U", 1.0), (2L, 60L, 4L, "D", 0.0),
        (5L, 70L, 5L, "I", 3.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b1"), store = store)
    assert(state(t) == Set((1L, 100L, 9.0), (2L, 100L, 8.0), (5L, 70L, 3.0)))
    // and a genuinely newer batch updates/deletes
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 200L, 6L, "U", 11.0), (2L, 200L, 7L, "D", 0.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b2"), store = store)
    assert(state(t) == Set((1L, 200L, 11.0), (5L, 70L, 3.0)))
  }

  test("replayed batch converges on its first run's versions (exactly-once)") {
    val t = fresh("m")
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 10L, 1L, "I", 1.0)), Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b0"), store = store)
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 20L, 2L, "U", 2.0), (2L, 5L, 3L, "D", 0.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b1"), store = store)
    val vs = SnapshotLake.versions(t, store)
    val s = state(t)
    // zombie replay of BOTH batches: no new versions, no state change
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 10L, 1L, "I", 1.0)), Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b0"), store = store)
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 20L, 2L, "U", 2.0), (2L, 5L, 3L, "D", 0.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b1"), store = store)
    assert(SnapshotLake.versions(t, store) == vs)
    assert(state(t) == s)
  }

  test("one file per micro-batch: many ordered applies, same final state") {
    val t = fresh("m")
    val src = Files.createTempDirectory("graft_cdcsrc_")
      .resolve("chg").toString
    // ts monotone across files => cross-batch order matches event order
    // and the no-tombstone caveat cannot bite
    val rows = (1 to 120).map { i =>
      (i % 10L, i.toLong, i.toLong, if (i % 11 == 0) "D" else "U", i * 2.0) }
    rows.grouped(30).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("k", "ts", "tie", "op", "v").coalesce(1)
        .write.mode(if (i == 0) "overwrite" else "append").parquet(src) }
    val schema = spark.read.parquet(src).schema
    val q = ChangeDataCapture.streamChangelogToLake(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(src),
      t, Seq("k"), "ts", "tie", "op", Seq("v"),
      Files.createTempDirectory("graft_cdcchk_").toString, store)
    try q.processAllAvailable() finally q.stop()
    val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val newest = rs.maxBy(r => (r._2, r._3))
      if (newest._4 == "D") None else Some((k, newest._2, newest._5))
    }.toSet
    assert(state(t) == want)
    assert(SnapshotLake.versions(t, store).size >= 4,
      "multiple micro-batches must each have committed")
  }

  test("tombstones: an older update a batch AFTER the delete stays dead; " +
      "a newer update resurrects and clears the tombstone") {
    val t = fresh("m"); val tt = t + "_tombstones"
    val opts = Some(tt)
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 10L, 1L, "I", 1.0), (2L, 10L, 2L, "I", 5.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b0"), store = store, tombstoneTable = opts)
    // batch 1: delete k=1 at ts=100
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 100L, 3L, "D", 0.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b1"), store = store, tombstoneTable = opts)
    assert(state(t) == Set((2L, 10L, 5.0)))
    // batch 2: an OLDER out-of-order update for k=1 — without tombstones
    // this resurrected the row; with them it must stay dead
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 50L, 4L, "U", 9.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b2"), store = store, tombstoneTable = opts)
    assert(state(t) == Set((2L, 10L, 5.0)), "older-than-delete update must not resurrect")
    // batch 3: a genuinely NEWER update re-inserts and clears the tombstone
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 200L, 5L, "U", 7.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b3"), store = store, tombstoneTable = opts)
    assert(state(t) == Set((1L, 200L, 7.0), (2L, 10L, 5.0)))
    assert(SnapshotLake.read(spark, tt, None, store).count() == 0,
      "re-born key must clear its tombstone")
  }

  test("tombstones: replayed batch converges (exactly-once incl. the store)") {
    val t = fresh("m"); val tt = t + "_tombstones"
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 10L, 1L, "I", 1.0)), Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b0"), store = store, tombstoneTable = Some(tt))
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 100L, 2L, "D", 0.0)), Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b1"), store = store, tombstoneTable = Some(tt))
    val vs = SnapshotLake.versions(t, store)
    val tvs = SnapshotLake.versions(tt, store)
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 100L, 2L, "D", 0.0)), Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b1"), store = store, tombstoneTable = Some(tt))
    assert(SnapshotLake.versions(t, store) == vs)
    assert(SnapshotLake.versions(tt, store) == tvs)
  }

  test("tombstones without a dedupPrefix: every batch's tombstone commit " +
      "applies (no shared-key dedup against batch 1)") {
    val t = fresh("m"); val tt = t + "_tombstones"
    // batch callers may omit dedupPrefix (always-apply semantics); the
    // tombstone commit must then NOT reuse one constant idempotency key —
    // doing so deduped every later batch's tombstone state against the
    // first one (ADVICE r7)
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 10L, 1L, "I", 1.0), (2L, 10L, 2L, "I", 5.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      store = store, tombstoneTable = Some(tt))
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 100L, 3L, "D", 0.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      store = store, tombstoneTable = Some(tt))
    assert(SnapshotLake.read(spark, tt, None, store).count() == 1)
    // batch 3 deletes ANOTHER key: with the old constant key this commit
    // silently dedup-skipped and k=2's delete was never tombstoned
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((2L, 110L, 4L, "D", 0.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      store = store, tombstoneTable = Some(tt))
    assert(SnapshotLake.read(spark, tt, None, store)
      .select($"k").as[Long].collect().toSet == Set(1L, 2L),
      "later batches' deletes must land in the tombstone store")
    // an older out-of-order update for k=2 must now stay dead
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((2L, 60L, 5L, "U", 9.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      store = store, tombstoneTable = Some(tt))
    assert(state(t).isEmpty, "both deleted keys must stay dead")
    // and a re-born key clears its tombstone (the clear must also apply)
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 200L, 6L, "U", 7.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      store = store, tombstoneTable = Some(tt))
    assert(SnapshotLake.read(spark, tt, None, store)
      .select($"k").as[Long].collect().toSet == Set(2L))
  }

  test("crash window: merges committed but tombstone overwrite missing — " +
      "replay completes the tombstone without changing the mirror") {
    val t = fresh("m"); val tt = t + "_tombstones"
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 10L, 1L, "I", 1.0), (2L, 10L, 2L, "I", 5.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b0"), store = store, tombstoneTable = Some(tt))
    // batch 1 "crashes" after its merges but before the tombstone
    // overwrite: simulate by applying it with the tombstone disabled —
    // identical mirror commits land (same dedup keys), no tombstone commit
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 100L, 3L, "D", 0.0), (2L, 90L, 4L, "U", 6.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b1"), store = store, tombstoneTable = None)
    val mirrorVs = SnapshotLake.versions(t, store)
    val tombVsBefore = SnapshotLake.versions(tt, store)
    // recovery replays batch 1 WITH the tombstone enabled: it must
    // re-filter upserts against the OLD tombstone state, dedup-skip both
    // merges (mirror versions unchanged), and complete the tombstone commit
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 100L, 3L, "D", 0.0), (2L, 90L, 4L, "U", 6.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b1"), store = store, tombstoneTable = Some(tt))
    assert(SnapshotLake.versions(t, store) == mirrorVs,
      "replay must not re-apply the already-committed merges")
    assert(SnapshotLake.versions(tt, store) != tombVsBefore,
      "replay must complete the missing tombstone commit")
    assert(SnapshotLake.read(spark, tt, None, store)
      .select($"k", $"ts").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 100L)), "tombstone store must converge to batch 1's deletes")
    assert(state(t) == Set((2L, 90L, 6.0)))
    // the completed tombstone now guards batch 2's older out-of-order upsert
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 50L, 5L, "U", 9.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"),
      dedupPrefix = Some("b2"), store = store, tombstoneTable = Some(tt))
    assert(state(t) == Set((2L, 90L, 6.0)),
      "pre-delete upsert must stay dead after the repaired tombstone")
  }

  test("tombstones: retention vacuums by event time; beyond the window an " +
      "old update may resurrect (the documented watermark bound)") {
    val t = fresh("m"); val tt = t + "_tombstones"
    val ret = Some(100L)
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 10L, 1L, "I", 1.0), (2L, 10L, 2L, "I", 2.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"), dedupPrefix = Some("b0"),
      store = store, tombstoneTable = Some(tt), tombstoneRetentionMs = ret)
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 100L, 3L, "D", 0.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"), dedupPrefix = Some("b1"),
      store = store, tombstoneTable = Some(tt), tombstoneRetentionMs = ret)
    assert(SnapshotLake.read(spark, tt, None, store).count() == 1)
    // event time advances past ts=100+ret → the tombstone is vacuumed
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((2L, 500L, 4L, "U", 3.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"), dedupPrefix = Some("b2"),
      store = store, tombstoneTable = Some(tt), tombstoneRetentionMs = ret)
    assert(SnapshotLake.read(spark, tt, None, store).count() == 0,
      "tombstone older than (batch max ts - retention) must vacuum")
    // a later out-of-order pre-delete update now resurrects — allowed by
    // the bounded-retention contract, exactly like watermark-evicted state
    ChangeDataCapture.applyChangelogBatch(spark, t,
      chg((1L, 50L, 5L, "U", 9.0)),
      Seq("k"), "ts", "tie", "op", Seq("v"), dedupPrefix = Some("b3"),
      store = store, tombstoneTable = Some(tt), tombstoneRetentionMs = ret)
    assert(state(t).contains((1L, 50L, 9.0)))
  }

  test("streaming end-to-end equals the batch replay") {
    val t = fresh("m")
    val src = Files.createTempDirectory("graft_cdcsrc_")
      .resolve("chg").toString
    val rows = (1 to 300).map { i =>
      (i % 40L, i.toLong, i.toLong,
        if (i % 7 == 0) "D" else "U", i * 1.5) }
    rows.toDF("k", "ts", "tie", "op", "v").repartition(3)
      .write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = ChangeDataCapture.streamChangelogToLake(
      spark.readStream.schema(schema).parquet(src),
      t, Seq("k"), "ts", "tie", "op", Seq("v"),
      Files.createTempDirectory("graft_cdcchk_").toString, store)
    try q.processAllAvailable() finally q.stop()
    // batch truth: newest change per key; D => absent
    val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val newest = rs.maxBy(r => (r._2, r._3))
      if (newest._4 == "D") None else Some((k, newest._2, newest._5))
    }.toSet
    assert(state(t) == want)
  }
}
