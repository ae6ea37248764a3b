package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.IncrementalJoin
import graft.sinks.{PosixLinkCommitStore, SnapshotLake}

/** Delta-maintained join view: fold-of-deltas ≡ one-shot join recompute
  * under interleaved fact/dim appends, orphan promotion, idempotent replay,
  * up-to-date no-op, vacuumed-watermark fail-fast.
  */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val store = PosixLinkCommitStore

  private def freshBase() = Files.createTempDirectory("graft_ijoin_")

  test("random interleaved appends: view equals the one-shot inner join") {
    val rnd = new scala.util.Random(7L)
    val base = freshBase()
    val (fact, dim, view) = (base.resolve("fact").toString,
      base.resolve("dim").toString, base.resolve("view").toString)
    val facts = scala.collection.mutable.Buffer.empty[(Long, Long)]
    val dims = scala.collection.mutable.Buffer.empty[(Long, String)]
    var nextDimKey = 0L

    // dim starts with 5 keys; facts may reference keys up to 4 ahead of
    // what the dim has (late-arriving dimension rows → orphans)
    def appendDim(n: Int): Unit = {
      val rows = (0 until n).map { _ =>
        nextDimKey += 1; (nextDimKey, s"name$nextDimKey") }
      dims ++= rows
      SnapshotLake.commitAppend(rows.toDF("k", "name"), dim, store)
    }
    appendDim(5)

    for (batch <- 1 to 5) {
      val rows = (1 to 120).map { i =>
        ((rnd.nextInt(nextDimKey.toInt + 4) + 1).toLong,
          batch * 1000L + i) }
      facts ++= rows
      SnapshotLake.commitAppend(rows.toDF("k", "v"), fact, store)
      if (batch % 2 == 0) appendDim(3) // interleave dim growth
      IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)

      val got = IncrementalJoin.read(spark, view, store)
        .select("k", "v", "name").as[(Long, Long, String)]
        .collect().toSeq.sorted
      val dimMap = dims.toMap
      val want = facts.toSeq.collect { case (k, v) if dimMap.contains(k) =>
        (k, v, dimMap(k)) }.sorted
      assert(got == want, s"after batch $batch")
      // orphan store holds exactly the facts awaiting their dim row
      val orphans = SnapshotLake.read(spark, view + "_orphans", None, store)
        .select("k", "v").as[(Long, Long)].collect().toSeq.sorted
      val wantOrphans = facts.toSeq.filterNot(f => dimMap.contains(f._1)).sorted
      assert(orphans == wantOrphans, s"orphans after batch $batch")
    }
  }

  test("a dim-only append promotes orphans without touching fact history") {
    val base = freshBase()
    val (fact, dim, view) = (base.resolve("fact").toString,
      base.resolve("dim").toString, base.resolve("view").toString)
    SnapshotLake.commitAppend(Seq((1L, "a")).toDF("k", "name"), dim, store)
    SnapshotLake.commitAppend(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), fact, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    assert(IncrementalJoin.read(spark, view, store).count() == 1)

    SnapshotLake.commitAppend(Seq((2L, "b")).toDF("k", "name"), dim, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    val got = IncrementalJoin.read(spark, view, store)
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().toSeq.sorted
    assert(got == Seq((1L, 10L, "a"), (2L, 20L, "b")))
    assert(SnapshotLake.read(spark, view + "_orphans", None, store)
      .count() == 0)
  }

  test("up-to-date refresh is a version no-op; replay dedups") {
    val base = freshBase()
    val (fact, dim, view) = (base.resolve("fact").toString,
      base.resolve("dim").toString, base.resolve("view").toString)
    SnapshotLake.commitAppend(Seq((1L, "a")).toDF("k", "name"), dim, store)
    SnapshotLake.commitAppend(Seq((1L, 10L)).toDF("k", "v"), fact, store)
    val v1 = IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    val v2 = IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    assert(v1 == v2)
    assert(IncrementalJoin.read(spark, view, store).count() == 1)
  }

  test("crash between view append and orphan overwrite: next refresh " +
      "repairs the orphan store without double-appending") {
    val base = freshBase()
    val (fact, dim, view) = (base.resolve("fact").toString,
      base.resolve("dim").toString, base.resolve("view").toString)
    SnapshotLake.commitAppend(Seq((1L, "a")).toDF("k", "name"), dim, store)
    SnapshotLake.commitAppend(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), fact, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    // late dim row arrives; simulate a refresh that appended the promoted
    // delta to the view and then DIED before the orphan overwrite
    SnapshotLake.commitAppend(Seq((2L, "b")).toDF("k", "name"), dim, store)
    SnapshotLake.commitAppendIdempotent(
      Seq((2L, 20L, "b")).toDF("k", "v", "name"), view, "joinfold-0-1", store)
    // orphan store is now stale: still holds the already-promoted (2, 20)
    assert(SnapshotLake.read(spark, view + "_orphans", None, store)
      .count() == 1)

    val v = IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    assert(v == SnapshotLake.versions(view, store).max)
    val got = IncrementalJoin.read(spark, view, store)
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().toSeq.sorted
    assert(got == Seq((1L, 10L, "a"), (2L, 20L, "b")),
      "repair must not double-append the promoted row")
    assert(SnapshotLake.read(spark, view + "_orphans", None, store)
      .count() == 0, "repair must complete the orphan overwrite")

    // and the maintainer keeps working after the repair
    SnapshotLake.commitAppend(Seq((3L, 30L)).toDF("k", "v"), fact, store)
    SnapshotLake.commitAppend(Seq((3L, "c")).toDF("k", "name"), dim, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    assert(IncrementalJoin.read(spark, view, store).count() == 3)
  }

  test("crash repair still triggers when NEW fact/dim commits land before " +
      "the next refresh (no silent orphan loss)") {
    val base = freshBase()
    val (fact, dim, view) = (base.resolve("fact").toString,
      base.resolve("dim").toString, base.resolve("view").toString)
    SnapshotLake.commitAppend(Seq((1L, "a")).toDF("k", "name"), dim, store)
    SnapshotLake.commitAppend(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), fact, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    // late dim row arrives; a refresh appends the promoted delta to the
    // view and DIES before the orphan overwrite...
    SnapshotLake.commitAppend(Seq((2L, "b")).toDF("k", "name"), dim, store)
    SnapshotLake.commitAppendIdempotent(
      Seq((2L, 20L, "b")).toDF("k", "v", "name"), view, "joinfold-0-1", store)
    // ...and BEFORE the next refresh, a new fact batch lands, including a
    // row (3, 30) whose dim key hasn't arrived — the pre-fix repair gate
    // (head == current max versions) missed this case and the row was
    // never written to the orphan store
    SnapshotLake.commitAppend(
      Seq((1L, 11L), (3L, 30L)).toDF("k", "v"), fact, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    val got = IncrementalJoin.read(spark, view, store)
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().toSeq.sorted
    assert(got == Seq((1L, 10L, "a"), (1L, 11L, "a"), (2L, 20L, "b")),
      "repair + advance must not double-append or drop matched rows")
    val orphans = SnapshotLake.read(spark, view + "_orphans", None, store)
      .select("k", "v").as[(Long, Long)].collect().toSeq
    assert(orphans == Seq((3L, 30L)),
      "the crashed fold's repair must not lose the new batch's orphan")
    // the late dim key can still promote it
    SnapshotLake.commitAppend(Seq((3L, "c")).toDF("k", "name"), dim, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    assert(IncrementalJoin.read(spark, view, store).count() == 4)
    assert(SnapshotLake.read(spark, view + "_orphans", None, store)
      .count() == 0)
  }

  test("a foreign commit atop the orphan store neither forces repair loops " +
      "nor breaks the up-to-date no-op") {
    val base = freshBase()
    val (fact, dim, view) = (base.resolve("fact").toString,
      base.resolve("dim").toString, base.resolve("view").toString)
    SnapshotLake.commitAppend(Seq((1L, "a")).toDF("k", "name"), dim, store)
    SnapshotLake.commitAppend(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), fact, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    // a compaction-style rewrite lands on the orphan store with a foreign
    // tag: the joinfold tag is now only DEEPER in its history
    val orphanState = SnapshotLake.read(spark, view + "_orphans", None, store)
      .select("k", "v").as[(Long, Long)].collect().toSeq
    SnapshotLake.commitOverwrite(
      orphanState.toDF("k", "v"), view + "_orphans", store)
    val viewVs = SnapshotLake.versions(view, store)
    val v = IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    assert(v == viewVs.max && SnapshotLake.versions(view, store) == viewVs,
      "history-scan must see the completed overwrite: no recompute loop")
    // and the maintainer still advances correctly afterwards
    SnapshotLake.commitAppend(Seq((2L, "b")).toDF("k", "name"), dim, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    assert(IncrementalJoin.read(spark, view, store).count() == 2)
  }

  test("repair refuses (fail-loud) when the orphan store no longer proves " +
      "the predecessor fold state — replaying would duplicate orphans") {
    val base = freshBase()
    val (fact, dim, view) = (base.resolve("fact").toString,
      base.resolve("dim").toString, base.resolve("view").toString)
    SnapshotLake.commitAppend(Seq((1L, "a")).toDF("k", "name"), dim, store)
    SnapshotLake.commitAppend(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), fact, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    // simulate a crashed next fold: its view append landed...
    SnapshotLake.commitAppend(Seq((2L, "b")).toDF("k", "name"), dim, store)
    SnapshotLake.commitAppendIdempotent(
      Seq((2L, 20L, "b")).toDF("k", "v", "name"), view, "joinfold-0-1", store)
    // ...and the orphan store's tagged history was vacuumed away, so the
    // predecessor state (joinfold-0-0) can no longer be verified
    Files.delete(java.nio.file.Paths.get(
      view + "_orphans", "_manifests", "v00000000000.json"))
    val ex = intercept[IllegalArgumentException] {
      IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    }
    assert(ex.getMessage.contains("rebuild the view"))
  }

  test("bootstrap repair stays self-healing even when foreign commits + " +
      "vacuum erase the orphan tag history (replay reads no orphan state)") {
    val base = freshBase()
    val (fact, dim, view) = (base.resolve("fact").toString,
      base.resolve("dim").toString, base.resolve("view").toString)
    SnapshotLake.commitAppend(Seq((1L, "a")).toDF("k", "name"), dim, store)
    SnapshotLake.commitAppend(
      Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), fact, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    // a foreign compaction rewrites the orphan store, then vacuum deletes
    // the bootstrap fold's tagged version — the tag history is gone
    val orphanState = SnapshotLake.read(spark, view + "_orphans", None, store)
      .select("k", "v").as[(Long, Long)].collect().toSeq
    SnapshotLake.commitOverwrite(
      orphanState.toDF("k", "v"), view + "_orphans", store)
    Files.delete(java.nio.file.Paths.get(
      view + "_orphans", "_manifests", "v00000000000.json"))
    // bootstrap replay reads NO orphan state (orphans derive from the fact
    // snapshot; the overwrite is idempotent) — it must heal, not refuse
    val v = IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    assert(v == SnapshotLake.versions(view, store).max)
    val got = IncrementalJoin.read(spark, view, store)
      .select("k", "v", "name").as[(Long, Long, String)]
      .collect().toSeq.sorted
    assert(got == Seq((1L, 10L, "a")), "replay must not duplicate the view")
    assert(SnapshotLake.read(spark, view + "_orphans", None, store)
      .select("k", "v").as[(Long, Long)].collect().toSeq == orphanState)
    // and the healed history makes the NEXT refresh a plain no-op
    val v2 = IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    assert(v2 == v && SnapshotLake.versions(view, store).max == v)
  }

  test("a vacuumed fact watermark fails fast instead of re-joining") {
    val base = freshBase()
    val (fact, dim, view) = (base.resolve("fact").toString,
      base.resolve("dim").toString, base.resolve("view").toString)
    SnapshotLake.commitAppend(Seq((1L, "a")).toDF("k", "name"), dim, store)
    SnapshotLake.commitAppend(Seq((1L, 10L)).toDF("k", "v"), fact, store)
    IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    SnapshotLake.commitAppend(Seq((1L, 11L)).toDF("k", "v"), fact, store)
    Files.delete(java.nio.file.Paths.get(
      fact, "_manifests", "v00000000000.json"))
    intercept[IllegalArgumentException] {
      IncrementalJoin.refresh(spark, fact, dim, view, Seq("k"), store)
    }
  }
}
