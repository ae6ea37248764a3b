package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.SnapshotLake

/** Manifest-snapshot lake: atomic commits, time travel, snapshot-isolated
  * readers, optimistic version allocation, vacuum of unreferenced files.
  */
class SnapshotLakeSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_snap_").resolve("t").toString

  test("append commits accumulate; overwrite replaces; all versions readable") {
    val t = freshTable()
    val v0 = SnapshotLake.commitAppend(Seq((1, "a"), (2, "b")).toDF("id", "s"), t)
    val v1 = SnapshotLake.commitAppend(Seq((3, "c")).toDF("id", "s"), t)
    val v2 = SnapshotLake.commitOverwrite(Seq((9, "z")).toDF("id", "s"), t)
    assert(Seq(v0, v1, v2) == Seq(0L, 1L, 2L))
    assert(SnapshotLake.read(spark, t, Some(0)).count() == 2)
    assert(SnapshotLake.read(spark, t, Some(1)).count() == 3)
    assert(SnapshotLake.read(spark, t).select("id").as[Int].collect().toSeq == Seq(9))
  }

  test("a pinned reader is isolated from later commits") {
    val t = freshTable()
    SnapshotLake.commitAppend(Seq((1, "a")).toDF("id", "s"), t)
    val pinned = SnapshotLake.read(spark, t, Some(0))
    SnapshotLake.commitAppend(Seq((2, "b")).toDF("id", "s"), t)
    SnapshotLake.commitOverwrite(Seq((3, "c")).toDF("id", "s"), t)
    // the pinned frame still reads only v0's files
    assert(pinned.select("id").as[Int].collect().toSeq == Seq(1))
  }

  test("losing a version race retries at the next version") {
    val t = freshTable()
    SnapshotLake.commitAppend(Seq((1, "a")).toDF("id", "s"), t)
    // simulate a concurrent winner claiming v1 (same file set as v0 — a
    // no-op append that won the race)
    val mdir = java.nio.file.Paths.get(t, "_manifests")
    Files.copy(mdir.resolve("v00000000000.json"),
      mdir.resolve("v00000000001.json"))
    val v = SnapshotLake.commitAppend(Seq((2, "b")).toDF("id", "s"), t)
    assert(v == 2L, s"allocated version $v")
    assert(SnapshotLake.read(spark, t, Some(2)).count() == 2,
      "the retried append must re-base on the winner's manifest")
  }

  test("vacuum removes unreferenced (crashed-commit) files, keeps live ones") {
    val t = freshTable()
    SnapshotLake.commitAppend(Seq((1, "a")).toDF("id", "s"), t)
    // orphan: staged data that never got a manifest (crashed writer)
    Seq((99, "x")).toDF("id", "s")
      .write.parquet(s"$t/data/deadbeef-crashed")
    // negative min age (cutoff in the future): everything counts as old —
    // this test has no in-flight writer for the threshold to protect
    val deleted = SnapshotLake.vacuum(t, minAgeMs = -60000L)
    assert(deleted >= 1)
    assert(SnapshotLake.read(spark, t).count() == 1)
    assert(!Files.exists(java.nio.file.Paths.get(s"$t/data/deadbeef-crashed")))
  }

  test("8 genuinely concurrent appenders: all commits land, none lost") {
    val t = freshTable()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = (1 to 8).map { i =>
      Future(SnapshotLake.commitAppend(Seq((i, s"w$i")).toDF("id", "s"), t))
    }
    val versions = Await.result(Future.sequence(futures), 120.seconds)
    // every writer got a distinct version (link(2) publish is the arbiter)
    assert(versions.toSet.size == 8)
    // the latest snapshot contains ALL eight rows — no lost appends
    assert(SnapshotLake.read(spark, t).count() == 8)
  }

  test("vacuum age threshold protects in-flight stagings") {
    val t = freshTable()
    SnapshotLake.commitAppend(Seq((1, "a")).toDF("id", "s"), t)
    // a writer mid-commit: staged seconds ago, manifest not yet published
    Seq((99, "x")).toDF("id", "s").write.parquet(s"$t/data/in-flight-commit")
    assert(SnapshotLake.vacuum(t) == 0L) // default 1h min age: untouched
    assert(Files.exists(java.nio.file.Paths.get(s"$t/data/in-flight-commit")))
  }

  test("vacuum with retention drops old versions and their exclusive files") {
    val t = freshTable()
    SnapshotLake.commitAppend(Seq((1, "a")).toDF("id", "s"), t)
    SnapshotLake.commitOverwrite(Seq((2, "b")).toDF("id", "s"), t)
    SnapshotLake.vacuum(t, retainVersions = 1, minAgeMs = -60000L)
    assert(SnapshotLake.versions(t) == Seq(1L))
    assert(SnapshotLake.read(spark, t).select("id").as[Int].collect().toSeq == Seq(2))
    intercept[IllegalArgumentException] {
      SnapshotLake.read(spark, t, Some(0))
    }
  }
}
