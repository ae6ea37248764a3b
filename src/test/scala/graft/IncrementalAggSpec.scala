package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg
import graft.sinks.{PosixLinkCommitStore, SnapshotLake}

/** Delta-driven materialized aggregate: fold-of-batches ≡ one-shot
  * recompute, idempotent replay, up-to-date no-op, vacuumed-watermark
  * fail-fast. */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private val store = PosixLinkCommitStore

  private def freshBase() = Files.createTempDirectory("graft_iagg_")

  test("random multi-batch fold equals the one-shot groupBy recompute") {
    val rnd = new scala.util.Random(42L)
    val base = freshBase()
    val (fact, agg) =
      (base.resolve("fact").toString, base.resolve("agg").toString)
    val all = scala.collection.mutable.Buffer.empty[(String, Long)]
    for (batch <- 1 to 4) {
      val rows = (1 to 200).map { _ =>
        (s"g${rnd.nextInt(7)}", rnd.nextInt(1000).toLong) }
      all ++= rows
      SnapshotLake.commitAppend(rows.toDF("g", "x"), fact, store)
      IncrementalAgg.refresh(spark, fact, agg, Seq("g"), "x", store)

      val got = SnapshotLake.read(spark, agg, None, store)
        .orderBy("g").as[(String, Long, Long)].collect().toSeq
      val want = all.groupBy(_._1).toSeq.map { case (g, rs) =>
        (g, rs.map(_._2).sum, rs.size.toLong) }.sortBy(_._1)
      assert(got == want, s"after batch $batch")
    }
    // every refresh reads only the delta: the fold version count equals
    // the batch count (no rebuild-from-scratch commits)
    assert(SnapshotLake.versions(agg, store).size == 4)
  }

  test("up-to-date refresh is a version no-op; replayed fold dedups") {
    val base = freshBase()
    val (fact, agg) =
      (base.resolve("fact").toString, base.resolve("agg").toString)
    SnapshotLake.commitAppend(Seq(("a", 1L)).toDF("g", "x"), fact, store)
    val v1 = IncrementalAgg.refresh(spark, fact, agg, Seq("g"), "x", store)
    val v2 = IncrementalAgg.refresh(spark, fact, agg, Seq("g"), "x", store)
    assert(v1 == v2) // no new commit, no double count
    assert(SnapshotLake.read(spark, agg, None, store)
      .as[(String, Long, Long)].collect().toSeq == Seq(("a", 1L, 1L)))
  }

  test("a vacuumed watermark fails fast instead of silently rebuilding") {
    val base = freshBase()
    val (fact, agg) =
      (base.resolve("fact").toString, base.resolve("agg").toString)
    SnapshotLake.commitAppend(Seq(("a", 1L)).toDF("g", "x"), fact, store)
    IncrementalAgg.refresh(spark, fact, agg, Seq("g"), "x", store)
    SnapshotLake.commitAppend(Seq(("a", 2L)).toDF("g", "x"), fact, store)
    SnapshotLake.commitAppend(Seq(("b", 3L)).toDF("g", "x"), fact, store)
    // drop the watermarked fact version's manifest (simulated retention)
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      fact, "_manifests", "v00000000000.json"))
    intercept[IllegalArgumentException] {
      IncrementalAgg.refresh(spark, fact, agg, Seq("g"), "x", store)
    }
  }
}
