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

  test("streaming ingest folds each micro-batch; aggregate equals the batch recompute") {
    val base = freshBase()
    val src = base.resolve("src").toString
    val fact = base.resolve("fact").toString
    val agg = base.resolve("agg").toString
    val rows = (1 to 300).map { i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L),
        (i % 20).toLong, s"t${i % 3}", (i % 7).toDouble, "{}") }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3).write.parquet(src)
    val q = graft.streaming.EventStreams.streamToAggregatedLake(
      spark, src, fact, agg, Seq("event_type"), "value", store = store)
    try q.processAllAvailable() finally q.stop()
    // integer-valued doubles sum exactly; the fold must equal the batch
    // recompute bit-for-bit
    val got = SnapshotLake.read(spark, agg, None, store)
      .orderBy("event_type").as[(String, Double, Long)].collect().toSeq
    val want = rows.groupBy(_._4).toSeq.map { case (t, rs) =>
      (t, rs.map(_._5).sum, rs.size.toLong) }.sortBy(_._1)
    assert(got == want)
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
