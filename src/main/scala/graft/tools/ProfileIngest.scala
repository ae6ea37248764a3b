package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the exactly-once ANN ingest micro-batch (the
  * r13 sustained probe measured ~2.2 s/batch at 133 rows — lifecycle-
  * fixed, but WHICH stage?): runs `nBatches` batches through the SAME
  * stage sequence as [[graft.streaming.IndexIngest.appendBatchExactlyOnce]]
  * (recover → payload check + assign → batchId-keyed lake commit →
  * layout sync → auto-compact sweep), timing each stage per batch, and
  * prints per-stage mean/p95 seconds. A measurement instrument —
  * exactly-once semantics are spec'd in StreamingSpec/CrashMatrixSpec;
  * this decomposes the cost so the "fixed per-batch price" claim in
  * BASELINE.md is attributed, not asserted.
  *
  * Run: `runMain graft.tools.ProfileIngest [sfDir] [nBatches]`.
  */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nBatches = if (args.length > 1) args(1).toInt else 30
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.Similarity
    import graft.streaming.IndexIngest
    import graft.sinks.SnapshotLake
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/tmp/graft_scale10")
    ScaleCorpus.stage(spark, sfDir, scaleDir, copies = 10)
    val emb = spark.read.parquet(s"$scaleDir/embeddings.parquet")
      .localCheckpoint(false)
    val path = java.nio.file.Files
      .createTempDirectory("graft_profingest_").toString
    val lake = java.nio.file.Files
      .createTempDirectory("graft_profingest_lk_").resolve("ann").toString
    val nTotal = emb.count()
    Similarity.ivfWrite(emb.where(pmod($"vec_id", lit(5)) === 0),
      "vec_id", "embedding", path,
      nLists = math.max(16, (nTotal / 125L).toInt), kMeansIters = 1)
    val streamed = emb.where(pmod($"vec_id", lit(5)) =!= 0)
      .withColumn("_b", pmod(xxhash64($"vec_id"), lit(nBatches)))
      .localCheckpoint(false)
    val stages = Seq("recover", "assign_plan", "collect", "commit_write",
      "sync", "autocompact")
    val t = stages.map(_ ->
      scala.collection.mutable.ArrayBuffer[Double]()).toMap
    def timed(stage: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      t(stage) += (System.nanoTime() - t0) / 1e9
    }
    import org.apache.spark.sql.execution.datasources.parquet.GraftParquetDirect
    (0 until nBatches).foreach { i =>
      val batch = streamed.where($"_b" === i).drop("_b")
      // the exact stage sequence of appendBatchExactlyOnce (no dedup gate;
      // r15 driver-stage regime) with the collect/stage split timed apart
      timed("recover") { Similarity.ivfCompactRecover(spark, path) }
      var aliased: org.apache.spark.sql.DataFrame = null
      var pcsv: Seq[String] = Nil
      timed("assign_plan") {
        val payload = Similarity.layoutPayloadCols(spark, path,
          "vec_id", "embedding")
        val (assigned, hier) = Similarity.assignToLayout(batch, "vec_id",
          "embedding", path, payload)
        // cell-aligned commit shape, mirroring appendBatchExactlyOnce
        // (r13 item 2) — the sync below takes its copy-publish fast path
        pcsv =
          if (hier) Seq("__pc_super", "__pc_cell") else Seq("__pc_cell")
        aliased =
          (if (hier) assigned.withColumn("__pc_super", col("super"))
          else assigned)
            .withColumn("__pc_cell", col("cell"))
            .drop("super", "cell")
      }
      var collected: Option[Array[org.apache.spark.sql.catalyst.InternalRow]] =
        None
      timed("collect") {
        collected = GraftParquetDirect.collectInternalLimited(aliased,
          graft.streaming.IndexIngest.DefaultDriverStageMaxRows)
      }
      timed("commit_write") {
        collected match {
          case Some(rows) if rows.isEmpty => ()
          case Some(rows) =>
            val entries = SnapshotLake.stageDriverSide(spark, lake,
              aliased.schema, rows, pcsv)
            SnapshotLake.commitPrestagedIdempotent(lake, s"ann-ingest-$i",
              entries, aliased.columns.filterNot(pcsv.contains).toSeq)
          case None =>
            val wideTasks = math.min(1024, math.max(256,
              spark.sparkContext.defaultParallelism * 8))
            SnapshotLake.commitAppendIdempotent(
              aliased.repartition(wideTasks, col("__pc_cell")), lake,
              s"ann-ingest-$i", stagePartitionCols = pcsv,
              stageClusteredByPartitionCols = true)
        }
      }
      var synced = 0
      timed("sync") {
        synced = IndexIngest.syncLayoutFromLake(spark, path, lake)
      }
      timed("autocompact") {
        if (synced > 0) Similarity.ivfCompact(spark, path,
          maxFilesPerCell = IndexIngest.DefaultAutoCompactFilesPerCell)
      }
    }
    def p(xs: Seq[Double], q: Double): Double = {
      val s = xs.sorted; s((q * (s.size - 1)).round.toInt)
    }
    def r3(v: Double) = math.rint(v * 1000) / 1000
    val parts = stages.map { st =>
      val xs = t(st).toSeq
      s""""$st":{"mean_s":${r3(xs.sum / xs.size)},""" +
        s""""p95_s":${r3(p(xs, 0.95))},"total_s":${r3(xs.sum)}}"""
    }
    val total = stages.map(t(_).sum).sum
    println(s"""{"probe":"ingest_stage_profile","batches":$nBatches,""" +
      s""""total_s":${r3(total)},${parts.mkString(",")}}""")
    spark.stop()
  }
}
