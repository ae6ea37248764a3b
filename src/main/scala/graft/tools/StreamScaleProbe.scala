package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sustained-ingest scale probe for the streaming family (VERDICT r12
  * item 2) — the only family whose bench gates are full-lifecycle
  * micro-measurements (a handful of batches each), leaving state growth,
  * per-batch latency vs batch count, and maintenance overhead over
  * HUNDREDS of batches unmeasured.
  *
  * Two probes, each printing one JSON line (merged by probe key into
  * STREAM_SCALE.json in the working directory — `SPARK_GRAFT_STREAM_OUT`
  * overrides — so a single-probe refresh keeps the other probe's line):
  *
  *  1. `ann` — the exactly-once vector-ingest loop
  *     ([[graft.streaming.IndexIngest.appendBatchExactlyOnce]]) driven for
  *     `nBatches` micro-batches over the 10× replica embedding corpus
  *     (16 000 streamed vectors on sf0.1, base layout = the other 4 000):
  *     per-batch wall latency (p50/p95/max), sustained rows/s, and the
  *     three state curves that decide 100 TB viability — layout file
  *     count (auto-compaction must bound it), `.ingested` marker count
  *     (lake-retention vacuum must bound it), lake version count. The
  *     drift ratio (last-decile p50 / first-decile p50) is the stated
  *     bar: ≤ 2 means per-batch cost does not grow with ingested volume.
  *
  *  2. `events` — a stateful watermarked sliding-window aggregation over
  *     a 10× replica event stream (1 000 000 events, 10× distinct users)
  *     delivered in `nBatches` MemoryStream micro-batches in timestamp
  *     order: per-batch latency percentiles, rows/s, and the state-store
  *     row curve (watermark eviction must plateau it — the
  *     unbounded-state failure mode).
  *
  * Run: `runMain graft.tools.StreamScaleProbe [sfDir] [ann|events|both]`.
  * Not a correctness gate (those live in StreamingSpec / the oracle); a
  * measurement instrument like the other tools/ probes — its numbers are
  * quoted in BASELINE.md.
  */
object StreamScaleProbe {

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s((p * (s.size - 1)).round.toInt)
  }
  private def r2(v: Double): Double = math.rint(v * 100) / 100
  private def r3(v: Double): Double = math.rint(v * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val which = if (args.length > 1) args(1) else "both"
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "120").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    if (which == "ann" || which == "both") lines += annProbe(spark, sfDir, nBatches)
    if (which == "events" || which == "both") lines += eventsProbe(spark, sfDir, nBatches)
    lines.foreach(println)
    // MERGE into the artifact (keyed on the "probe" field): a
    // single-probe refresh must not silently delete the other probe's
    // committed line (r13 review — the naive overwrite did)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "STREAM_SCALE.json"))
    def probeKey(l: String): String =
      "\"probe\":\"([a-z_]+)\"".r.findFirstMatchIn(l)
        .map(_.group(1)).getOrElse(l)
    val fresh = lines.map(l => probeKey(l) -> l)
    val kept =
      if (!java.nio.file.Files.exists(out)) Seq.empty
      else java.nio.file.Files.readString(out).linesIterator
        .filter(_.nonEmpty)
        .filterNot(l => fresh.exists(_._1 == probeKey(l))).toSeq
    java.nio.file.Files.writeString(out,
      (kept ++ fresh.map(_._2)).mkString("", "\n", "\n"))
    System.err.println(s"[stream-scale] merged ${fresh.size} line(s) into $out")
    spark.stop()
  }

  /** Sustained exactly-once ANN ingest over the 10× corpus. */
  def annProbe(spark: SparkSession, sfDir: String, nBatches: Int): String = {
    import graft.operators.Similarity
    import graft.streaming.IndexIngest
    import spark.implicits._
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
    ScaleCorpus.stage(spark, sfDir, scaleDir, copies = 10)
    val emb = spark.read.parquet(s"$scaleDir/embeddings.parquet")
      .localCheckpoint(false)
    val path = java.nio.file.Files
      .createTempDirectory("graft_streamscale_ann_").toString
    val lake = java.nio.file.Files
      .createTempDirectory("graft_streamscale_lake_").resolve("ann").toString
    // base layout: 1-in-5 of the corpus; cell count sized to the FULL
    // post-ingest corpus (the production posture: the layout is built for
    // the data it will hold, then ingested into)
    val base = emb.where(pmod($"vec_id", lit(5)) === 0)
    val nTotal = emb.count()
    Similarity.ivfWrite(base, "vec_id", "embedding", path,
      nLists = math.max(16, (nTotal / 125L).toInt), kMeansIters = 1)
    val streamed = emb.where(pmod($"vec_id", lit(5)) =!= 0)
      .withColumn("_b", pmod(xxhash64($"vec_id"), lit(nBatches)))
      .localCheckpoint(false)
    val nStreamed = streamed.count()
    def fileCount: Int = {
      val root = new org.apache.hadoop.fs.Path(s"$path/corpus")
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      Similarity.layoutCellDirs(fs, root).map(d =>
        fs.listStatus(d).count(f => f.isFile &&
          f.getPath.getName.endsWith(".parquet"))).sum
    }
    def markerCount: Int = {
      val d = new java.io.File(s"$path/corpus/.ingested")
      if (d.exists()) d.listFiles().count(f =>
        f.getName.startsWith("v") && f.getName.drop(1).forall(_.isDigit))
      else 0
    }
    val lat = scala.collection.mutable.ArrayBuffer[Double]()
    val fileCurve = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    val t0 = System.nanoTime()
    (0 until nBatches).foreach { i =>
      val b0 = System.nanoTime()
      IndexIngest.appendBatchExactlyOnce(
        streamed.where($"_b" === i).drop("_b"),
        "vec_id", "embedding", path, lake, i.toLong)
      lat += (System.nanoTime() - b0) / 1e9
      if (i % math.max(nBatches / 12, 1) == 0 || i == nBatches - 1)
        fileCurve += ((i, fileCount))
      // production loop hygiene at the same cadence StreamingSpec pins:
      // retention-bounded lake + marker vacuum every 25 batches
      if (i % 25 == 24) {
        graft.sinks.SnapshotLake.vacuum(lake, retainVersions = 8,
          minAgeMs = 0)
        IndexIngest.vacuumIngestMarkers(spark, path, lake)
      }
    }
    val wall = (System.nanoTime() - t0) / 1e9
    // exactly-once accounting before any summary: every streamed id
    // present exactly once, plus the base
    val got = spark.read.parquet(s"$path/corpus").select($"vec_id")
      .as[Long].collect()
    require(got.length == got.distinct.length, "duplicated ids after ingest")
    require(got.length == nTotal, s"expected $nTotal rows, got ${got.length}")
    val dec = math.max(lat.size / 10, 1)
    val drift = r3(pct(lat.takeRight(dec).toSeq, 0.5) /
      pct(lat.take(dec).toSeq, 0.5))
    val files = fileCurve.map { case (i, f) => s"[$i,$f]" }
      .mkString("[", ",", "]")
    s"""{"probe":"ann_ingest_sustained","sf":"$sfDir","batches":$nBatches,""" +
      s""""rows":$nStreamed,"wall_s":${r2(wall)},""" +
      s""""rows_per_s":${r2(nStreamed / wall)},""" +
      s""""batch_p50_s":${r3(pct(lat.toSeq, 0.5))},""" +
      s""""batch_p95_s":${r3(pct(lat.toSeq, 0.95))},""" +
      s""""batch_max_s":${r3(lat.max)},"p50_drift_last_vs_first":$drift,""" +
      s""""file_curve":$files,"final_files":$fileCount,""" +
      s""""final_markers":$markerCount,""" +
      s""""final_lake_versions":${graft.sinks.SnapshotLake.versions(lake).size}}"""
  }

  /** Sustained stateful watermarked aggregation over a 10× event stream. */
  def eventsProbe(spark: SparkSession, sfDir: String,
      nBatches: Int): String = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val copies = 10
    val base = spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    // 10× replicas: distinct id spaces, SAME time range — state scales by
    // keys-in-window, which is the dimension that grows at 100 TB
    val big = (0 until copies).map(i => base
      .withColumn("event_id", $"event_id" + lit(i * 10000000L))
      .withColumn("user_id", $"user_id" + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    val rows = big.orderBy($"ts").as[(Long, java.sql.Timestamp, Long,
      String, Double)].collect()
    val chunk = math.max(rows.length / nBatches, 1)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val agg = stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "30 minutes")
      // keyed on user_id so the 10× key dimension actually lands in the
      // state store (keying on event_type alone holds ~30 state rows at
      // ANY scale and proves nothing about eviction)
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
    val q = agg.writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft_streamscale_ck_").toString)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    val lat = scala.collection.mutable.ArrayBuffer[Double]()
    val stateCurve = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    val t0 = System.nanoTime()
    var i = 0
    while (i * chunk < rows.length) {
      val slice = rows.slice(i * chunk,
        math.min((i + 1) * chunk, rows.length))
      val b0 = System.nanoTime()
      stream.addData(slice.toSeq)
      q.processAllAvailable()
      lat += (System.nanoTime() - b0) / 1e9
      if (i % math.max(nBatches / 12, 1) == 0) {
        val st = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
        stateCurve += ((i, st))
      }
      i += 1
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val finalState = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    q.stop()
    val dec = math.max(lat.size / 10, 1)
    val drift = r3(pct(lat.takeRight(dec).toSeq, 0.5) /
      pct(lat.take(dec).toSeq, 0.5))
    val states = stateCurve.map { case (b, s) => s"[$b,$s]" }
      .mkString("[", ",", "]")
    s"""{"probe":"events_window_sustained","sf":"$sfDir","copies":$copies,""" +
      s""""batches":${lat.size},"rows":${rows.length},""" +
      s""""wall_s":${r2(wall)},"rows_per_s":${r2(rows.length / wall)},""" +
      s""""batch_p50_s":${r3(pct(lat.toSeq, 0.5))},""" +
      s""""batch_p95_s":${r3(pct(lat.toSeq, 0.95))},""" +
      s""""batch_max_s":${r3(lat.max)},"p50_drift_last_vs_first":$drift,""" +
      s""""state_rows_curve":$states,"final_state_rows":$finalState}"""
  }
}
