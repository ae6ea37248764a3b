package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE summary JSON line (driver contract).
  * Per-query wall-clock goes to stderr as it completes, so stalls are
  * attributable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay session/codegen/footer-read startup outside the
    // measured window so every measured query sees warm steady state — one
    // query per input family (lineitem joins, documents text path,
    // embeddings vector path)
    Seq("q1_pricing_summary", "text_stats", "embed_norm").foreach(n =>
      SparkEntry.queries.get(n)
        .foreach(fn => try fn(spark, sfDir).count() catch { case _: Throwable => () }))
    // Warm the dedup family's shingle/hash/join codegen on a 100-doc slice
    // via the NON-memoized path: running a real dedup query here would
    // pre-materialize the shared gram/pair front untimed and hide that work
    // from the measured window (the first timed dedup query pays it).
    try {
      import org.apache.spark.sql.functions.col
      val tiny = spark.read.parquet(s"$sfDir/documents.parquet").limit(100)
      graft.operators.Dedup.ngramJaccardPairs(tiny, "doc_id", "text",
        shingleK = 8, threshold = 0.4).count()
    } catch { case _: Throwable => () }
    // (seconds, succeeded). A query that throws must NEVER land in the
    // timing map — a failure-path wall time is noise, not a measurement
    // (VERDICT r5 item 2). Failures are reported on the JSON line itself
    // via "failed":[...] so the driver can't mistake red for slow-green.
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1L
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $sec%8.2fs rows=$n")
      (sec, n >= 0L)
    }
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString(" ")
      catch { case _: Throwable => "?" }
    val loadStart = loadavg()
    // contention self-guard (VERDICT r6 item 4): a bench starting on a
    // busy machine measures the machine, not the engine — tag the
    // artifact so no consumer mistakes contended timings for regressions,
    // and never let a contended run overwrite a quiet BENCH_FULL.json
    val contended =
      try loadStart.split(" ").head.toDouble > 4.0
      catch { case _: Throwable => false }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    // 2-decimal rounding on the PRINTED line: the downstream log-tail cap is
    // ~4 KB and r01–r03 all lost the line's alphabetical head to it
    // ("parsed": null). Budget: ~100 queries × ~25 chars ≈ 2.6 KB — safe.
    def r2(v: Double): Double = math.rint(v * 100) / 100
    val timed = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      (name, timeOne(name, fn))
    }
    val results = timed.collect { case (n, (sec, true)) => n -> sec }
    val failed = timed.collect { case (n, (_, false)) => n }
    // Re-run the heaviest queries once: variance vs regression is only
    // separable with a second sample. stderr + file only — NOT on the one
    // JSON line (line length is the scarce resource there). Top 6 covers
    // the round-5 perf-suspect list in one clean sample.
    val heavy = results.sortBy(-_._2).take(6).map(_._1)
    val second = heavy.map(n => n -> timeOne(s"$n#2", SparkEntry.queries(n))._1)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r2(v) }
      .mkString("{", ",", "}")
    val reruns = second.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = r3(results.map(_._2).sum)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"contended":$contended,"loadavg_start":"$loadStart","loadavg_end":"${loadavg()}","sf":"$sfDir"}"""
    // Scaling spot-run: the five heaviest families re-timed on a staged
    // 10× replica corpus (graft.tools.ScaleCorpus), ratio vs this run's
    // own sf0.1 measurement. A family whose ratio tracks ~O(data) (≲12×
    // for 10× rows, log-factor margin) is 100×-ready; a super-linear one
    // is the thing to fix — this is the signal cold totals can't give.
    // Best-effort by design: the bench's primary contract (the one JSON
    // line) must never be hostage to the scale stage.
    val scaleSection: String =
      if (!sfDir.endsWith("sf0.1") ||
        sys.env.getOrElse("SPARK_GRAFT_SCALE", "1") == "0") ""
      else try {
        val scaleDir =
          sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
        graft.tools.ScaleCorpus.stage(spark, sfDir, scaleDir, copies = 10)
        val baseTimes = results.toMap
        val entries = graft.tools.ScaleCorpus.ScaleQueries.map { n =>
          val t10 = {
            val t0 = System.nanoTime()
            val rows = SparkEntry.queries(n)(spark, scaleDir).count()
            val sec = (System.nanoTime() - t0) / 1e9
            System.err.println(f"[bench] $n@10x".padTo(29, ' ') +
              f" $sec%8.2fs rows=$rows")
            sec
          }
          val base = baseTimes.getOrElse(n, 0.0)
          val ratio = if (base > 0) r3(t10 / base) else -1.0
          s""""$n":{"base":${r3(base)},"scaled10x":${r3(t10)},"ratio":$ratio}"""
        }
        System.err.println(s"[bench] scale10: ${entries.mkString(",")}")
        s""","scale10":{${entries.mkString(",")}}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] scale run skipped: ${e.getMessage}")
          ""
      }
    // full-precision record (incl. reruns) for mechanical round-over-round
    // diffing, immune to any log truncation
    val full = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$full,"failed":$failedJson,"contended":$contended,"rerun_heaviest":$reruns$scaleSection,"loadavg_start":"$loadStart","loadavg_end":"${loadavg()}","sf":"$sfDir"}""" + "\n"
    // ONE guard for both artifacts (round-9 review): a contended run must
    // never overwrite a quiet artifact — it parks beside it instead, so
    // BENCH_FULL.json and BENCH_SUMMARY.json always describe the same run
    def writeGuarded(name: String, contendedName: String,
        json: String): Unit = {
      val p = java.nio.file.Paths.get(name)
      val quietExists = java.nio.file.Files.exists(p) &&
        !java.nio.file.Files.readString(p).contains("\"contended\":true")
      if (contended && quietExists) {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(contendedName), json)
        System.err.println(s"[bench] contended run: kept existing quiet " +
          s"$name, wrote $contendedName")
      } else java.nio.file.Files.writeString(p, json)
    }
    writeGuarded("BENCH_FULL.json", "BENCH_FULL_contended.json", fullJson)
    // self-describing round artifact (VERDICT r7 item 8, r8 item 7): the
    // driver's log-tail parser has truncated the one-line JSON before
    // ("parsed": null in BENCH_r07/r08) — a stable-path summary carries
    // the headline facts AND the full-precision per-query map, so every
    // per-round artifact is self-contained even when the sbt tail is cut.
    // Contended-run guard mirrors BENCH_FULL's (ADVICE r8): a contended
    // run must not overwrite a quiet summary with totals from a different
    // run than the committed BENCH_FULL.json describes.
    val summaryJson =
      s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"failed":$failedJson,"contended":$contended,"loadavg_start":"$loadStart","sf":"$sfDir","queries":$full}""" + "\n"
    writeGuarded("BENCH_SUMMARY.json", "BENCH_SUMMARY_contended.json",
      summaryJson)
    System.err.println(s"[bench] rerun_heaviest: $reruns")
    println(line)
    spark.stop()
  }
}
