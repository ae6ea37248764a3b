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
    // ---- per-query executor CPU accounting (VERDICT r12 item 1): the
    // single-threaded spin canary cannot see 32-thread steal, so cross-run
    // wall-time comparisons were adjudicated by loadavg prose. Task CPU
    // time is the stable quantity under contention — a stolen window
    // inflates wall while the query's CPU need stays constant — so each
    // query records cpu_s next to wall_s and steal shows up IN the
    // artifact as wall↑ at flat cpu (see steal_suspects below).
    val cpuNsAcc = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) cpuNsAcc.addAndGet(m.executorCpuTime)
        }
      })
    // Listener events post asynchronously; drain the bus before reading the
    // accumulator so task-end events land on the query that ran them.
    // LiveListenerBus.waitUntilEmpty() is private[spark] in Scala but
    // public in bytecode — plain reflection reaches it; fall back to a
    // short sleep if the internals ever move.
    var warnedNoDrain = false
    def cpuSnapshotNs(): Long = {
      val drained =
        try {
          val bus = spark.sparkContext.getClass.getMethod("listenerBus")
            .invoke(spark.sparkContext)
          // throw (→ the settle fallback) when the 0-arg drain is missing:
          // a silent find(...).foreach no-op would skip BOTH the drain and
          // the fallback, misattributing async task-end events to the next
          // query with no signal (r13 review)
          bus.getClass.getMethods
            .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
            .getOrElse(throw new NoSuchMethodException(
              "LiveListenerBus.waitUntilEmpty()"))
            .invoke(bus)
          true
        } catch {
          // NonFatal ONLY (r13 ADVICE): swallowing InterruptedException /
          // fatal errors here would silently degrade every snapshot for the
          // rest of the run. Warn once so a missing reflection path is a
          // visible fact of the artifact, not an invisible skew source.
          case scala.util.control.NonFatal(e) =>
            if (!warnedNoDrain) {
              warnedNoDrain = true
              System.err.println("[bench] listener-bus drain unavailable " +
                s"($e); falling back to accumulator-settle loop")
            }
            false
        }
      if (!drained) {
        // bounded settle: a fixed sleep may not drain a busy bus — wait
        // until two successive accumulator reads agree (no task-end events
        // in flight) or give up after ~500 ms
        var prev = -1L; var cur = cpuNsAcc.get(); var i = 0
        while (cur != prev && i < 20) {
          Thread.sleep(25); prev = cur; cur = cpuNsAcc.get(); i += 1
        }
      }
      cpuNsAcc.get()
    }
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
    // (wall seconds, succeeded, executor-cpu seconds). A query that throws
    // must NEVER land in the timing map — a failure-path wall time is
    // noise, not a measurement (VERDICT r5 item 2). Failures are reported
    // on the JSON line itself via "failed":[...] so the driver can't
    // mistake red for slow-green. cpu is the task-CPU delta across the
    // query (listener bus drained on both sides), the steal-immune twin
    // of wall.
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame):
        (Double, Boolean, Double) = {
      val cpu0 = cpuSnapshotNs()
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1L
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val cpuSec = (cpuSnapshotNs() - cpu0) / 1e9
      System.err.println(
        f"[bench] $name%-28s $sec%8.2fs cpu=$cpuSec%8.2fs rows=$n")
      (sec, n >= 0L, cpuSec)
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
    val startContended =
      try loadStart.split(" ").head.toDouble > 4.0
      catch { case _: Throwable => false }

    // ---- per-query external-load sampling (VERDICT r9 item 2): the r9
    // driver artifact diverged 1.58× because a MID-run load window
    // inflated 20 contiguous queries while `contended` (keyed on start
    // loadavg only) stayed false. Raw loadavg is useless mid-run — the
    // bench's own 32 executor threads dominate it — so the probe is a
    // fixed single-threaded spin timed in the idle gap BEFORE each query:
    // on a quiet machine it is constant; external processes stealing CPU
    // inflate it. ~10 ms × n queries of overhead.
    def spinMs(): Double = {
      var x = 0x9E3779B97F4A7C15L; var i = 0
      val t0 = System.nanoTime()
      while (i < 8000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1
      }
      // data dependency so the loop cannot be elided
      if (x == 42L) System.err.print("")
      (System.nanoTime() - t0) / 1e6
    }
    (1 to 10).foreach(_ => spinMs()) // JIT warm
    val spinBase = (1 to 7).map(_ => spinMs()).min
    def windowContended(): Boolean = spinMs() > spinBase * 2.5
    // Machine-speed canary (VERDICT r10 item 2): the r10-vs-r9 1.18× shift
    // was adjudicated host drift BY ARGUMENT; this makes it a measurement.
    // The canary is the same fixed single-thread xorshift loop, min-of-7
    // (min rejects scheduler noise), taken at bench start and end and
    // recorded on every artifact — round-over-round totals divide by the
    // canary ratio to separate host drift from code regressions.
    def canaryMs(): Double =
      math.rint((1 to 7).map(_ => spinMs()).min * 1000) / 1000
    val canaryStart = canaryMs()
    // prior committed QUIET per-query times — the reference for the
    // divergence rerun decision — and prior per-query CPU times, the
    // reference for steal detection
    def priorMap(key: String): Map[String, Double] = try {
      val txt = java.nio.file.Files.readString(
        java.nio.file.Paths.get("BENCH_FULL.json"))
      if (txt.contains("\"contended\":true")) Map.empty
      else {
        val qStart = txt.indexOf(s""""$key":{""")
        if (qStart < 0) Map.empty
        else {
          val bodyStart = qStart + key.length + 4
          val body = txt.substring(bodyStart, txt.indexOf("}", bodyStart))
          "\"([A-Za-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      }
    } catch { case _: Throwable => Map.empty }
    val prior: Map[String, Double] = priorMap("queries")
    val priorCpu: Map[String, Double] = priorMap("cpu")
    // prior committed QUIET scale10 values — scale10 entries are nested
    // objects, so they need their own parse (field ∈ scaled10x | cpu10)
    def priorScale(field: String): Map[String, Double] = try {
      val txt = java.nio.file.Files.readString(
        java.nio.file.Paths.get("BENCH_FULL.json"))
      if (txt.contains("\"contended\":true")) Map.empty
      else ("\"([A-Za-z0-9_]+)\":\\{\"base\":[^{}]*\"" + field +
        "\":([0-9.]+)").r
        .findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
    val priorScaled: Map[String, Double] = priorScale("scaled10x")
    val priorScaledCpu: Map[String, Double] = priorScale("cpu10")

    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    // 2-decimal rounding on the PRINTED line: the downstream log-tail cap is
    // ~4 KB and r01–r03 all lost the line's alphabetical head to it
    // ("parsed": null). Budget: ~100 queries × ~25 chars ≈ 2.6 KB — safe.
    def r2(v: Double): Double = math.rint(v * 100) / 100
    // Per-query contention windows: the spin probe samples the idle gap
    // BEFORE each query AND AFTER it (the post-sample doubles as the next
    // query's pre-sample, so the overhead stays one probe per gap). A
    // pre-only sample mis-attributed load arriving DURING query N to query
    // N+1 and never sampled the final query's window (ADVICE r10).
    val orderedQueries = SparkEntry.queries.toSeq.sortBy(_._1)
    var nGapsContended = 0
    var nGaps = 0
    def gapProbe(): Boolean = {
      val c = windowContended()
      nGaps += 1
      if (c) nGapsContended += 1
      c
    }
    var gapSample = gapProbe() // gap before the first query
    val timed = orderedQueries.map { case (name, fn) =>
      val pre = gapSample
      val res = timeOne(name, fn)
      gapSample = gapProbe() // gap after name = gap before the next
      (name, res, pre || gapSample)
    }
    val firstPass = timed.collect {
      case (n, (sec, true, cpu), w) => (n, sec, w, cpu) }
    val failed = timed.collect { case (n, (_, false, _), _) => n }
    // Per-query flags (pre OR post) exist to ANNOTATE divergent_reruns; the
    // run-level classifier counts contended GAPS — a flagged-query count
    // would double-count each contended gap against both neighbors and
    // make the quarter rule twice as sensitive as documented (and as the
    // r9/r10 artifacts computed it). The artifact field is bound AFTER the
    // scale stage (def, not val) so scale-probe gaps are included.
    def nWindowsContended = nGapsContended
    // Self-defense rerun: any query that ran ≥2× its committed quiet time
    // (plus an absolute margin — tiny queries jitter multiplicatively) is
    // re-measured once after the sweep. Commit policy (ADVICE r10): when
    // the rerun's OWN window is quiet, the rerun sample IS the canonical
    // measurement (unbiased — it can go up as well as down); only a
    // contended rerun falls back to min(first, rerun), and that entry is
    // flagged "committed":"min" so round-over-round totals stay
    // comparable. Both samples always land in divergent_reruns. Cap 40
    // reruns: a whole-run slowdown is real contention and must stay
    // visible, not be re-rolled away query by query.
    val divergent = firstPass.filter { case (n, sec, _, _) =>
      prior.get(n).exists(p => sec > 2.0 * p && sec - p > 0.5) }
      .sortBy { case (n, sec, _, _) => -(sec - prior(n)) }
      .take(40)
    // (rerun sec, rerun ok, rerun window contended, rerun cpu sec)
    val rerunTimes: Map[String, (Double, Boolean, Boolean, Double)] =
      divergent.map { case (n, _, _, _) =>
        val wPre = windowContended()
        val (sec, ok, rcpu) = timeOne(s"$n#retry", SparkEntry.queries(n))
        val wPost = windowContended()
        n -> ((if (ok) sec else Double.MaxValue), ok, wPre || wPost, rcpu)
      }.toMap
    def committedFor(n: String, first: Double): (Double, String) =
      rerunTimes.get(n) match {
        case Some((rsec, true, false, _)) => (rsec, "rerun") // quiet rerun wins
        case Some((rsec, true, true, _)) => (math.min(first, rsec), "min")
        case _ => (first, "first")
      }
    val divergentJson = divergent.map { case (n, first, w, fcpu) =>
      val (rsec, ok, rw, rcpu) = rerunTimes(n)
      val rr = if (!ok) -1.0 else r3(rsec)
      val committed = committedFor(n, first)._2
      s""""$n":{"first":${r3(first)},"rerun":$rr,""" +
        s""""first_cpu":${r3(fcpu)},"rerun_cpu":${r3(rcpu)},""" +
        s""""prior":${r3(prior(n))},"window_contended":$w,""" +
        s""""rerun_window_contended":$rw,"committed":"$committed"}"""
    }.mkString("{", ",", "}")
    val results = firstPass.map { case (n, sec, _, _) =>
      n -> committedFor(n, sec)._1 }
    // Per-query CPU, committed consistently with the wall choice: a rerun
    // that supplies the committed wall also supplies the committed CPU
    // (the two must describe the SAME execution or wall/cpu ratios lie).
    val cpuResults = firstPass.map { case (n, _, _, cpu) =>
      n -> (rerunTimes.get(n) match {
        case Some((_, true, false, rcpu)) => rcpu
        case Some((rsec, true, true, rcpu)) =>
          // "min" commit: take the cpu of whichever sample was committed
          if (rsec <= firstPass.find(_._1 == n).map(_._2).getOrElse(rsec))
            rcpu else cpu
        case _ => cpu
      })
    }
    // Steal suspects — the artifact-level contention detector (VERDICT r12
    // item 1): wall inflated ≥1.5× vs the committed quiet prior while CPU
    // stayed within 1.2× of its prior. Work unchanged + wall up = the
    // host stole the cores, not a code regression. Requires a prior run
    // that carried a cpu map; empty until one exists.
    val stealSuspects = firstPass.collect {
      case (n, sec, _, cpu)
        if prior.get(n).exists(p => sec > 1.5 * p && sec - p > 0.3) &&
           priorCpu.get(n).exists(pc => cpu < 1.2 * pc + 0.05) => n
    }
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
    val cpuTotal = r3(cpuResults.map(_._2).sum)
    val cpuJson = cpuResults.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val stealJson = stealSuspects.map("\"" + _ + "\"")
      .mkString("[", ",", "]")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
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
        // scale10 probes carry the SAME instrumentation as the query loop
        // (VERDICT r13 item 1): per-probe cpu_s, gap-probe contention
        // windows (feeding nGapsContended → the run classifier), and a
        // divergence rerun — single-sample probes in a contended window
        // previously committed graph_triangles at 21.5× (vs 3.73× quiet)
        // while contended stayed false.
        def timeScaled(label: String, n: String): (Double, Double) = {
          val cpu0 = cpuSnapshotNs()
          val t0 = System.nanoTime()
          val rows = SparkEntry.queries(n)(spark, scaleDir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          val cpuS = (cpuSnapshotNs() - cpu0) / 1e9
          System.err.println(f"[bench] $label".padTo(29, ' ') +
            f" $sec%8.2fs cpu=$cpuS%8.2fs rows=$rows")
          (sec, cpuS)
        }
        var sGap = gapProbe() // gap before the first probe
        val firstScale = graft.tools.ScaleCorpus.ScaleQueries.map { n =>
          val pre = sGap
          val (sec, cpuS) = timeScaled(s"$n@10x", n)
          sGap = gapProbe() // gap after n = gap before the next
          (n, sec, cpuS, pre || sGap)
        }
        // Divergence rule, same as the query loop's steal detector: wall
        // ≥1.5× the committed quiet prior at flat CPU (work unchanged →
        // the host stole the window), plus the plain 2× wall rule and the
        // probe's own contended gap as direct triggers. Rerun once, cap 10
        // (a whole-scale-stage slowdown is real and must stay visible).
        val scaleDivergent = firstScale.filter { case (n, sec, cpuS, w) =>
          val stealShaped = priorScaled.get(n).exists(p =>
            sec > 1.5 * p && sec - p > 0.3) &&
            priorScaledCpu.get(n).exists(pc => cpuS < 1.2 * pc + 0.05)
          val wallBlown = priorScaled.get(n).exists(p =>
            sec > 2.0 * p && sec - p > 0.5)
          stealShaped || wallBlown || (w && priorScaled.contains(n))
        }.sortBy { case (n, sec, _, _) =>
          -(sec - priorScaled.getOrElse(n, 0.0)) }.take(10)
        val scaleRerun: Map[String, (Double, Double, Boolean)] =
          scaleDivergent.map { case (n, _, _, _) =>
            val pre = gapProbe()
            val (sec, cpuS) = timeScaled(s"$n@10x#retry", n)
            val post = gapProbe()
            n -> ((sec, cpuS, pre || post))
          }.toMap
        val entries = firstScale.map { case (n, fsec, fcpu, w) =>
          // commit policy mirrors the query loop (ADVICE r10): a QUIET
          // rerun is the canonical sample; a contended rerun falls back to
          // min(first, rerun) and is flagged
          val (sec, cpuS, committed) = scaleRerun.get(n) match {
            case Some((rsec, rcpu, false)) => (rsec, rcpu, "rerun")
            case Some((rsec, rcpu, true)) =>
              if (rsec < fsec) (rsec, rcpu, "min") else (fsec, fcpu, "min")
            case None => (fsec, fcpu, "first")
          }
          val base = baseTimes.getOrElse(n, 0.0)
          val ratio = if (base > 0) r3(sec / base) else -1.0
          val rr = scaleRerun.get(n)
            .map(r => s""","rerun":${r3(r._1)}""").getOrElse("")
          s""""$n":{"base":${r3(base)},"scaled10x":${r3(sec)},""" +
            s""""ratio":$ratio,"cpu10":${r3(cpuS)},""" +
            s""""window_contended":$w$rr,"committed":"$committed"}"""
        }
        System.err.println(s"[bench] scale10: ${entries.mkString(",")}")
        s""","scale10":{${entries.mkString(",")}}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] scale run skipped: ${e.getMessage}")
          ""
      }
    // Whole-run classifier (per-query windows only ANNOTATE
    // divergent_reruns): computed AFTER the scale stage so scale-probe gap
    // windows count. Triggers, any of:
    //  - start loadavg (a bench starting busy measures the machine);
    //  - a QUARTER of gaps contended (r9's mid-run window class);
    //  - >1-in-16 prior-covered queries steal-shaped at flat cpu (r13's
    //    between-the-gaps window class);
    //  - >1-in-32 gaps contended (VERDICT r13 item 1: the driver's 274.7 s
    //    run showed windows_contended=15 of ~250 — 6% — yet parked nothing;
    //    its single-sample scale10 probes poisoned the artifact). The
    //    nGaps≥32 floor keeps tiny runs from parking on one noisy gap.
    val contended = startContended ||
      (nGaps > 0 && nGapsContended * 4 > nGaps) ||
      (prior.nonEmpty && stealSuspects.size * 16 > firstPass.size) ||
      (nGaps >= 32 && nGapsContended * 32 > nGaps)
    // end-of-run canary: with the start canary this brackets the whole
    // measured window, so host drift between rounds (or within a run) is
    // a recorded divisor, not an argument
    val canaryEnd = canaryMs()
    val canaryJson =
      s""""canary_start_ms":$canaryStart,"canary_end_ms":$canaryEnd"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","cpu_total":$cpuTotal,"n_steal_suspects":${stealSuspects.size},"queries":$qs,"failed":$failedJson,"contended":$contended,"windows_contended":$nWindowsContended,"reran":${divergent.size},$canaryJson,"loadavg_start":"$loadStart","loadavg_end":"${loadavg()}","sf":"$sfDir"}"""
    // full-precision record (incl. reruns) for mechanical round-over-round
    // diffing, immune to any log truncation
    val full = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","cpu_total":$cpuTotal,"queries":$full,"cpu":$cpuJson,"steal_suspects":$stealJson,"failed":$failedJson,"contended":$contended,"windows_contended":$nWindowsContended,"divergent_reruns":$divergentJson,"rerun_heaviest":$reruns$scaleSection,$canaryJson,"loadavg_start":"$loadStart","loadavg_end":"${loadavg()}","sf":"$sfDir"}""" + "\n"
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
      s"""{"metric":"total","value":$total,"unit":"sec","cpu_total":$cpuTotal,"n":${results.size},"failed":$failedJson,"contended":$contended,"windows_contended":$nWindowsContended,"steal_suspects":$stealJson,"divergent_reruns":$divergentJson,$canaryJson,"loadavg_start":"$loadStart","sf":"$sfDir","queries":$full,"cpu":$cpuJson}""" + "\n"
    writeGuarded("BENCH_SUMMARY.json", "BENCH_SUMMARY_contended.json",
      summaryJson)
    System.err.println(s"[bench] rerun_heaviest: $reruns")
    println(line)
    spark.stop()
  }
}
