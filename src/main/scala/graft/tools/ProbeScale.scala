package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-curve probe at an ARBITRARY staged replica corpus (the 100×
  * follow-up to the bench's built-in 10× section — VERDICT r9 item 1):
  * each named query runs twice at sf0.1 (cold, warm) and twice at the
  * staged dir, and the WARM ratio is the headline (the committed scale
  * discipline — cold firsts measure page-cache state, not the operator).
  * One session for the whole sweep so JIT/codegen warmth is shared, same
  * as the bench's scale section. Queries print as they finish — a
  * runaway family is attributable from the partial log.
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val scaleDir = if (args.nonEmpty) args(0) else "/tmp/graft_scale100"
    val baseDir = sys.env.getOrElse("GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else ScaleCorpus.ScaleQueries
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probe] $name @$dir $sec%8.2fs rows=$rows")
      sec
    }
    // Front attribution (VERDICT r10 item 1): materialize the memoized
    // gram/pair front UP FRONT and time it as its own line, so every dedup
    // family's ratio below is operator-only instead of the first-probed
    // family paying the shared front. Skipped when no probed query
    // consumes it.
    // exactly the `dedupFront(s, dir)` call sites in SparkEntry.queries —
    // dedup_semantic/dedup_incremental are embedding-side and never touch
    // the gram front (a stale entry here stages minutes of front build for
    // a query that reads embeddings only)
    val frontConsumers = Set("dedup_ngram_jaccard", "dedup_minhash_lsh",
      "dedup_simhash", "dedup_front_truncation", "dedup_clusters",
      "dedup_keep_best", "text_novelty", "dedup_containment",
      "dedup_containment_fixed")
    if (names.exists(frontConsumers)) {
      def timeFront(dir: String): Double = {
        val t0 = System.nanoTime()
        val (h, p) = graft.SparkEntry.stageDedupFront(spark, dir)
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[probe] dedup_front @$dir $sec%8.2fs " +
          f"hashed=$h pairs=$p")
        sec
      }
      val fBase = timeFront(baseDir)
      val fScaled = timeFront(scaleDir)
      println(f"[scale-probe] dedup_front base=$fBase%.2f " +
        f"scaled=$fScaled%.2f ratio=${fScaled / fBase}%.2f dir=$scaleDir")
    }
    for (n <- names) {
      try {
        time(n, baseDir)
        val base = time(n, baseDir) // warm
        time(n, scaleDir)
        val scaled = time(n, scaleDir) // warm
        println(f"[scale-probe] $n base=$base%.2f scaled=$scaled%.2f " +
          f"ratio=${scaled / base}%.2f dir=$scaleDir")
      } catch {
        case e: Throwable =>
          println(s"[scale-probe] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
