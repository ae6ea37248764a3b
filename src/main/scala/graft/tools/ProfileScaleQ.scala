package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: time named SparkEntry queries against a staged scale dir and
  * the base dir, printing the ratio — candidate screening for additions to
  * [[ScaleCorpus.ScaleQueries]].
  */
object ProfileScaleQ {
  def main(args: Array[String]): Unit = {
    val base = args(0); val scaled = args(1); val names = args.drop(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_SQ_WARM=<dir>: run each query against a small warm dir first,
    // so codegen/JIT warmup doesn't land inside the base measurement (the
    // memoized dedup front makes SECOND same-dir runs cache hits, so a
    // separate warm DIR is the only way to warm code without warming data)
    val warmDir = sys.env.get("GRAFT_SQ_WARM")
    names.foreach { n =>
      def t(dir: String): Double = {
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(n)(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[sq] $n @ $dir: $s%.2fs rows=$rows")
        s
      }
      warmDir.foreach { d =>
        try graft.SparkEntry.queries(n)(spark, d).count()
        catch { case e: Throwable =>
          System.err.println(s"[sq] warm $n: ${e.getMessage}") }
      }
      val b = t(base); val s10 = t(scaled)
      println(f"[sq] $n ratio=${s10 / b}%.2f")
    }
    spark.stop()
  }
}
