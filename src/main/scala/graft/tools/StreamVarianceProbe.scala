package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: per-query wall-time spread of the ev_stream_* family
  * over three consecutive in-session runs — r6 item 6's acceptance
  * measurement (spread < 1 s per query on a quiet machine). (Temporary
  * tool — not part of the engine surface.)
  */
object StreamVarianceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith("ev_stream_"))
    // warm the staged sources + codegen once, untimed
    names.foreach(n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[svar] warm $n FAILED: ${e.getMessage}") })
    val times = names.map { n =>
      n -> (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
    }
    times.foreach { case (n, ts) =>
      val spread = ts.max - ts.min
      println(f"[svar] $n%-26s ${ts.map(t => f"$t%6.2f").mkString(" ")}  spread=$spread%5.2fs${if (spread >= 1.0) "  <-- WIDE" else ""}")
    }
    val worst = times.map { case (_, ts) => ts.max - ts.min }.max
    println(f"[svar] worst spread $worst%.2fs over ${names.size} queries x 3 runs")
    spark.stop()
  }
}
