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
    names.foreach { n =>
      def t(dir: String): Double = {
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(n)(spark, dir).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[sq] $n @ $dir: $s%.2fs rows=$rows")
        s
      }
      val b = t(base); val s10 = t(scaled)
      println(f"[sq] $n ratio=${s10 / b}%.2f")
    }
    spark.stop()
  }
}
