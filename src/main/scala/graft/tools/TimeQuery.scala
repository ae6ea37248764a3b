package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries: `runMain graft.tools.TimeQuery
  * <sfDir> <reps> <name> [name...]` — same session config as graft.Bench so
  * numbers are comparable, with per-rep wall-clock to separate variance from
  * regressions.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2)
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
    graft.SparkEntry.queries.get("q1_pricing_summary")
      .foreach(fn => fn(spark, sfDir).count()) // warmup
    for (name <- names; rep <- 1 to reps) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name%-28s rep=$rep $sec%8.2fs rows=$n")
    }
    spark.stop()
  }
}
