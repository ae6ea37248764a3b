package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one named SparkEntry query standalone (cold + warm), outside the
  * bench harness — builder-side micro-iteration on a single query's cost.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // extensions toggled by env so the same tool isolates rule interference
    val useExt = sys.env.getOrElse("GRAFT_EXT", "1") == "1"
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (useExt)
      b.config("spark.sql.extensions", "graft.GraftExtensions") else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      System.err.println(
        f"[time] $name run$i ${(System.nanoTime() - t0) / 1e9}%8.2fs rows=$n")
    }
    spark.stop()
  }
}
