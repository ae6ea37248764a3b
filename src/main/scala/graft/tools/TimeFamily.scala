package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a PREFIX-matched family of SparkEntry queries in bench order on one
  * cold JVM (first-payer fronts attributed exactly as the bench sees them):
  * `runMain graft.tools.TimeFamily <prefix> [sfDir]`.
  * Prints per-query wall seconds and the family total.
  */
object TimeFamily {
  def main(args: Array[String]): Unit = {
    val prefix = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
    val names = graft.SparkEntry.queries.keys.toSeq
      .filter(_.startsWith(prefix)).sorted
    var total = 0.0
    names.foreach { n =>
      spark.sparkContext.setJobDescription(n)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      total += sec
      println(f"[fam] $n%-36s $sec%7.2fs")
    }
    println(f"[fam] TOTAL(${names.size}%d queries) $total%7.2fs")
    spark.stop()
  }
}
