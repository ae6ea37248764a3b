package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Print the formatted physical plan of the er_customers MATCH-PAIRS stage
  * (EntityResolution.matchPairs) — the final query plan truncates at the
  * closure's checkpoint, so the blocking/candidate shape needs its own dump.
  */
object ErPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = graft.sources.TableCatalog.load(spark, sfDir, "customer")
    val recs = c
      .select(col("c_custkey").as("rec_id"), col("c_name").as("name"))
      .unionByName(c.where(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 100000).as("rec_id"),
          concat(substring(col("c_name"), 1, 10),
            expr("substring(c_name, 12)")).as("name")))
      .unionByName(c.where(col("c_custkey") % 11 === 0)
        .select((col("c_custkey") + 200000).as("rec_id"),
          concat(col("c_name"), lit("x")).as("name")))
    val pairs = graft.operators.EntityResolution.matchPairs(
      recs, "rec_id", "name",
      Seq(nm => substring(nm, -4, 4),
        nm => regexp_replace(nm, "[^0-9]", "")),
      maxEdit = 1)
    pairs.collect()
    println(pairs.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
