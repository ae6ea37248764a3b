package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage an N× replica corpus (ScaleCorpus) outside the bench — for
  * one-off curve points beyond the bench's 10× (e.g. the 30× containment
  * probe). Usage: StageScale <baseDir> <outDir> <copies>.
  */
object StageScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleCorpus.stage(spark, args(0), args(1), args(2).toInt)
    println(s"[stage] staged ${args(2)}x of ${args(0)} at ${args(1)}")
    spark.stop()
  }
}
