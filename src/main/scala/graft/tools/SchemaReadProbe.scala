package graft.tools

import org.apache.spark.sql.SparkSession

/** r16 scratch probe: per-read fixed cost of spark.read.parquet schema
  * inference vs an explicit schema, on a tiny parquet table — the fixed
  * cost every SnapshotLake.read / ANN sidecar read pays per call.
  */
object SchemaReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_srp_").toString
    (1 to 1000).map(i => (i.toLong, i * 2.0, s"s$i")).toDF("a", "b", "c")
      .repartition(2).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    // warm both paths
    (1 to 3).foreach { _ =>
      spark.read.parquet(dir).count()
      spark.read.schema(schema).parquet(dir).count()
    }
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      (1 to 20).foreach(_ => f)
      System.err.println(
        f"[srp] $tag avg ${(System.nanoTime() - t0) / 20 / 1e6}%8.2f ms")
    }
    time("infer+count     ")(spark.read.parquet(dir).count())
    time("explicit+count  ")(spark.read.schema(schema).parquet(dir).count())
    time("infer only      ")(spark.read.parquet(dir))
    time("explicit only   ")(spark.read.schema(schema).parquet(dir))
    spark.stop()
  }
}
