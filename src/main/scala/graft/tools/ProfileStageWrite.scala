package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe: isolates the cell-aligned ingest commit's staged
  * WRITE cost (r14, item-2 follow-up) — times, on one representative 10×
  * micro-batch, (a) materializing the assignment lineage, (b) a flat
  * 32-file write, (c) the dynamic-partition per-cell write, (d) the same
  * with concurrent writers (no sort). Decides which lever to pull; not
  * part of the engine surface.
  */
object ProfileStageWrite {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.Similarity
    val scaleDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "/tmp/graft_scale10")
    ScaleCorpus.stage(spark, "/root/testdata/sf0.1", scaleDir, copies = 10)
    val emb = spark.read.parquet(s"$scaleDir/embeddings.parquet")
      .localCheckpoint(false)
    val path = java.nio.file.Files
      .createTempDirectory("graft_psw_").toString
    val n = emb.count()
    Similarity.ivfWrite(emb.where(pmod($"vec_id", lit(5)) === 0),
      "vec_id", "embedding", path,
      nLists = math.max(16, (n / 125L).toInt), kMeansIters = 1)
    val batch = emb.where(pmod(xxhash64($"vec_id"), lit(30)) === 0)
    println(s"batch rows = ${batch.count()}")
    val (assigned, _) = Similarity.assignToLayout(batch, "vec_id",
      "embedding", path)
    val aliased = assigned.withColumn("__pc_cell", col("cell"))
      .drop("super", "cell")
    def t(label: String)(body: => Unit): Unit = {
      val xs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${xs.min}%.2fs mean=${xs.sum / 5}%.2fs")
    }
    def tmp() = java.nio.file.Files.createTempDirectory("psw_").toString
    t("materialize (checkpoint)") {
      aliased.localCheckpoint(true).count()
    }
    val mat = aliased.localCheckpoint(true)
    println(s"distinct cells = ${mat.select("__pc_cell").distinct().count()}")
    t("flat write 32") { mat.repartition(col("__pc_cell"))
      .write.mode("overwrite").parquet(tmp()) }
    t("partitionBy write") { mat.repartition(col("__pc_cell"))
      .write.mode("overwrite").partitionBy("__pc_cell").parquet(tmp()) }
    t("partitionBy concurrent") { mat.repartition(col("__pc_cell"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", "0")
      .partitionBy("__pc_cell").parquet(tmp()) }
    spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "512")
    t("partitionBy no-sort") { mat.repartition(col("__pc_cell"))
      .write.mode("overwrite").partitionBy("__pc_cell").parquet(tmp()) }
    spark.conf.set("spark.sql.parquet.compression.codec", "uncompressed")
    t("partitionBy uncompressed") { mat.repartition(col("__pc_cell"))
      .write.mode("overwrite").partitionBy("__pc_cell").parquet(tmp()) }
    t("unassigned lineage pb write") { aliased.repartition(col("__pc_cell"))
      .write.mode("overwrite").partitionBy("__pc_cell").parquet(tmp()) }
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
    t("pb write v2 committer") { mat.repartition(col("__pc_cell"))
      .write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .partitionBy("__pc_cell").parquet(tmp()) }
    t("pb write coalesce(1)") { mat.coalesce(1)
      .write.mode("overwrite").partitionBy("__pc_cell").parquet(tmp()) }
    t("pb write 154 tasks") { mat.repartition(200, col("__pc_cell"))
      .write.mode("overwrite").partitionBy("__pc_cell").parquet(tmp()) }
    t("pb write errorifexists mode") { mat.repartition(col("__pc_cell"))
      .write.partitionBy("__pc_cell").parquet(tmp() + "/x") }
    t("pb 512 tasks") { mat.repartition(512, col("__pc_cell"))
      .write.mode("overwrite").partitionBy("__pc_cell").parquet(tmp()) }
    t("pb 200 no-checksum no-dict") { mat.repartition(200, col("__pc_cell"))
      .write.mode("overwrite")
      .option("parquet.page.write-checksum.enabled", "false")
      .option("parquet.enable.dictionary", "false")
      .partitionBy("__pc_cell").parquet(tmp()) }
    spark.conf.set("spark.hadoop.fs.file.impl",
      "org.apache.hadoop.fs.RawLocalFileSystem")
    t("pb 200 raw-local-fs") { mat.repartition(200, col("__pc_cell"))
      .write.mode("overwrite").partitionBy("__pc_cell").parquet(tmp()) }
    spark.conf.unset("spark.hadoop.fs.file.impl")
    t("pb 32 small-block") { mat.repartition(col("__pc_cell"))
      .write.mode("overwrite")
      .option("parquet.block.size", (1L << 20).toString)
      .option("parquet.page.size", (64 << 10).toString)
      .partitionBy("__pc_cell").parquet(tmp()) }
    t("pb 32 tiny-block") { mat.repartition(col("__pc_cell"))
      .write.mode("overwrite")
      .option("parquet.block.size", (128 << 10).toString)
      .option("parquet.page.size", (16 << 10).toString)
      .partitionBy("__pc_cell").parquet(tmp()) }
    spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "512")
    t("pb 32 small-block no-sort") { mat.repartition(col("__pc_cell"))
      .write.mode("overwrite")
      .option("parquet.block.size", (1L << 20).toString)
      .option("parquet.page.size", (64 << 10).toString)
      .partitionBy("__pc_cell").parquet(tmp()) }
    spark.conf.unset("spark.sql.maxConcurrentOutputFileWriters")
    t("pb 154 small-block") { mat.repartition(200, col("__pc_cell"))
      .write.mode("overwrite")
      .option("parquet.block.size", (1L << 20).toString)
      .option("parquet.page.size", (64 << 10).toString)
      .partitionBy("__pc_cell").parquet(tmp()) }
    // distinguish per-FILE roll cost from per-DIRECTORY cost: 154 files in
    // ONE flat dir, forced by maxRecordsPerFile, single task then 32 tasks
    t("flat c1 roll-154-files") { mat.coalesce(1)
      .write.mode("overwrite").option("maxRecordsPerFile", "4")
      .parquet(tmp()) }
    t("flat 32 roll-154-files") { mat.repartition(col("__pc_cell"))
      .write.mode("overwrite").option("maxRecordsPerFile", "4")
      .parquet(tmp()) }
    t("pb c1 154 dirs") { mat.coalesce(1)
      .write.mode("overwrite").partitionBy("__pc_cell").parquet(tmp()) }
    spark.stop()
  }
}
