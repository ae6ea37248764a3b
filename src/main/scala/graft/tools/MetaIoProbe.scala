package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sinks.{PosixLinkCommitStore, SnapshotLake}

/** Scratch probe: wall-time of the driver-side metadata ops (countRows /
  * minMaxFromStats / tableProfile) as the manifest's FILE COUNT grows —
  * the r6 verdict's watch item was sequential footer IO serializing at
  * 10⁵–10⁶ files. With the bounded pool the per-file cost should flatten:
  * 10× the files ≪ 10× the wall. (Temporary tool — not part of the
  * engine surface.)
  */
object MetaIoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val store = PosixLinkCommitStore
    for (files <- Seq(96, 960)) {
      val t = java.nio.file.Files.createTempDirectory("graft_metaio_")
        .resolve("t").toString
      val df = (1 to files * 100).map(i => (i.toLong, (i % 1000).toDouble))
        .toDF("id", "x").repartition(files)
      SnapshotLake.commitAppend(df, t, store, statsCols = Seq("x"),
        ndvCols = Seq("id"))
      def time(label: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[metaio] files=$files $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.3fs ($r)")
      }
      time("countRows")(SnapshotLake.countRows(spark, t, None, store))
      time("countRows#2")(SnapshotLake.countRows(spark, t, None, store))
      // the pre-pool behavior, inlined: same footer reads, single thread
      time("seqFooters") {
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        import scala.jdk.CollectionConverters._
        val conf = spark.sessionState.newHadoopConf()
        val dataDir = java.nio.file.Paths.get(t, "data")
        val s = java.nio.file.Files.walk(dataDir)
        val names = try s.iterator().asScala
          .filter(_.toString.endsWith(".parquet")).toList finally s.close()
        names.map { p =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p.toString), conf))
          try r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
          finally r.close()
        }.sum
      }
      time("minMax")(SnapshotLake.minMaxFromStats(t, "x", None, store))
      time("profile")(SnapshotLake.tableProfile(spark, t,
        Seq("id", "x"), None, store).collect().length)
    }
    spark.stop()
  }
}
