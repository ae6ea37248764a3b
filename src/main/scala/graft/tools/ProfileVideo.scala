package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for the mm_video_dedup gate (VERDICT r10 item 8):
  * encode (fixture build) vs decode+dHash (frame table) vs class collapse
  * vs the class-level mine/metrics. `runMain graft.tools.ProfileVideo
  * [sfDir]`.
  */
object ProfileVideo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val M = graft.operators.Multimodal
    for (pass <- 1 to 2) {
      println(s"-- pass $pass")
      val media = time("media build+checkpoint") {
        M.videoNearDupTableFromDocuments(spark, docs.repartition(32),
          nDistinct = 20, nFrames = 8).localCheckpoint(false)
      }
      time("media count")(println("  videos=" + media.count()))
      val fh = time("frame hash table+checkpoint") {
        M.videoFrameHashTable(spark, media).localCheckpoint(false)
      }
      time("fh count")(println("  frames=" + fh.count()))
      val classes = time("class collapse+checkpoint") {
        fh.groupBy(col("media_id"))
          .agg(sort_array(collect_set(col("fhash"))).as("fset"))
          .groupBy(col("fset"))
          .agg(min(col("media_id")).as("cls"), count(lit(1)).as("g"))
          .localCheckpoint(false)
      }
      time("classes count")(println("  classes=" + classes.count()))
      time("full gate (from media)") {
        val n = M.videoDedupMetrics(spark, media, threshold = 0.7,
          bands = 8, rowsPerBand = 2, recallFloor = 0.9).count()
        println("  rows=" + n)
      }
      time("full query (memoized media)") {
        val n = graft.SparkEntry.queries("mm_video_dedup")(spark, sfDir).count()
        println("  rows=" + n)
      }
    }
    spark.stop()
  }
}
