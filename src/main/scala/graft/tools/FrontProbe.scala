package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc cost split of the shared dedup front: gram-hash checkpoint vs
  * pair mine vs signature work. `runMain graft.tools.FrontProbe [sfDir]`.
  */
object FrontProbe {
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
      .repartition(spark.sparkContext.defaultParallelism)
    val hashed = time("gramHashes+checkpoint") {
      graft.operators.Dedup.gramHashes(docs, "doc_id", "text", shingleK = 8)
        .localCheckpoint(false)
    }
    time("hashed.count")(println("  rows=" + hashed.count()))
    val pairs = time("pairMine(0.2)+checkpoint") {
      graft.operators.Dedup.ngramJaccardPairsFromHashes(hashed, threshold = 0.2)
        .localCheckpoint(false)
    }
    time("pairs.count")(println("  rows=" + pairs.count()))
    val exploded = time("exploded gram count") {
      hashed.select(explode(col("hs0")).as("g")).count()
    }
    println("  exploded=" + exploded)
    spark.stop()
  }
}
