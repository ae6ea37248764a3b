package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch probe: band-bucket occupancy of the MinHash-LSH mine at 1× vs
  * 10× — attributes the dedup_minhash_lsh scale10 drift (7.6× in r7): if
  * Σ c·(c−1)/2 over bucket sizes (the in-bucket pair expansion) grows
  * super-linearly, occupancy is the driver and a big-bucket split pays;
  * if it tracks the corpus, the drift lives in the signature/verify
  * stages instead. (Temporary tool — not part of the engine surface.)
  */
object LshOccupancyProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (numPerm, bands) = (64, 32) // the dedup_minhash_lsh gate config
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_scale10")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 8, numPerm)
        .localCheckpoint(false)
      val occ = Dedup.bandKeys(sigs, "doc_id", numPerm, bands)
        .groupBy(col("band"), col("band_hash"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val stats = occ.agg(
        count(lit(1)).as("buckets"),
        max(col("c")).as("max_c"),
        expr("percentile_approx(c, 0.99)").as("p99"),
        sum(when(col("c") > 1, col("c") * (col("c") - 1) / 2)
          .otherwise(0L)).cast("long").as("pair_work"),
        sum(when(col("c") > 64, col("c") * (col("c") - 1) / 2)
          .otherwise(0L)).cast("long").as("pair_work_from_cgt64"),
        sum(when(col("c") > 1, lit(1)).otherwise(0L)).as("colliding"))
        .head()
      println(s"[lsh] $dir docs=${docs.count()} buckets=${stats.get(0)} " +
        s"max=${stats.get(1)} p99=${stats.get(2)} pairWork=${stats.get(3)} " +
        s"pairWorkFromBucketsGt64=${stats.get(4)} colliding=${stats.get(5)}")
    }
    spark.stop()
  }
}
