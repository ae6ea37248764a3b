package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write-amplification attribution for the quantized-append gate family
  * (VERDICT r10 item 5): the committed bench's heaviest ANN tier is
  * sim_ann_ivf{pq,sq}_append at 6.0–6.6 s — split each gate into its
  * stages (in-gate layout BUILD, payload-schema footer read, append
  * assign+encode+land, read-back) so the cost lands on the component that
  * owns it. `runMain graft.tools.ProfileAppend [sfDir]`.
  */
object ProfileAppend {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.operators.Similarity
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .localCheckpoint(false)
    val corpus = emb.where(pmod(col("vec_id"), lit(5)) =!= 0)
      .localCheckpoint(false)
    val batch = emb.where(pmod(col("vec_id"), lit(5)) === 0)
      .localCheckpoint(false)
    val nLists = math.max(16, (corpus.count() / 125L).toInt)
    println(s"corpus=${corpus.count()} batch=${batch.count()} nLists=$nLists")
    for (pass <- 1 to 2) {
      println(s"-- pass $pass (pq)")
      val p = java.nio.file.Files.createTempDirectory("graft_papq_").toString
      time("pq write (in-gate build)") {
        S.ivfPqWrite(corpus, "vec_id", "embedding", p,
          nLists = nLists, m = 16, ksub = 32, kMeansIters = 1)
      }
      time("pq append") {
        S.ivfPqAppend(batch, "vec_id", "embedding", p)
      }
      time("pq read-back gate") {
        S.ivfPqBatchTopK(spark, p, batch, "vec_id", "embedding",
          1, nProbe = 1, rerank = 256, excludeSelf = false)
          .agg(count(lit(1)), min(col("cos"))).collect()
      }
      println(s"-- pass $pass (sq)")
      val q = java.nio.file.Files.createTempDirectory("graft_pasq_").toString
      time("sq write (in-gate build)") {
        S.ivfSqWrite(corpus, "vec_id", "embedding", q,
          nLists = nLists, kMeansIters = 1)
      }
      time("sq append") {
        S.ivfSqAppend(batch, "vec_id", "embedding", q)
      }
      time("sq read-back gate") {
        S.ivfSqBatchTopK(spark, q, batch, "vec_id", "embedding",
          1, nProbe = 1, rerank = 256, excludeSelf = false)
          .agg(count(lit(1)), min(col("cos"))).collect()
      }
    }
    spark.stop()
  }
}
