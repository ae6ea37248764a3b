package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Stage-by-stage wall-clock attribution for the dedup pair-mine front (the
  * heaviest scale family) — run against a staged 10× corpus to see WHICH
  * stage turns super-linear before optimizing any of them. Diagnostic only;
  * not part of the bench contract.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(32)
    val hashed = time("gramHashes + localCheckpoint") {
      Dedup.gramHashes(docs, "doc_id", "text", shingleK = 8)
        .localCheckpoint(false)
    }
    time("hashed count (materialize)") { hashed.count() }
    val g = hashed.select(col("id"), explode(col("hs0")).as("g"))
    time("exploded gram rows") { println("  rows=" + g.count()) }
    val df = g.groupBy(col("g")).agg(count(lit(1)).as("df"))
    time("df table + cap stats") {
      df.selectExpr("count(*) n", "sum(if(df>256,1,0)) over_cap",
        "sum(if(df>256,df,0)) rows_over", "sum(if(df<=256,df*df,0)) pair_work")
        .show(false)
    }
    val pairs = time("capped pair mine (full)") {
      val p = Dedup.ngramJaccardPairsFromHashes(hashed, threshold = 0.2,
        maxDocFreq = 256)
      println("  pairs=" + p.count())
      p
    }
    time("pairs >= 0.4 (clusters input)") {
      println("  pairs04=" + pairs.where(col("jaccard") >= 0.4).count())
    }
    spark.stop()
  }
}
