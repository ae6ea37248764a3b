package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** One-off cardinality probe for the pair mine: how many DISTINCT
  * co-occurring pairs does the capped gram table induce (i.e. the pair
  * aggregation's output size), vs the pre-aggregation pair-row volume.
  * Decides whether the aggregation or its tail is the scale bottleneck.
  */
object ProfilePairs {
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
      println(f"[pp] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").repartition(32)
    val hashed = Dedup.gramHashes(docs, "doc_id", "text", shingleK = 8)
      .localCheckpoint(false)
    val g = hashed.select(col("id"), explode(col("hs0")).as("g"))
    val ok = g.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .where(col("df") <= 256).select(col("g"))
    val filtered = g.join(ok, "g").localCheckpoint(false)
    time("materialize capped gram rows") {
      println("  rows=" + filtered.count())
    }
    val pairRows = filtered.as("a").join(filtered.as("b"),
        col("a.g") === col("b.g")).where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    time("distinct pair approx count") {
      println("  " + pairRows
        .agg(count(lit(1)).as("pair_rows"),
          approx_count_distinct(concat_ws("_", col("id_a"), col("id_b")))
            .as("distinct_pairs"))
        .collect().mkString)
    }
    time("plain count-only agg (old shape, no joins)") {
      println("  groups=" + pairRows
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("c"))
        .count())
    }
    // Prefix-filter candidate volume at t=0.2: rank each doc's grams by
    // global (df, g) ascending — rarest first — keep the first
    // n - ceil(t*n) + 1, and measure sum(prefix_df^2) (the candidate join
    // volume) vs the unfiltered sum(df^2).
    import org.apache.spark.sql.expressions.Window
    val dfTab = g.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .where(col("df") <= 256)
    val ranked = g.join(dfTab, "g")
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("id"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("g"))))
      .where(col("rk") <= col("n") - ceil(col("n") * 0.2) + 1)
    time("prefix candidate volume") {
      ranked.groupBy(col("g")).agg(count(lit(1)).as("pdf"))
        .agg(sum(col("pdf") * col("pdf")).as("prefix_pair_work"),
          count(lit(1)).as("grams"))
        .show(false)
    }
    spark.stop()
  }
}
