package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch probe: where does the PPJoin candidate expansion come from at
  * scale — raw join-row count, distinct pre-posfilter pairs, and the top
  * prefix-gram occupancies (Σ c² attribution). (Temporary tool.)
  */
object PpjoinExpansion {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/tmp/graft_scale10"
    val threshold = 0.7
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    val g = Dedup.gramHashes(docs, "doc_id", "text", 8)
      .select(col("id"), explode(col("hs0")).as("g"))
    val withDf = g.join(g.groupBy(col("g")).agg(count(lit(1)).as("df")), "g")
    val sorted = withDf.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("sg"))
      .select(col("id"), transform(col("sg"), _.getField("g")).as("gs"),
        size(col("sg")).as("n"))
      .localCheckpoint(true)
    val prefix = sorted.select(col("id"), col("n"),
      posexplode(slice(col("gs"), lit(1),
        greatest(col("n") - ceil(col("n") * threshold).cast("int") + 1,
          lit(1)))).as(Seq("p", "g")))
      .localCheckpoint(true)
    println(s"[exp] docs=${sorted.count()} prefixRows=${prefix.count()}")
    val occ = prefix.groupBy(col("g")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    println("[exp] top prefix-gram occupancies:")
    occ.orderBy(col("c").desc).limit(10).collect()
      .foreach(r => println(s"[exp]   c=${r.getLong(1)}"))
    val sums = occ.agg(sum(col("c") * (col("c") - 1) / 2).as("rawPairsUB"),
      sum(when(col("c") > 1, col("c") * (col("c") - 1) / 2))
        .as("fromCge2")).head()
    println(s"[exp] raw ordered-pair upper bound (no len filter): ${sums.get(0)}")
    val t = lit(threshold)
    val raw = prefix.as("a").join(prefix.as("b"),
      col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
        col("a.n") * t <= col("b.n") && col("b.n") * t <= col("a.n"))
    println(s"[exp] expansion rows (len-filtered): ${raw.count()}")
    val pairs = raw.select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    println(s"[exp] distinct pre-posfilter pairs: ${pairs.count()}")
    spark.stop()
  }
}
