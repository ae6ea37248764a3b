package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch probe (r15 verdict item 4): measures the DROPPED GRAM-MASS
  * fraction — Σ df over grams with df > cap, over Σ df — at each ladder
  * cap, on (a) the oracle fixture corpora and (b) the 10× template-cluster
  * corpus where CAP_RECALL.json measured the governed mines returning
  * zero pairs. Places the fail-loud default threshold between the two.
  */
object CapMassProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def massLine(label: String, docsPath: String): Unit = {
      val docs = spark.read.parquet(docsPath)
        .select(col("doc_id"), col("text"))
      val hashed = Dedup.gramHashes(docs, "doc_id", "text", shingleK = 8)
      val df = hashed.select(explode(col("hs0")).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("df"))
      val caps = Seq(256, 128, 64, 32, 16, 8)
      val row = df.agg(
        sum(col("df")).cast("double").as("total"),
        caps.map(c => sum(when(col("df") <= c, col("df")).otherwise(0L))
          .cast("double").as(s"m$c")): _*).head()
      val total = row.getDouble(0)
      val parts = caps.zipWithIndex.map { case (c, i) =>
        f""""dropped_at_$c":${1.0 - row.getDouble(1 + i) / total}%.4f"""
      }
      // doc INVISIBILITY: fraction of docs whose EVERY gram exceeds the
      // cap — such a doc cannot appear in any mined pair at all
      val g = hashed.select(col("id"), explode(col("hs0")).as("g"))
        .join(df, "g")
      val nDocs = docs.count().toDouble
      val inv = caps.map { c =>
        val visible = g.where(col("df") <= c).select(col("id"))
          .distinct().count()
        f""""invisible_at_$c":${1.0 - visible / nDocs}%.4f"""
      }
      // what the governed chooser actually picks here, and what it mines —
      // guard OFF: the probe's whole point is measuring the blind-empty
      // corpora the default guard turns into a throw
      val (pairs, cap) = Dedup.containmentPairsGoverned(hashed,
        threshold = 0.5, blindEmptyGuard = None)
      val nPairs = pairs.count()
      println(s"""{"corpus":"$label","chosen_cap":$cap,""" +
        s""""governed_pairs":$nPairs,${parts.mkString(",")},""" +
        inv.mkString(",") + "}")
    }
    massLine("sf0.001", "/root/testdata/sf0.001/documents.parquet")
    massLine("sf0.01", "/root/testdata/sf0.01/documents.parquet")
    massLine("sf0.1", "/root/testdata/sf0.1/documents.parquet")
    val cdDir = sys.env.getOrElse("SPARK_GRAFT_CD_DIR", "/tmp/graft_scale10cd")
    ScaleCorpus.stage(spark, "/root/testdata/sf0.1", cdDir, copies = 10,
      constantDensity = true)
    massLine("cd10x", s"$cdDir/documents.parquet")
    spark.stop()
  }
}
