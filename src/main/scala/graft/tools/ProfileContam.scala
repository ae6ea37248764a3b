package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Stage attribution for contaminationCheck at a given sf dir. */
object ProfileContam {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T0](label: String)(f: => T0): T0 = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pc] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet").repartition(32)
    val evalSet = docs.where(pmod(col("doc_id"), lit(20)) === 0)
    val train = docs.where(pmod(col("doc_id"), lit(20)) =!= 0)
    val k = 8
    def gramSets(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id").as("id"), T.canonicalText(col("text")).as("ct"))
      .where(length(col("ct")) >= k)
      .select(col("id"), T.shinglesOfCanonical(col("ct"), k).as("gs"))
    time("eval gramSets explode+distinct count") {
      println("  evalGrams=" + gramSets(evalSet)
        .select(explode(col("gs")).as("g")).distinct().count())
    }
    time("train gramSets explode count") {
      println("  trainGramRows=" + gramSets(train)
        .select(col("id"), explode(col("gs")).as("g")).count())
    }
    time("train gramSets WITH size column") {
      println("  rows=" + gramSets(train)
        .select(col("id"), size(col("gs")).as("n"), explode(col("gs")).as("g"))
        .count())
    }
    time("full contaminationCheck") {
      println("  hits=" + graft.operators.Corpus.contaminationCheck(
        train, evalSet, "doc_id", "text", shingleK = 8, minOverlap = 0.05)
        .count())
    }
    time("dedup gramHashes explode count (same docs)") {
      println("  rows=" + graft.operators.Dedup
        .gramHashes(train, "doc_id", "text", shingleK = 8)
        .select(col("id"), explode(col("hs0")).as("g")).count())
    }
    time("two-project gramSets, no filter between") {
      val gs = train
        .select(col("doc_id").as("id"), T.canonicalText(col("text")).as("ct"))
        .select(col("id"), T.shinglesOfCanonical(col("ct"), k).as("gs"))
      println("  rows=" + gs.select(explode(col("gs"))).count())
    }
    time("positional explode distinct (old shape)") {
      val pos = train
        .select(col("doc_id").as("id"), T.canonicalText(col("text")).as("ct"))
        .where(length(col("ct")) >= k)
        .select(col("id"), col("ct"), explode(sequence(lit(1),
          length(col("ct")) - (k - 1))).as("p"))
        .select(col("id"), col("ct").substr(col("p"), lit(k)).as("g"))
      println("  rows=" + pos.select(col("id"), col("g")).distinct().count())
    }
    spark.stop()
  }
}
