package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** Variant shootout for the gram-hash front: where do 16 s go on 5 000
  * documents, and which plan shape removes it?
  */
object ProfileGram {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[gram] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32).localCheckpoint(true)
    val k = 8
    val texts = docs.select("text").collect()
      .map(r => org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
    time(s"driver loop compute x${texts.length}") {
      var total = 0L
      texts.foreach(t => total += graft.functions.GramShingleHashes.compute(t, k).numElements())
      System.err.println(s"[gram] total grams=$total")
    }
    time("v0 new gramHashes explode count") {
      graft.operators.Dedup.gramHashes(docs, "doc_id", "text", 8)
        .select(col("id"), explode(col("hs0")).as("g")).count()
    }
    time("v0b new gramHashes explode count (2nd)") {
      graft.operators.Dedup.gramHashes(docs, "doc_id", "text", 8)
        .select(col("id"), explode(col("hs0")).as("g")).count()
    }

    // v1: the operator as written (projection then transform+xxhash)
    time("v1 current gramHashes") {
      docs.select(col("doc_id").as("id"), T.canonicalText(col("text")).as("ct"))
        .select(col("id"),
          transform(T.shinglesOfCanonical(col("ct"), k), xxhash64(_)).as("hs0"))
        .select(col("id"), explode(col("hs0")).as("g")).count()
    }
    // v2: canonical text materialized through a checkpoint barrier
    time("v2 ct materialized (chk barrier)") {
      val ct = docs.select(col("doc_id").as("id"),
        T.canonicalText(col("text")).as("ct")).localCheckpoint(true)
      ct.select(col("id"),
          transform(T.shinglesOfCanonical(col("ct"), k), xxhash64(_)).as("hs0"))
        .select(col("id"), explode(col("hs0")).as("g")).count()
    }
    // v3: shingles without the distinct
    time("v3 no array_distinct (chk ct)") {
      val ct = docs.select(col("doc_id").as("id"),
        T.canonicalText(col("text")).as("ct")).localCheckpoint(true)
      ct.select(col("id"), explode(transform(
          sequence(lit(1), greatest(length(col("ct")) - (k - 1), lit(1))),
          i => xxhash64(col("ct").substr(i, lit(k))))).as("g")).count()
    }
    // v4: no xxhash (string grams), ct checkpointed
    time("v4 no hash, distinct (chk ct)") {
      val ct = docs.select(col("doc_id").as("id"),
        T.canonicalText(col("text")).as("ct")).localCheckpoint(true)
      ct.select(col("id"),
          explode(T.shinglesOfCanonical(col("ct"), k)).as("g")).count()
    }
    spark.stop()
  }
}
