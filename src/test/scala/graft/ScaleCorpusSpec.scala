package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.tools.ScaleCorpus

/** The scale-corpus replica transforms carry the round-11 measurement
  * story (VERDICT r10 item 1), so their properties are pinned, not
  * asserted: the default (permute) mode preserves word MULTISETS — the
  * documented SimHash confound — while constant-density mode diverges
  * them so order-free sketches separate across replicas and
  * within-replica near-dups survive.
  */
class ScaleCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def stageTmp(cd: Boolean): String = {
    val out = java.nio.file.Files
      .createTempDirectory(s"graft_sc_spec_${if (cd) "cd" else "pm"}_")
      .toString
    ScaleCorpus.stage(spark, sf0001, out, copies = 3, constantDensity = cd)
    out
  }

  /** (base doc_id, replica index, simhash) for every replica of docs with
    * enough words to make the statistics meaningful. */
  private def replicaSigs(dir: String) = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("base_id", pmod($"doc_id", lit(100000000L)))
      .withColumn("rep", ($"doc_id" / lit(100000000L)).cast("int"))
    Dedup.simhashTable(docs, "doc_id", "text")
      .join(docs.select($"doc_id", $"base_id", $"rep"), "doc_id")
  }

  test("permute mode preserves word multisets: every replica's simhash " +
      "is IDENTICAL to its base's (the documented 100x confound)") {
    val dir = stageTmp(cd = false)
    val distinctSigs = replicaSigs(dir)
      .groupBy($"base_id").agg(countDistinct($"sh").as("n"))
      .where($"n" > 1).count()
    assert(distinctSigs == 0,
      s"$distinctSigs base docs have diverging replica simhashes in " +
        "permute mode — the multiset-preservation contract broke")
  }

  test("constant-density mode diverges replicas: simhash separates " +
      "beyond the mine's Hamming budget and cross-replica Jaccard " +
      "collapses below every threshold, while word counts are preserved") {
    val dir = stageTmp(cd = true)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("base_id", pmod($"doc_id", lit(100000000L)))
      .withColumn("rep", ($"doc_id" / lit(100000000L)).cast("int"))
      .withColumn("n_words",
        size(filter(split($"text", "\\s+"), w => length(w) > 0)))
    // word-count preservation: substitution tags words, never adds/drops
    val wc = docs.groupBy($"base_id")
      .agg(countDistinct($"n_words").as("n")).where($"n" > 1).count()
    assert(wc == 0, s"$wc base docs changed word count across replicas")
    // simhash separation on docs long enough for the ~20% substitution
    // rate to bite (tiny docs can legitimately stay within Hamming 3)
    val longIds = docs.where($"rep" === 0 && $"n_words" >= 30)
      .select($"base_id")
    val sigs = replicaSigs(dir).join(longIds, "base_id")
    val basePairs = sigs.where($"rep" === 0)
      .select($"base_id", $"sh".as("sh0"))
      .join(sigs.where($"rep" > 0).select($"base_id", $"sh", $"rep"),
        "base_id")
      .select($"base_id", $"rep",
        bit_count($"sh0".bitwiseXOR($"sh")).as("hamming"))
    val n = basePairs.count()
    val separated = basePairs.where($"hamming" > 3).count()
    assert(n > 0)
    assert(separated >= n * 0.9,
      s"only $separated/$n long-doc replica pairs separate beyond " +
        "Hamming 3 — cd mode is not diverging multisets enough")
    // cross-replica 8-gram Jaccard collapses below the loosest mine
    // threshold (0.2): replicas are NOT near-dups of their base
    val grams = Dedup.gramHashes(
      docs.where($"n_words" >= 30), "doc_id", "text")
      .join(docs.select($"doc_id", $"base_id", $"rep"),
        col("id") === $"doc_id")
    val g0 = grams.where($"rep" === 0)
      .select($"base_id", explode($"hs0").as("g"))
    val g1 = grams.where($"rep" === 1)
      .select($"base_id", explode($"hs0").as("g"))
    val inter = g0.join(g1, Seq("base_id", "g")).groupBy($"base_id")
      .agg(count(lit(1)).as("c"))
    val sizes0 = g0.groupBy($"base_id").agg(count(lit(1)).as("n0"))
    val sizes1 = g1.groupBy($"base_id").agg(count(lit(1)).as("n1"))
    val jacc = sizes0.join(sizes1, "base_id")
      .join(inter, Seq("base_id"), "left")
      .select($"base_id", (coalesce($"c", lit(0L)) /
        ($"n0" + $"n1" - coalesce($"c", lit(0L)))).as("j"))
    val tooSimilar = jacc.where($"j" >= 0.2).count()
    val total = jacc.count()
    assert(total > 0)
    assert(tooSimilar <= total * 0.05,
      s"$tooSimilar/$total replica pairs still clear Jaccard 0.2 — " +
        "cross-replica near-dup density is not constant")
  }
}
