package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.GraftSqlBridge
import graft.functions.BpeApply

/** Byte-pair-encoding tokenizer TRAINING (Sennrich et al., ACL 2016) — the
  * step between vocabulary statistics ([[graft.SparkEntry]] `vocab_topk`)
  * and tokenizer application ([[Corpus.tokenizeToIds]]) that the engine was
  * missing: learn the merge table itself from the corpus.
  *
  * Scale shape: training never iterates over the corpus. The corpus is
  * collapsed ONCE to the distinct-word vocabulary with occurrence counts
  * (the classic BPE trick — pair statistics are word-frequency-weighted, so
  * the distinct-word table carries exactly the same information at a
  * fraction of the rows); every merge iteration is then a pair-count
  * aggregation + a one-row argmax over that small table, and the merge is
  * applied map-side by the codegen'd [[graft.functions.BpeApply]]
  * expression. The only driver-side data is the per-iteration best pair
  * (one row) and the merge list itself (`nMerges` rows) — the bounded
  * broadcast-build idiom. Lineage is cut with `localCheckpoint` every few
  * iterations, the standard guard for iterative Spark plans.
  *
  * Determinism: ties on pair count break lexicographically on (a, b), so
  * the learned merge table is reproducible run-to-run and engine-to-engine.
  */
object Bpe {

  /** Distinct-word vocabulary with counts; the training working set. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Learn `nMerges` merges. Returns the ordered merge table
    * (rank, a, b, pair_count). Stops early when no pair occurs twice.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      checkpointEvery: Int = 8): Seq[(Int, String, String, Long)] =
    trainFromVocab(wordVocab(docs, textCol), nMerges, checkpointEvery)

  /** Learn merges from a prebuilt `(word, n)` vocabulary — the entry the
    * multi-round oracle gate pins training through (a deterministic
    * sub-vocabulary makes the learned table engine-independent), and the
    * hook for callers that maintain their own vocabulary table.
    */
  def trainFromVocab(vocab: DataFrame, nMerges: Int,
      checkpointEvery: Int = 8): Seq[(Int, String, String, Long)] = {
    require(nMerges >= 0, "nMerges must be non-negative")
    var cur = vocab.select(col("n"), split(col("word"), "").as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val best = pairCounts(cur)
        .orderBy(col("total").desc, col("a"), col("b")).limit(1)
        .collect() // one row — the argmax, not data
      if (best.isEmpty || best.head.getLong(2) < 2) done = true
      else {
        val (a, b, n) =
          (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += ((rank, a, b, n))
        cur = cur.withColumn("syms", GraftSqlBridge.column(
          BpeApply(GraftSqlBridge.expression(col("syms")), Seq((a, b)))))
        if (rank % checkpointEvery == 0) cur = cur.localCheckpoint(true)
        rank += 1
      }
    }
    merges.toSeq
  }

  /** Round-1 pair statistics straight from a (word, n) vocabulary —
    * the exact aggregation every training iteration runs, exposed for the
    * oracle gate and for pair-frequency analyses.
    */
  def initialPairCounts(vocab: DataFrame): DataFrame =
    pairCounts(vocab.select(col("n"), split(col("word"), "").as("syms")))

  /** Occurrence-weighted adjacent-pair counts over the working vocab. */
  private def pairCounts(cur: DataFrame): DataFrame =
    cur.where(size(col("syms")) >= 2) // before sequence(): 0..size-2 valid
      .select(col("n"), explode(transform(
        sequence(lit(0), size(col("syms")) - 2),
        j => struct(element_at(col("syms"), j + 1).as("a"),
          element_at(col("syms"), j + 2).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("total"))

  /** Tokenize `textCol` with a learned merge table: whitespace words →
    * characters → merges in rank order — map-side, one codegen'd
    * expression, no shuffle. Output: idCol, tokens (array<string>),
    * n_tokens.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val pairs = merges.sortBy(_._1).map(m => (m._2, m._3))
    val words = split(trim(col(textCol)), "\\s+")
    docs.where(length(trim(col(textCol))) > 0)
      .select(col(idCol), flatten(transform(words,
        w => GraftSqlBridge.column(BpeApply(
          GraftSqlBridge.expression(split(w, "")), pairs)))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }
}
