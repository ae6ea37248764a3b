package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical language-model scoring over the corpus — the CCNet /
  * Wenzek et al. (LREC'20) perplexity-filter shape: score every document
  * against a language model and gate on the score (high perplexity = the
  * model finds the text surprising = likely boilerplate, gibberish, or
  * wrong-language). The reference's platform leaves quality filtering to
  * the SQL slot (`etl/query_runner.py:32-41` runs arbitrary scoring SQL);
  * here the model TRAINING and the scoring are both single declarative
  * plans over the corpus.
  *
  * Scale shape (the reason this is join-structured, not UDF-structured):
  * the bigram count table is corpus-derived state, and scoring joins each
  * document's bigram INSTANCES against it keyed on the bigram — a plain
  * shuffle join on a constant-width key, never a per-row lookup into
  * driver state. At 100 TB the count table is itself distributed; nothing
  * here collects it. The two count aggregations and the scoring join all
  * hash-shuffle on the (w1, w2) / w1 keys, so consecutive stages reuse
  * the exchange layout.
  */
object LangModel {

  /** Add-k-smoothed bigram negative log-likelihood + perplexity per doc.
    *
    * Tokenization matches [[graft.functions.TextFunctions]]: lowercase,
    * trim, split on whitespace (`\S+`). The model is trained on the SAME
    * corpus it scores (the self-perplexity curation idiom — docs unlike
    * the corpus bulk score high).
    *
    * p(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V) where c(w1·) is the
    * bigram-history count (occurrences of w1 in non-final position) and
    * V the corpus vocabulary size; both add-k terms keep unseen bigrams
    * finite. Docs with fewer than 2 tokens emit n_bigrams = 0, nll = 0,
    * ppl = null (no bigram evidence — callers treat them as a separate
    * length-gate case, as the quality rules already do).
    *
    * @return (doc_id, n_bigrams, nll, ppl) one row per input doc;
    *         nll = Σ −ln p over the doc's bigram instances,
    *         ppl = exp(nll / n_bigrams)
    */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      k: Double = 0.5): DataFrame = {
    require(k > 0, "add-k smoothing needs k > 0")
    val tok = docs.select(col(idCol).as("doc_id"),
      regexp_extract_all(lower(trim(col(textCol))), lit("\\S+"), lit(0))
        .as("ws"))

    // bigram instances: one row per adjacent token pair occurrence.
    // Three consumers (bigram counts, history counts, the scoring join)
    // reference this frame — the lazy localCheckpoint materializes the
    // explode ONCE and shares it, instead of re-scanning and re-exploding
    // the corpus per consumer (the memoized-front discipline; at corpus
    // scale the explode is the dominant map work).
    val big = tok.select(col("doc_id"), explode(
        when(size(col("ws")) < 2,
          array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(transform(sequence(lit(1), size(col("ws")) - 1),
            i => struct(element_at(col("ws"), i).as("w1"),
              element_at(col("ws"), i + 1).as("w2"))))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint(false)

    // corpus model state: bigram counts, history counts, vocabulary size.
    // The 1-row vocab frame rides a broadcast cross join (the metric-query
    // idiom) — never a driver collect.
    val bigramCounts = big.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val historyCounts = big.groupBy("w1").agg(count(lit(1)).as("ch"))
    val vocab = tok.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).cast("double").as("v"))

    val scored = big
      .join(bigramCounts, Seq("w1", "w2"))
      .join(historyCounts, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log((col("cb") + lit(k)) / (col("ch") + lit(k) * col("v"))).as("lp"))
    val agg = scored.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"), sum(-col("lp")).as("nll"))

    tok.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll"), lit(0.0)).as("nll"),
        when(col("n_bigrams") > 0, exp(col("nll") / col("n_bigrams")))
          .as("ppl"))
  }
}
