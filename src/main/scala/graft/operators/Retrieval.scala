package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval over the corpus — BM25 (Robertson/Okapi),
  * the classical lexical scorer. Retrieval is a first-class corpus-curation
  * need (e.g. "find documents about X to audit/label/remove"), and the
  * score itself doubles as a relevance feature for mixing weights.
  *
  * Scale shape: the query's term list is tiny and broadcast into a
  * map-side `isin` filter over the exploded postings — the term filter
  * prunes BEFORE any shuffle, so the ranked join moves only rows for the
  * query's terms, never the full inverted index. Per-term document
  * frequencies and the global (N, avgdl) scalars are small aggregates that
  * broadcast back; the final top-k is a TakeOrderedAndProject, not a
  * global sort.
  */
object Retrieval {

  /** BM25 top-k: score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) — the standard
    * Robertson-Sparck Jones idf with the +1 that keeps it positive.
    *
    * Tokenization matches the corpus convention (lowercase, trim, `\S+`).
    * Only documents matching ≥1 query term appear (BM25 of no matched
    * terms is 0 — not a ranked result). Ties broken by ascending doc id on
    * the ROUNDED score, so the emitted top-k is stable across engines and
    * summation orders.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0, "bm25TopK needs k > 0")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val tok = docs.select(col(idCol).as("doc_id"),
      regexp_extract_all(lower(trim(col(textCol))), lit("\\S+"), lit(0))
        .as("ws"))
    val stats = tok.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(size(col("ws")).cast("double")).as("avgdl"))

    // postings restricted to the query's terms before any shuffle
    val posting = tok
      .select(col("doc_id"), size(col("ws")).cast("double").as("dl"),
        explode(col("ws")).as("t"))
      .where(col("t").isin(terms: _*))
    val tf = posting.groupBy("doc_id", "t")
      .agg(count(lit(1)).cast("double").as("tf"),
        first(col("dl")).as("dl"))
    val df = tf.groupBy("t").agg(count(lit(1)).cast("double").as("df"))

    val perTerm = tf.join(broadcast(df), Seq("t"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .as("s"))
    perTerm.groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), round(sum(col("s")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
