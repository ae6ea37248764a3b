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
    val tok = tokenize(docs, idCol, textCol)
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
    scoreTf(tf, stats, k, k1, b)
  }

  private def tokenize(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      regexp_extract_all(lower(trim(col(textCol))), lit("\\S+"), lit(0))
        .as("ws"))

  /** Score a (doc_id, t, tf, dl) frame: df from the frame itself (exactly
    * the matched terms' postings), (N, avgdl) broadcast from `stats`, then
    * the BM25 sum with a TakeOrderedAndProject top-k. Shared by the ad-hoc
    * and the index-backed paths so both produce identical arithmetic. */
  private def scoreTf(tf: DataFrame, stats: DataFrame, k: Int,
      k1: Double, b: Double): DataFrame = {
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

  /** Materialize the inverted index: per-(term, doc) postings with tf and
    * doc length, landed PARTITIONED BY TERM HASH BUCKET (Hive layout
    * `tb=<n>/`), plus a 1-row corpus-stats sidecar (N, avgdl). Build once —
    * one tokenize + one (doc, term) aggregation; every subsequent query
    * ([[searchIndex]]) reads ONLY its terms' bucket partitions, so the
    * 100 TB search cost is |query terms|/nBuckets of the index, not a
    * corpus scan. df is NOT precomputed: it derives from the pruned read
    * itself (count per term over one term's postings), which keeps the
    * index single-purpose and incrementally rebuildable per bucket.
    */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 64): Unit = {
    val tok = tokenize(docs, idCol, textCol)
    tok.agg(count(lit(1)).cast("double").as("n_docs"),
        avg(size(col("ws")).cast("double")).as("avgdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    tok
      .select(col("doc_id"), size(col("ws")).cast("double").as("dl"),
        explode(col("ws")).as("t"))
      .groupBy("doc_id", "t")
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
      .withColumn("tb", pmod(xxhash64(col("t")), lit(nBuckets.toLong)))
      // one file per bucket: the write shuffle clusters on the same key
      // the reads prune on
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$path/postings")
  }

  /** BM25 over a persisted [[buildIndex]] layout: hash the query's terms to
    * their buckets (a |terms|-row local job — the hash must be Spark's own
    * xxhash64, so it is computed BY Spark, not re-implemented), read only
    * those bucket partitions (partition pruning), and score identically to
    * [[bm25TopK]].
    */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queryTerms: Seq[String], k: Int, nBuckets: Int = 64,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "searchIndex needs at least one query term")
    import spark.implicits._
    val terms = queryTerms.map(_.toLowerCase).distinct
    val buckets = terms.toDF("t")
      .select(pmod(xxhash64(col("t")), lit(nBuckets.toLong)).as("tb"))
      .distinct().as[Long].collect().toSeq
    val stats = spark.read.parquet(s"$path/stats")
    val tf = spark.read.parquet(s"$path/postings")
      .where(col("tb").isin(buckets: _*)) // partition filter — pruned scan
      .where(col("t").isin(terms: _*))
      .select(col("doc_id"), col("t"), col("tf"), col("dl"))
    scoreTf(tf, broadcast(stats), k, k1, b)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009): fuse
    * any number of ranked shortlists into one ranking by
    * rrf(d) = Σ_legs 1/(rrfK + rank_leg(d)), counting only the legs where
    * the document appears. The canonical hybrid-retrieval combiner — a
    * lexical leg (BM25) and a semantic leg (embedding cosine) disagree on
    * score SCALE, so fusing on ranks beats any score normalization and
    * needs no tuning beyond the damping constant (60 is the paper value).
    *
    * Each leg is `(shortlist, idCol, scoreCol)`; its rank is the 1-based
    * row number ordered by (score DESC, id ASC) — legs round their scores
    * before ranking (both this file's BM25 and Similarity's cosine emit
    * rounded scores), so ranks are engine-stable. Scale shape: legs are
    * top-N shortlists (N ≈ pool size, tens of rows), already reduced from
    * the corpus by their own scale paths (pruned postings buckets, IVF
    * cells), so the unpartitioned rank windows and the fusion union run on
    * bounded inputs — the 100 TB cost lives entirely inside the legs.
    */
  def rrfFuse(legs: Seq[(DataFrame, String, String)], k: Int,
      rrfK: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranked leg")
    require(k > 0, "rrfFuse needs k > 0")
    import org.apache.spark.sql.expressions.Window
    val ranked = legs.map { case (df, idCol, scoreCol) =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
      df.select(col(idCol).cast("long").as("doc_id"),
        (lit(1.0) / (lit(rrfK.toDouble) + row_number().over(w))).as("contrib"))
    }
    ranked.reduce(_ unionAll _)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_legs"),
        round(sum(col("contrib")), 6).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(k)
  }
}
