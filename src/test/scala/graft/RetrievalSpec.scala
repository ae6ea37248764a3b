package graft

import graft.operators.Retrieval

/** BM25 against a naive in-memory recompute on a tiny corpus. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark runs fast spark scales"),
    (2L, "ducks swim fast"),
    (3L, "spark spark spark spark"),
    (4L, "a very long document about nothing in particular at all here"),
    (5L, "Spark and ducks"))

  private def naiveBm25(terms: Seq[String], k1: Double, b: Double)
      : Map[Long, Double] = {
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSeq }.toMap
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.size).sum / n
    val dfm = terms.map(t => t -> toks.values.count(_.contains(t)).toDouble)
      .toMap
    toks.flatMap { case (id, ws) =>
      val s = terms.map { t =>
        val tf = ws.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
          tf * (k1 + 1) / (tf + k1 * (1 - b + b * ws.size / avgdl))
      }.sum
      if (s > 0) Some(id -> s) else None
    }
  }

  test("bm25TopK matches the naive recompute, ranked, only matching docs") {
    val docs = corpus.toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "ducks"), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = naiveBm25(Seq("spark", "ducks"), 1.2, 0.75)
    assert(got.map(_._1).toSet == want.keySet) // doc 4 matches nothing
    got.foreach { case (id, _, score) =>
      assert(math.abs(score - want(id)) < 1e-6, s"doc $id") }
    // ranked by score desc with doc-id tiebreak
    assert(got.map(-_._3).toSeq == got.map(-_._3).toSeq.sorted)
    // n_terms counts DISTINCT matched terms
    assert(got.find(_._1 == 5L).get._2 == 2L)
    assert(got.find(_._1 == 3L).get._2 == 1L)
  }

  test("bm25TopK truncates to k deterministically") {
    val docs = corpus.toDF("doc_id", "text")
    val two = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 2)
      .collect().map(_.getLong(0))
    val all = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 10)
      .collect().map(_.getLong(0))
    assert(two.toSeq == all.take(2).toSeq)
  }

  test("bm25TopK rejects empty inputs") {
    val docs = corpus.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "doc_id", "text", Nil, 5) }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(docs, "doc_id", "text", Seq("x"), 0) }
  }

  test("index-backed search scores identically to ad-hoc BM25 and prunes partitions") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft_iispec_").toString
    Retrieval.buildIndex(docs, "doc_id", "text", path, nBuckets = 64)
    val terms = Seq("spark", "vector", "customer")
    val adhoc = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val indexed = Retrieval.searchIndex(spark, path, terms, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(indexed == adhoc, "index path must reproduce the ad-hoc scores")
    // partition pruning: the index spreads over many buckets, but a query
    // reads at most |terms| postings partitions (+1 stats file)
    val allParts = new java.io.File(s"$path/postings").listFiles()
      .count(_.getName.startsWith("tb="))
    assert(allParts > terms.size,
      s"fixture must spread terms over >${terms.size} buckets (got $allParts)")
    // sparkPlan, not executedPlan: AQE wraps the tree (see PlanAuditSpec)
    val q = Retrieval.searchIndex(spark, path, terms, k = 20)
    val selected = q.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.partitionSchema.fieldNames.contains("tb") =>
        f.selectedPartitions.partitionCount
    }
    assert(selected.nonEmpty && selected.forall(_ <= terms.size),
      s"pruned read must touch <= ${terms.size} of $allParts buckets, got $selected")
  }

  test("rrfFuse matches the per-leg hand recompute and honors k") {
    // two legs with disjoint score scales and a partial overlap
    val lex = Seq((1L, 9.5), (2L, 7.25), (3L, 7.25), (4L, 1.0))
      .toDF("doc_id", "score")
    val sem = Seq((3L, 0.99), (5L, 0.80), (1L, 0.10)).toDF("vec_id", "cos")
    val got = Retrieval.rrfFuse(
      Seq((lex, "doc_id", "score"), (sem, "vec_id", "cos")), k = 10, rrfK = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def rrf(rs: Seq[Int]) =
      math.rint(rs.map(r => 1.0 / (60 + r)).sum * 1e6) / 1e6
    // lex ranks: 1→1, 2→2 (tie on 7.25 broken by id), 3→3, 4→4
    // sem ranks: 3→1, 5→2, 1→3
    val want = Map(
      1L -> (2L, rrf(Seq(1, 3))), 2L -> (1L, rrf(Seq(2))),
      3L -> (2L, rrf(Seq(3, 1))), 4L -> (1L, rrf(Seq(4))),
      5L -> (1L, rrf(Seq(2))))
    assert(got.length == want.size)
    got.foreach { case (id, nLegs, s) =>
      assert((nLegs, s) == want(id), s"doc $id") }
    // ordered by fused score desc then id; k cuts that order
    assert(got.map(-_._3).toSeq == got.map(-_._3).toSeq.sorted)
    val top2 = Retrieval.rrfFuse(
      Seq((lex, "doc_id", "score"), (sem, "vec_id", "cos")), k = 2, rrfK = 60)
      .collect().map(_.getLong(0)).toSeq
    assert(top2 == got.map(_._1).take(2).toSeq)
  }

  test("rrfFuse rejects empty inputs") {
    val lex = Seq((1L, 1.0)).toDF("doc_id", "score")
    intercept[IllegalArgumentException] { Retrieval.rrfFuse(Nil, 5) }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq((lex, "doc_id", "score")), 0) }
  }
}
