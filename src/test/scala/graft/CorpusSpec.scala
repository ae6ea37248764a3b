package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Corpus-curation operators: deterministic split / shuffle, quantile
  * filtering (exact vs approx-threshold differential), domain caps, and
  * contamination detection. The DuckDB gate pins exact values; these specs
  * pin the semantic invariants.
  */
class CorpusSpec extends SparkSpec {

  private def docs: DataFrame =
    spark.read.parquet(s"$sf0001/documents.parquet")

  test("splitAssign: weights respected, deterministic, append-stable") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Corpus.splitAssign(docs, "doc_id", "s1", splits)
    val counts = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    // 50 docs at sf0.001 — loose banding, the law-of-large-numbers check
    // lives in the sf0.01 gate (500 docs, oracle-pinned exact assignment).
    assert(counts("train") / total > 0.6 && counts("train") / total < 0.95)
    assert(counts.values.sum == docs.count())

    // identical salt → identical assignment
    val again = Corpus.splitAssign(docs, "doc_id", "s1", splits)
    assert(assigned.select("doc_id", "split").except(
      again.select("doc_id", "split")).isEmpty)

    // append stability: assignment of the first half is unchanged when the
    // second half arrives (content-hash, not position or RNG)
    val half = docs.where(col("doc_id") < 25)
    val halfAssigned = Corpus.splitAssign(half, "doc_id", "s1", splits)
    val fullRestricted = assigned.where(col("doc_id") < 25)
    assert(halfAssigned.select("doc_id", "split").except(
      fullRestricted.select("doc_id", "split")).isEmpty)

    // a different salt re-rolls at least one document
    val reRolled = Corpus.splitAssign(docs, "doc_id", "s2", splits)
    assert(assigned.select("doc_id", "split")
      .except(reRolled.select("doc_id", "split")).count() > 0)
  }

  test("splitAssign rejects weights that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Corpus.splitAssign(docs, "doc_id", "s", Seq("a" -> 0.5, "b" -> 0.4))
    }
  }

  test("globalShuffle: pos is a contiguous permutation, deterministic") {
    val shuffled = Corpus.globalShuffle(docs, "doc_id", "s1", numPartitions = 5)
    val n = docs.count()
    assert(shuffled.count() == n)
    // contiguous 0..n-1, no dupes
    val agg = shuffled.agg(min("pos"), max("pos"),
      countDistinct("pos")).head()
    assert(agg.getLong(0) == 0L && agg.getLong(1) == n - 1 &&
      agg.getLong(2) == n)
    // deterministic across partition counts (order is global, not layout)
    val again = Corpus.globalShuffle(docs, "doc_id", "s1", numPartitions = 3)
    assert(shuffled.select("doc_id", "pos")
      .except(again.select("doc_id", "pos")).isEmpty)
    // actually permuted: some doc is displaced from id order
    assert(shuffled.where(col("pos") =!= col("doc_id")).count() > 0)
  }

  test("quality quantile: approx-threshold path tracks the exact window path") {
    val scored = docs.where(length(col("text")) > 0)
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("double").as("q"))
    val exact = Corpus.qualityQuantileFilter(scored, "q", "lang", "doc_id", 0.5)
    val approx = Corpus.qualityThresholdFilter(scored, "q", "lang", 0.5)
    // Exact keeps pct_rank >= 0.5; approx keeps score >= approx-median
    // element. On unique scores these differ by at most the boundary row
    // per group; allow one row per lang group of slack.
    val nLangs = scored.select("lang").distinct().count()
    assert(math.abs(exact.count() - approx.count()) <= nLangs + 1)
    // approx path must not drop anything strictly above its own threshold —
    // every kept doc's score >= its group threshold by construction; sanity:
    // the best-scoring doc per lang always survives BOTH paths.
    val best = scored.groupBy("lang").agg(max("q").as("q"))
    assert(best.join(approx, Seq("lang", "q"), "left_anti").isEmpty)
    assert(best.join(exact.select("lang", "q"), Seq("lang", "q"), "left_anti").isEmpty)
  }

  test("domainCap: no domain exceeds cap; kept rows are the best-ranked") {
    val scored = docs.where(length(col("text")) > 0)
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("double").as("q"))
    val capped = Corpus.domainCap(scored, "source", "q", "doc_id", 2)
    val over = capped.groupBy("source").count().where(col("count") > 2)
    assert(over.isEmpty)
    // every kept row beats (or ties at id-order) every dropped row of the
    // same domain: max dropped q <= min kept q per domain with both present
    val dropped = scored.join(capped.select("doc_id"), Seq("doc_id"), "left_anti")
    val viol = capped.groupBy("source").agg(min("q").as("min_kept"))
      .join(dropped.groupBy("source").agg(max("q").as("max_dropped")), "source")
      .where(col("max_dropped") > col("min_kept"))
    assert(viol.isEmpty)
  }

  test("domainCap plan uses WindowGroupLimit (per-map top-k, no full sort)") {
    val scored = docs.select(col("doc_id"), col("source"),
      length(col("text")).cast("double").as("q"))
    val plan = Corpus.domainCap(scored, "source", "q", "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in plan:\n$plan")
  }

  test("stratifiedSample: per-group rates honored, subset of input, stable") {
    val rates = Map("en" -> 0.5, "de" -> 0.0)
    val sampled = Corpus.stratifiedSample(docs, "doc_id", "lang", "s1", rates)
    // de fully dropped, non-listed langs fully kept (default 1.0)
    assert(sampled.where(col("lang") === "de").isEmpty)
    val others = docs.where(!col("lang").isin("en", "de"))
    assert(sampled.where(!col("lang").isin("en", "de")).count() == others.count())
    // sampled docs are a subset with unchanged rows
    assert(sampled.except(docs).isEmpty)
    // deterministic
    val again = Corpus.stratifiedSample(docs, "doc_id", "lang", "s1", rates)
    assert(sampled.select("doc_id").except(again.select("doc_id")).isEmpty &&
      sampled.count() == again.count())
    // rate-1.0 boundary sentinel: every row kept at default rate
    assert(Corpus.stratifiedSample(docs, "doc_id", "lang", "s1",
      Map.empty[String, Double]).count() == docs.count())
  }

  test("tokenBudgetFilter: best-first selection, <=1 doc overflow per group") {
    import spark.implicits._
    val rows = Seq(
      ("en", 1L, 0.9, 40L), ("en", 2L, 0.8, 40L), ("en", 3L, 0.7, 40L),
      ("en", 4L, 0.6, 40L), // budget 100: keeps 0.9, 0.8, 0.7 (before=80<100)
      ("de", 5L, 0.5, 300L), // single huge doc: kept (before=0), overflows
      ("de", 6L, 0.4, 10L))  // before=300 >= 100 → dropped
      .toDF("lang", "doc_id", "q", "n_tokens")
    val kept = Corpus.tokenBudgetFilter(rows, "lang", "q", "doc_id",
        "n_tokens", budget = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 5L))
    // dropped doc is always worse than every kept doc in its group
    val worstKeptEn = 0.7
    assert(rows.where(col("lang") === "en" && !col("doc_id").isin(1L, 2L, 3L))
      .select("q").as[Double].collect().forall(_ < worstKeptEn))
  }

  test("mixCorpora: every prefix holds the sources in weight proportion") {
    import spark.implicits._
    val a = (1L to 200L).map(i => (i, "a")).toDF("doc_id", "v")
    val b = (1001L to 1200L).map(i => (i, "b")).toDF("doc_id", "v")
    val mixed = Corpus.mixCorpora(Seq((a, "a", 2.0), (b, "b", 1.0)),
        "doc_id", "s1")
      .orderBy(col("mix_pos"), col("src"), col("doc_id"))
      .select("src").as[String].collect()
    // stride scheduling: in any prefix, source counts track weights ±1
    // (until a source is exhausted) — the property a sequential training
    // run needs from a mixed corpus
    var na = 0; var nb = 0
    // lazy iterator: the predicate must see the running counts, stopping
    // once a source is exhausted (the proportion only holds before that)
    mixed.iterator.takeWhile(_ => na < 200 && nb < 200).foreach { s =>
      if (s == "a") na += 1 else nb += 1
      assert(math.abs(na - 2 * nb) <= 2,
        s"prefix drifted from 2:1 at na=$na nb=$nb")
    }
    // determinism: same salt → identical order
    val again = Corpus.mixCorpora(Seq((a, "a", 2.0), (b, "b", 1.0)),
        "doc_id", "s1")
      .orderBy(col("mix_pos"), col("src"), col("doc_id"))
      .select("doc_id").as[Long].collect()
    val first = Corpus.mixCorpora(Seq((a, "a", 2.0), (b, "b", 1.0)),
        "doc_id", "s1")
      .orderBy(col("mix_pos"), col("src"), col("doc_id"))
      .select("doc_id").as[Long].collect()
    assert(again.toSeq == first.toSeq)
  }

  test("tokenBudgetGlobalFilter ≡ naive global window, on real documents") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(length(col("text")) > 0)
      // coarse length-derived score: plenty of exact TIES, so the in-bucket
      // tiebreak and tie-across-rows ordering are genuinely exercised
      .select(col("doc_id"),
        round(length(col("text")) / lit(100.0), 1).as("q"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("t"))
    val naive = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("q").desc, col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      docs.withColumn("tb", coalesce(sum(col("t")).over(w), lit(0L)))
        .where(col("tb") < 20000L).drop("tb")
    }
    // exactness must hold across bucket counts, including the degenerate
    // one-bucket case (everything refined by the window) and a count far
    // above the distinct-score cardinality (many empty buckets)
    for (nb <- Seq(1, 7, 1024, 100000)) {
      val fast = Corpus.tokenBudgetGlobalFilter(docs, "q", "doc_id", "t",
        budget = 20000L, nBuckets = nb)
      assert(fast.count() == naive.count(), s"nBuckets=$nb row count")
      assert(fast.select("doc_id").except(naive.select("doc_id")).isEmpty &&
        naive.select("doc_id").except(fast.select("doc_id")).isEmpty,
        s"nBuckets=$nb kept-set must match the naive global window")
    }
    // budget above the corpus total: everything kept, fast path
    assert(Corpus.tokenBudgetGlobalFilter(docs, "q", "doc_id", "t",
      budget = Long.MaxValue).count() == docs.count())
  }

  test("packSequences: offsets are contiguous per shard, packs bounded") {
    import spark.implicits._
    val chunks = Seq(
      // (shard, doc, idx, tokens)
      (0L, 1L, 0L, 100L), (0L, 1L, 1L, 100L), (0L, 2L, 0L, 100L),
      (1L, 3L, 0L, 250L), (1L, 4L, 0L, 10L))
      .toDF("shard", "doc_id", "chunk_idx", "chunk_tokens")
    val packed = Corpus.packSequences(chunks, "shard",
      Seq("doc_id", "chunk_idx"), "chunk_tokens", budget = 256)
    val rows = packed.orderBy("shard", "doc_id", "chunk_idx")
      .select("shard", "pack_offset", "pack_id", "pack_id_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // shard 0: offsets 0,100,200; chunk at 200 (100 toks) crosses the
    // 256 boundary → pack 0 → 1
    assert(rows.filter(_._1 == 0L).map(_._2).toSeq == Seq(0L, 100L, 200L))
    assert(rows.filter(_._1 == 0L).map(r => (r._3, r._4)).toSeq ==
      Seq((0L, 0L), (0L, 0L), (0L, 1L)))
    // shard 1: independent numbering restarts at 0
    assert(rows.filter(_._1 == 1L).map(_._2).toSeq == Seq(0L, 250L))
    assert(rows.filter(_._1 == 1L).map(r => (r._3, r._4)).toSeq ==
      Seq((0L, 0L), (0L, 1L)))
  }

  test("wordNgrams guards the descending-sequence edge below n tokens") {
    import spark.implicits._
    val df = Seq("one two", "a b c d").toDF("text")
      .select(split(col("text"), " ").as("toks"))
      .select(graft.functions.TextFunctions.wordNgrams(col("toks"), 3).as("tg"))
    val got = df.collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(Nil, List("a b c", "b c d")))
  }

  test("contaminationCheck flags planted copies and clears disjoint docs") {
    import spark.implicits._
    val evalSet = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (1001L, "pack my box with five dozen liquor jugs tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // verbatim copy of an eval doc → overlap 1.0
      (1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      // partial copy (shares a long phrase)
      (2L, "note: the quick brown fox jumps over nothing today"),
      // disjoint character material
      (3L, "zzzz xxxx qqqq wwww kkkk vvvv uuuu 0123 4567 89ab"))
      .toDF("doc_id", "text")
    val hits = Corpus.contaminationCheck(corpus, evalSet, "doc_id", "text",
        shingleK = 8, minOverlap = 0.3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(hits(1L) == 1.0)
    assert(hits.contains(2L) && hits(2L) < 1.0)
    assert(!hits.contains(3L))
  }

  test("tokenizeToIds: ids by frequency rank, OOV=0, order preserved") {
    import spark.implicits._
    val d = Seq(
      (1L, "b b b a a c"),   // freq: b=3+1, a=2+1, c=1  (doc 2 adds b, a)
      (2L, "a b zz")          // zz falls out of a vocab of 2
    ).toDF("doc_id", "text")
    val out = Corpus.tokenizeToIds(d, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // vocab: b(4)->1, a(3)->2; c and zz OOV
    assert(out == Seq(
      (1L, 6L, 1L, "1,1,1,2,2,0"),
      (2L, 3L, 1L, "2,1,0")))
  }

  test("tokenizeToIds vocab rank ties break on the token, not hash order") {
    import spark.implicits._
    val d = Seq((1L, "x y"), (2L, "y x")).toDF("doc_id", "text")
    val out = Corpus.tokenizeToIds(d, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    // equal freq: 'x' < 'y' lexically -> x=1, y=2
    assert(out == Seq((1L, 2L, 0L, "1,2"), (2L, 2L, 0L, "2,1")))
  }

  test("contamination corpus scan stays broadcast (no shuffle of eval join)") {
    val evalSet = docs.where(col("doc_id") % 10 === 0)
    val corpus = docs.where(col("doc_id") % 10 =!= 0)
    val plan = Corpus.contaminationCheck(corpus, evalSet, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join in plan:\n$plan")
  }

  test("cmsHeavyHitters: estimates never undercount, stay within eps*N") {
    val toks = docs.select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .where(length(col("token")) > 0)
    val out = Corpus.cmsHeavyHitters(toks, "token", k = 30).collect()
    assert(out.length == 30)
    assert(out.forall(_.getBoolean(2)), "CMS bound violated on a heavy hitter")
    // exact top-1 must agree with a plain groupBy
    val exactTop = toks.groupBy("token").count()
      .orderBy(col("count").desc, col("token")).head()
    val mine = out.head // operator emits (freq desc, token) order
    assert(mine.getString(0) == exactTop.getString(0) &&
      mine.getLong(1) == exactTop.getLong(1))
  }

  test("weightedSample: exact k, deterministic, weight-proportional, no global sort") {
    import spark.implicits._
    // 400 rows, half weight 20 / half weight 1 — the heavy half must
    // dominate a k=100 draw (P[heavy underrepresented] is astronomically
    // small, and the draw is hash-deterministic anyway, so no flake)
    val rows = (1 to 400).map(i =>
      (i.toLong, if (i % 2 == 0) 20.0 else 1.0)).toDF("id", "w")
    val got = Corpus.weightedSample(rows, "id", col("w"), 100, "s1")
    val ids = got.select("id").as[Long].collect()
    assert(ids.length == 100 && ids.distinct.length == 100)
    val heavy = ids.count(_ % 2 == 0)
    assert(heavy > 75, s"heavy half won only $heavy/100 slots")
    // identical salt → identical draw; different salt → different draw
    val again = Corpus.weightedSample(rows, "id", col("w"), 100, "s1")
      .select("id").as[Long].collect()
    assert(ids.sorted.toSeq == again.sorted.toSeq)
    val other = Corpus.weightedSample(rows, "id", col("w"), 100, "s2")
      .select("id").as[Long].collect()
    assert(ids.sorted.toSeq != other.sorted.toSeq)
    // the scale pin: top-k must plan as TakeOrderedAndProject
    // (per-partition heaps + one k-row merge), never Sort + Limit over a
    // global exchange
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in plan:\n$plan")
  }
  test("temperatureRebalance: low-resource groups retain a higher fraction") {
    val d = docs
    val out = Corpus.temperatureRebalance(d, "doc_id", "lang", "t1", 300)
    val before = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // targets are capped at group size and sum to ~the budget
    after.foreach { case (g, n) => assert(n <= before(g)) }
    val kept = after.values.sum
    assert(math.abs(kept - math.min(300L, d.count())) <= before.size,
      s"kept $kept vs budget 300 (rounding slack <= #groups)")
    // temperature < 1: retention fraction is monotone DECREASING in group
    // size (strictly, modulo caps) — the rebalancing property itself
    val fracs = before.toSeq.sortBy(_._2).map { case (g, n) =>
      after.getOrElse(g, 0L).toDouble / n }
    fracs.sliding(2).foreach { case Seq(small, large) =>
      assert(small >= large - 1e-9,
        s"smaller group must keep a no-smaller fraction: $fracs")
    case _ => }

    // deterministic + prefix-stable: the kept set is each group's salted
    // shuffle prefix, so a rerun is identical
    val again = Corpus.temperatureRebalance(d, "doc_id", "lang", "t1", 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("temperatureRebalance: a Long-range budget does not overflow the " +
      "target arithmetic (decimal path)") {
    // 2·T·wq would overflow Long for T near Long.MaxValue; the decimal
    // arithmetic must instead cap every target at the group size and keep
    // everything
    val d = docs
    val total = d.count()
    val out = Corpus.temperatureRebalance(
      d, "doc_id", "lang", "t1", Long.MaxValue / 2)
    assert(out.count() == total,
      "an over-budget rebalance must retain every document, not overflow " +
        "to negative targets")
  }
}
