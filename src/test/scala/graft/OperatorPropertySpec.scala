package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, FuzzyJoin}

/** Property tests for the operators whose correctness arguments are the
  * subtlest: the two-phase-histogram global token budget (must equal the
  * naive global window for ANY score/token distribution, tie pattern,
  * budget, and bucket count) and the deletion-neighborhood fuzzy join
  * (must equal the naive levenshtein join for ANY string population —
  * including the short/empty/duplicate strings hand fixtures miss).
  */
class OperatorPropertySpec extends SparkSpec {
  import spark.implicits._

  // ---- global token budget ≡ naive greedy prefix -------------------------

  private val budgetRowsGen: Gen[List[(Long, Double, Long)]] =
    Gen.choose(1, 60).flatMap { n =>
      Gen.listOfN(n, for {
        // coarse score grid → many exact ties, the hard case for bucketing
        s <- Gen.choose(0, 8)
        t <- Gen.choose(1L, 50L)
      } yield (s / 4.0, t))
    }.map(_.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) })

  private def naiveBudget(rows: Seq[(Long, Double, Long)],
      budget: Long): Set[Long] = {
    var cum = 0L
    rows.sortBy { case (id, s, _) => (-s, id) }.flatMap { case (id, _, t) =>
      val keep = cum < budget
      cum += t
      if (keep) Some(id) else None
    }.toSet
  }

  test("tokenBudgetGlobalFilter equals the naive greedy prefix on random corpora") {
    val prop = Prop.forAll(budgetRowsGen, Gen.choose(1L, 400L),
      Gen.oneOf(1, 2, 5, 64)) { (rows, budget, nBuckets) =>
      val df = rows.toDF("id", "score", "tokens")
      val got = Corpus.tokenBudgetGlobalFilter(df, "score", "id", "tokens",
        budget, nBuckets).select("id").as[Long].collect().toSet
      got == naiveBudget(rows, budget)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- deletion-neighborhood join ≡ naive levenshtein --------------------

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // tiny alphabet + short strings → dense near-collisions on purpose
  private val stringsGen: Gen[List[String]] =
    Gen.choose(2, 25).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 6).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString))))

  test("editDistancePairs(d) equals the naive levenshtein join for d in {1, 2}") {
    val prop = Prop.forAll(stringsGen, Gen.oneOf(1, 2)) { (strs, d) =>
      val rows = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val naive = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib && lev(sa, sb) <= d
      } yield (ia, ib)).toSet
      val df = rows.toDF("id", "s")
      val got = FuzzyJoin.editDistancePairs(df, "id", "s", maxDist = d)
        .select("id_a", "id_b").as[(Long, Long)].collect()
        .map { case (a, b) => (a, b) }.toSet
      got == naive
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- duplicateSpans ≡ naive reference ----------------------------------

  /** Tiny-vocabulary docs force gram collisions, overlapping islands, and
    * within-doc repetition — the structural cases for the span miner. */
  private val spanDocsGen: Gen[List[(Long, String)]] =
    Gen.choose(2, 8).flatMap { nDocs =>
      Gen.listOfN(nDocs, Gen.choose(0, 30).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
          .map(_.mkString(" "))))
    }.map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def naiveSpans(docs: Seq[(Long, String)],
      k: Int): Set[(Long, Long, Long, Long)] = {
    val words = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    }.filter(_._2.nonEmpty)
    val grams = for {
      (id, w) <- words; i <- 0 to w.length - k
    } yield (id, i, w.slice(i, i + k).mkString(" "))
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val dup = grams.filter(g => counts(g._3) > 1)
    dup.groupBy(_._1).flatMap { case (id, gs) =>
      val starts = gs.map(_._2).sorted
      // islands: merge while gap <= k
      val islands = starts.foldLeft(List.empty[List[Int]]) {
        case (acc, s) => acc match {
          case cur :: rest if s - cur.head <= k => (s :: cur) :: rest
          case _ => List(s) :: acc
        }
      }
      islands.map(cur => (id, cur.min.toLong, cur.head.toLong + k - 1,
        cur.size.toLong))
    }.toSet
  }

  test("AutoBandedRangeJoin rewrite equals the naive range join for any data/bin") {
    import graft.plans.AutoBandedRangeJoin
    if (!spark.experimental.extraOptimizations.contains(AutoBandedRangeJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AutoBandedRangeJoin
    val gen = for {
      pts <- Gen.listOfN(40, Gen.choose(-50.0, 50.0))
      rng <- Gen.listOfN(12, for {
        lo <- Gen.choose(-60.0, 55.0); span <- Gen.choose(0.0, 25.0)
      } yield (lo, lo + span))
      bin <- Gen.oneOf(0.5, 3.0, 10.0, 40.0)
      strictLo <- Gen.oneOf(true, false)
      strictHi <- Gen.oneOf(true, false)
    } yield (pts, rng, bin, strictLo, strictHi)
    val prop = Prop.forAll(gen) { case (pts, rng, bin, sLo, sHi) =>
      val p = pts.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
      val r = rng.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("rid", "lo", "hi")
      val lower = if (sLo) col("x") > col("lo") else col("x") >= col("lo")
      val upper = if (sHi) col("x") < col("hi") else col("x") <= col("hi")
      val naive = p.join(r, lower && upper).select("pid", "rid")
        .collect().map(row => (row.getLong(0), row.getLong(1))).sorted.toSeq
      spark.conf.set(AutoBandedRangeJoin.BinSizeKey, bin.toString)
      try {
        val df = p.join(r, lower && upper).select("pid", "rid")
        val rewritten = df.collect()
          .map(row => (row.getLong(0), row.getLong(1))).sorted.toSeq
        val planOk = !df.queryExecution.executedPlan.toString
          .contains("BroadcastNestedLoopJoin")
        planOk && rewritten == naive
      } finally spark.conf.unset(AutoBandedRangeJoin.BinSizeKey)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("duplicateSpans equals the naive reference on random tiny-vocab corpora") {
    import graft.operators.Dedup
    val prop = Prop.forAll(spanDocsGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.duplicateSpans(df, "doc_id", "text", k = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      got == naiveSpans(docs, 3)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
