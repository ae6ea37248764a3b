package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.{TextFunctions => T}

/** Dedup operators: exact semantics, and approximate (MinHash/SimHash)
  * validated against exact baselines — recall on planted near-dups.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  test("exact dedup keeps one representative per distinct text") {
    val d = Dedup.dedupExact(docs, "doc_id", "text")
    assert(d.count() == docs.select("text").distinct().count())
    assert(d.agg(sum("n_copies")).as[Long].head() == docs.count())
  }

  test("fingerprint dedup collapses case/whitespace variants") {
    val noisy = docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id") + 100000,
        upper(concat(lit("  "), col("text")))))
    val d = Dedup.dedupExactByFingerprint(noisy, "doc_id", "text")
    assert(d.count() == docs.select("text").distinct().count())
    assert(d.agg(max("n_copies")).as[Long].head() >= 2)
  }

  test("minhash estimates approximate exact jaccard (epsilon 0.2)") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleK = 8, threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => ((a, b), j) }.toMap
    val est = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleK = 8, numPerm = 64, bands = 32, threshold = 0.3)
      .select($"id_a", $"id_b", $"est_jaccard").as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => ((a, b), j) }.toMap
    assert(exact.nonEmpty, "fixture should contain planted near-dup pairs")
    // recall: every exact pair with J>=0.5 must be found by LSH
    val missed = exact.keySet -- est.keySet
    assert(missed.isEmpty, s"LSH missed high-jaccard pairs: $missed")
    // estimates close to truth on recovered pairs
    exact.foreach { case (pair, j) =>
      est.get(pair).foreach(e => assert(math.abs(e - j) < 0.2,
        s"pair $pair est=$e truth=$j"))
    }
  }

  test("LSH big-bucket split: inert above the max bucket, keeps identical " +
      "docs paired, and every split pair still clears the threshold") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 8, 64)
      .localCheckpoint(false)
    def run(split: Int) = Dedup.minhashLshPairsFromSigs(sigs, "doc_id",
      numPerm = 64, bands = 32, threshold = 0.3, splitBucketSize = split)
      .select($"id_a", $"id_b", round($"est_jaccard", 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    val base = run(0)
    // split threshold above every bucket size → no bucket splits → same
    val inert = run(1000000)
    assert(inert == base, "oversized split threshold must be a no-op")
    // an aggressive split loses only sub-threshold-leaning candidates:
    // the exact high-jaccard pairs (the recall gate's truth set) survive —
    // identical/near-identical docs agree on EVERY band, so the stricter
    // 2-band sub-key keeps them together
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleK = 8, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val split = run(2)
    assert(exact.nonEmpty)
    val missed = exact -- split.map(p => (p._1, p._2))
    assert(missed.isEmpty,
      s"split must keep high-jaccard pairs reachable: missed $missed")
    // split output is estimate-thresholded like the unsplit mine
    assert(split.forall(_._3 >= 0.3))
  }

  test("incremental exact dedup: known fingerprints dropped, novel kept") {
    val corpus = docs.where(col("doc_id") < 25)
    // batch: one verbatim re-ingest of a corpus doc (different id), one
    // whitespace/case variant (same fingerprint), one novel doc
    val known = corpus.limit(1).select(col("text")).as[String].head()
    val batch = Seq(
      (9001L, known),
      (9002L, "  " + known.toUpperCase + " "),
      (9003L, "a genuinely novel document body zq13"))
      .toDF("doc_id", "text")
    val idx = Dedup.fingerprintIndex(corpus, "text")
    val out = Dedup.incrementalExact(batch, idx, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(9003L))
  }

  test("incremental near dedup: band-key collision drops near-copies") {
    val corpus = docs.where(col("doc_id") < 25)
    val base = corpus.limit(1).select(col("text")).as[String].head()
    val batch = Seq(
      (9001L, base + " tail edit"),              // near-dup of corpus doc
      (9003L, "qq ww ee rr tt yy uu ii oo pp " * 5)) // novel
      .toDF("doc_id", "text")
    val corpusIdx = Dedup.bandKeyIndex(
      Dedup.minhashSignatures(corpus, "doc_id", "text", 8, 64),
      "doc_id", 64, 32)
    val batchSigs = Dedup.minhashSignatures(batch, "doc_id", "text", 8, 64)
    val survivors = Dedup.incrementalNear(batchSigs, corpusIdx,
      "doc_id", 64, 32).select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(9003L))
  }

  test("bandKeys rejects non-dividing band counts") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 8, 64)
    intercept[IllegalArgumentException] {
      Dedup.bandKeys(sigs, "doc_id", numPerm = 64, bands = 48)
    }
    intercept[IllegalArgumentException] {
      Dedup.bandKeys(sigs, "doc_id", numPerm = 64, bands = 100)
    }
  }

  test("simhash bucket cap keeps planted pairs reachable via the min id") {
    // every doc in an over-full bucket still pairs with the bucket's lowest
    // ids (sorted keep-lowest cap) — the documented contract
    val pairsCapped = Dedup.simhashPairs(docs, "doc_id", "text",
      maxHamming = 3, maxBucketSize = 4)
    val pairsFull = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
    import spark.implicits._
    val capped = pairsCapped.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val full = pairsFull.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(full))
    // pairs involving the global minimum doc id of any full bucket survive
    assert(full.isEmpty || capped.nonEmpty)
  }

  test("governed containment: cap choice matches a manual replay of the " +
      "ladder rule, output equals the fixed-cap mine at that cap, and an " +
      "ample budget keeps the ladder head") {
    import spark.implicits._
    val hashed = Dedup.gramHashes(docs, "doc_id", "text", shingleK = 8)
      .localCheckpoint(false)
    val dfTab = hashed.select(explode($"hs0").as("g"))
      .groupBy($"g").agg(count(lit(1)).as("df")).localCheckpoint(false)
    val nDocs = hashed.count()
    val ladder = Seq(256, 128, 64, 32, 16, 8)
    val dfs = dfTab.select($"df").as[Long].collect()
    def est(cap: Int): Long =
      dfs.filter(_ <= cap).map(d => d * (d - 1) / 2).sum
    val budget = 2048L * nDocs
    val expectedCap = ladder.find(est(_) <= budget).getOrElse(ladder.last)
    val (pairs, cap) = Dedup.containmentPairsGoverned(hashed, 0.5,
      gramDf = Some(dfTab))
    assert(cap == expectedCap, s"ladder rule: got $cap, manual $expectedCap")
    val fixed = Dedup.containmentPairsFromHashes(hashed, 0.5,
      maxDocFreq = cap)
      .select($"id_a", $"id_b", round($"containment", 9).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    val gov = pairs
      .select($"id_a", $"id_b", round($"containment", 9).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    assert(gov == fixed, "governed must equal the fixed mine at chosen cap")
    // the operator DEFAULT (no cap passed) routes to the governed mine
    // (round 12 — PPJoin's r9 governed-by-default posture)
    val dflt = Dedup.containmentPairsFromHashes(hashed, 0.5)
      .select($"id_a", $"id_b", round($"containment", 9).as("c"))
      .as[(Long, Long, Double)].collect().toSet
    assert(dflt == gov, "default containment mine must be the governed one")
    // the rule must actually bite on this template-dense fixture: the
    // chosen cap is below the ladder head
    assert(cap < ladder.head, s"fixture should trip the budget, cap=$cap")
    // an effectively unlimited budget keeps the head
    val (_, capBig) = Dedup.containmentPairsGoverned(hashed, 0.5,
      expansionBudgetPerDoc = Long.MaxValue / math.max(nDocs, 1),
      gramDf = Some(dfTab))
    assert(capBig == ladder.head)
  }

  test("blind-empty guard: an empty governed mine over a dominant over-cap " +
      "gram mass fails loudly; opting out returns the coverage profile " +
      "(r14 verdict item 4)") {
    import spark.implicits._
    // template-cluster cliff corpus: every doc = one long shared template
    // (its grams' df = nDocs, far over the forced cap) + a short unique
    // suffix (df = 1, under the cap but shared by nothing) — the capped
    // mine structurally cannot witness ANY pair, while the dominant gram
    // mass rides the template
    val template = (1 to 40).map(i => s"tmplword$i").mkString(" ")
    val cliff = (1L to 24L).map(i => (i, s"$template uniq${i}tail"))
      .toDF("doc_id", "text")
    val hashed = Dedup.gramHashes(cliff, "doc_id", "text", shingleK = 8)
      .localCheckpoint(false)
    // force the over-cap shape regardless of the expansion budget: a
    // one-rung ladder below the cluster size
    val ex = intercept[IllegalStateException] {
      Dedup.containmentPairsGovernedDetailed(hashed, 0.5,
        capLadder = Seq(8))._1.count()
    }
    assert(ex.getMessage.contains("gram mass") &&
      ex.getMessage.contains("minhashLshPairs"),
      s"guard message must carry the coverage numbers and the LSH advice: " +
        ex.getMessage)
    // opting out: the empty result comes back WITH its blindness profile
    val (pairs, cov) = Dedup.containmentPairsGovernedDetailed(hashed, 0.5,
      capLadder = Seq(8), blindEmptyGuard = None)
    assert(pairs.isEmpty, "the capped mine must be blind on this corpus")
    assert(cov.chosenCap == 8)
    assert(cov.droppedGramMass > 0.9,
      s"template mass must dominate: ${cov.describe}")
    assert(cov.gramsOverCap > 0)
    // a NON-empty governed result never throws — the guard targets only
    // the empty-indistinguishable-from-clean shape: a benign corpus whose
    // near-dup pair shares RARE (df=2) grams mines fine under the guard
    val benign = (Seq((100L, (1 to 30).map(i => s"rarepair$i").mkString(" ")),
      (101L, (1 to 30).map(i => s"rarepair$i").mkString(" ") + " tailbit")) ++
      (1L to 8L).map(i => (i, (1 to 20).map(j => s"solo${i}w$j")
        .mkString(" ")))).toDF("doc_id", "text")
    val hashedBenign = Dedup.gramHashes(benign, "doc_id", "text",
      shingleK = 8).localCheckpoint(false)
    val (benignPairs, benignCov) =
      Dedup.containmentPairsGovernedDetailed(hashedBenign, 0.5,
        capLadder = Seq(8))
    assert(!benignPairs.isEmpty,
      "fixture drift: the planted rare-gram pair must be mined")
    assert(benignCov.chosenCap == 8)
    // MinHash-LSH — the advice the guard gives — DOES witness the planted
    // clusters on exactly this corpus
    assert(Dedup.minhashLshPairs(cliff, "doc_id", "text", shingleK = 8,
      numPerm = 64, bands = 16, threshold = 0.5).count() > 0,
      "LSH must find the template-cluster pairs the capped mine cannot")
    // same guard on the prefix mine's df-capped fallback
    val ex2 = intercept[IllegalStateException] {
      Dedup.prefixFilterPairs(cliff, "doc_id", "text", shingleK = 8,
        threshold = 0.5, maxCandidatePairs = Some(1L),
        fallbackToCapped = true, fallbackDocFreqCap = 8).count()
    }
    assert(ex2.getMessage.contains("df-capped mine") &&
      ex2.getMessage.contains("gram mass"))
  }

  test("truncation stats count exactly what the miners' caps clip") {
    import spark.implicits._
    // simhash: a tiny cap forces slicing; stats must agree with a direct
    // recount of chunk-bucket occupancy over the same signature table
    val sh = Dedup.simhashTable(docs, "doc_id", "text").localCheckpoint(false)
    val occ2 = Dedup.simhashChunked(sh, "doc_id", 3)
      .groupBy($"chunk", $"chunk_val").count().where($"count" > 1)
      .select($"count").as[Long].collect()
    val cap = 4
    val expectOver = occ2.count(_ > cap).toLong
    val expectDropped = occ2.filter(_ > cap).map(_ - cap).sum
    val got = Dedup.simhashTruncationStats(sh, "doc_id", 3, cap)
      .select($"n_buckets_over_cap", $"n_ids_dropped")
      .as[(Long, Long)].head()
    assert(got == ((expectOver, expectDropped)))
    assert(expectDropped > 0, "fixture must actually trip the tiny cap")
    // at the production cap nothing trips on this fixture (the pinned-0
    // oracle literals rest on this)
    val got1024 = Dedup.simhashTruncationStats(sh, "doc_id", 3, 1024)
      .select($"n_buckets_over_cap", $"n_ids_dropped")
      .as[(Long, Long)].head()
    assert(got1024 == ((0L, 0L)))
    // lsh: split counter counts pre-split buckets above the threshold,
    // and the final-bucket cap counter sees post-split occupancy
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 8, 64)
      .localCheckpoint(false)
    val noSplit = Dedup.lshTruncationStats(sigs, "doc_id", 64, 32,
      maxBucketSize = 1024, splitBucketSize = 0)
      .select($"n_buckets_split", $"n_buckets_over_cap", $"n_ids_dropped")
      .as[(Long, Long, Long)].head()
    assert(noSplit == ((0L, 0L, 0L)))
    val aggressive = Dedup.lshTruncationStats(sigs, "doc_id", 64, 32,
      maxBucketSize = 2, splitBucketSize = 2)
      .select($"n_buckets_split", $"n_buckets_over_cap", $"n_ids_dropped")
      .as[(Long, Long, Long)].head()
    assert(aggressive._1 > 0, "fixture has buckets above split=2")
  }

  test("simhash finds planted near-identical pairs via chunk blocking") {
    // plant: 3 docs + copies with one appended token (tiny simhash shift)
    val base = docs.orderBy("doc_id").limit(3).select($"doc_id", $"text")
    val mutated = base.select(($"doc_id" + 1000).as("doc_id"),
      concat($"text", lit(" zzz")).as("text"))
    val planted = base.union(mutated)
    val pairs = Dedup.simhashPairs(planted, "doc_id", "text", maxHamming = 15)
    val found = pairs.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val ids = base.select($"doc_id").as[Long].collect()
    ids.foreach { a =>
      assert(found.contains((a, a + 1000)), s"missed planted pair $a/${a + 1000}")
    }
  }

  test("simhash hamming blocking guarantee: distance <= 3 via 4 chunks") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Int)].collect()
    pairs.foreach { case (_, _, h) => assert(h <= 3) }
  }

  test("embedding near-dup is symmetric-free and respects threshold") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
      "label", 0.25)
    val rows = pairs.select($"id_a", $"id_b", $"cos")
      .as[(Long, Long, Double)].collect()
    rows.foreach { case (a, b, c) =>
      assert(a < b, "pairs must be ordered once")
      assert(c >= 0.25)
    }
  }

  test("near-dup clusters: components labeled by their minimum id") {
    // chain 1-2-3 and pair 10-11: two components
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("near-dup clusters converge on a longer chain within maxIter") {
    val chain = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.nearDupClusters(chain, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(1L))
    assert(labels.size == 9)
  }

  test("union-find fast path handles chains longer than any maxIter budget") {
    // diameter 40 ≫ maxIter=10: only correct because the small-edge-count
    // path is a full union-find, not round-capped propagation
    val chain = (1L until 41L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.nearDupClusters(chain, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(1L))
    assert(labels.size == 41)
  }

  test("distributed propagation path matches the union-find path") {
    val pairs = Seq((5L, 9L), (9L, 2L), (30L, 31L), (7L, 5L), (40L, 41L),
      (41L, 42L), (42L, 40L)).toDF("id_a", "id_b")
    val local = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.nearDupClusters(pairs, localEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    assert(local(9L) == 2L && local(7L) == 2L && local(31L) == 30L
      && local(42L) == 40L)
  }

  test("corpus chunk dedup keeps first occurrence, reassembles in order") {
    // w=2 chunks: doc 1 = ["a b","c d","e f"]; doc 2 repeats "c d" (dropped)
    // and repeats it AGAIN in-doc (also dropped); doc 3 has its own chunk
    // plus doc 1's opener (dropped). Empty doc 4 is excluded entirely.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y c d c d"),
      (3L, "a b q r"),
      (4L, "   ")
    ).toDF("doc_id", "text")
    val out = Dedup.corpusChunkDedup(docs, "doc_id", "text", windowWords = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 0L, "a b c d e f"),
      (2L, 3L, 2L, "x y"),
      (3L, 2L, 1L, "q r")))
  }

  test("corpus chunk dedup: short tail chunk kept, total chunks conserved") {
    val docs = Seq((1L, "a b c"), (2L, "c")).toDF("doc_id", "text")
    // doc 1 => ["a b", "c"]; doc 2 => ["c"] (dup of doc 1's tail)
    val out = Dedup.corpusChunkDedup(docs, "doc_id", "text", windowWords = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq((1L, 2L, 0L, "a b c"), (2L, 1L, 1L, "")))
  }

  test("shingles are distinct, k-length, from canonical text") {
    val g = docs.limit(5).select(T.shingles($"text", 8).as("g"))
      .as[Seq[String]].collect()
    g.foreach { gs =>
      assert(gs.distinct.size == gs.size)
      assert(gs.forall(_.length <= 8))
    }
  }

  test("duplicateSpans finds unaligned copied spans and merges islands") {
    // 12 copied words pasted at word offset 3 of doc B (unaligned with any
    // stride-8 chunk boundary) — corpusChunkDedup's blind spot, this
    // operator's reason to exist. Surrounding text is unique per doc.
    def uniq(tag: String, n: Int): String =
      (0 until n).map(i => s"${tag}w$i").mkString(" ")
    val copied = (0 until 12).map(i => s"copy$i").mkString(" ")
    val a = s"${uniq("a", 10)} $copied ${uniq("z", 10)}"
    val b = s"${uniq("b", 3)} $copied ${uniq("y", 15)}"
    val c = uniq("c", 30) // no duplicated grams
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", k = 8)
      .orderBy("doc_id", "span_start").collect()
    // one maximal span per carrier doc: words 10..21 in A, 3..14 in B
    assert(spans.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val sa = spans(0); val sb = spans(1)
    assert(sa.getLong(1) == 10 && sa.getLong(2) == 21)
    assert(sb.getLong(1) == 3 && sb.getLong(2) == 14)
    // 12-word copy, k=8 => 5 duplicated gram starts each
    assert(sa.getLong(3) == 5 && sb.getLong(3) == 5)
    // within-doc repetition also counts as duplication
    val rep = Seq((9L, ("loop " * 40).trim + " " + uniq("t", 5)))
      .toDF("doc_id", "text")
    val repSpans = Dedup.duplicateSpans(rep, "doc_id", "text", k = 8).collect()
    assert(repSpans.length == 1 && repSpans.head.getLong(1) == 0)
  }

  test("duplicateSpans confirmGramText: exact text equality, same result here") {
    // The confirm path counts occurrences on (hash, gram TEXT), so a 64-bit
    // collision can never mark distinct grams as duplicates. On collision-
    // free input it must be plan-for-plan equivalent in RESULT to the
    // hash-only default — that equivalence is the spec; the safety margin
    // is the partition key, pinned below.
    def uniq(tag: String, n: Int): String =
      (0 until n).map(i => s"${tag}w$i").mkString(" ")
    val copied = (0 until 12).map(i => s"copy$i").mkString(" ")
    val df = Seq(
      (1L, s"${uniq("a", 10)} $copied ${uniq("z", 10)}"),
      (2L, s"${uniq("b", 3)} $copied ${uniq("y", 15)}"),
      (3L, uniq("c", 30))).toDF("doc_id", "text")
    val plain = Dedup.duplicateSpans(df, "doc_id", "text", k = 8)
      .orderBy("doc_id", "span_start").collect().toSeq
    val confirmed = Dedup
      .duplicateSpans(df, "doc_id", "text", k = 8, confirmGramText = true)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(confirmed == plain && confirmed.nonEmpty)
    // pin that the confirm path really windows on the gram text (not just
    // the hash): its analyzed plan must reference a `gram` attribute
    val lp = Dedup
      .duplicateSpans(df, "doc_id", "text", k = 8, confirmGramText = true)
      .queryExecution.analyzed.toString
    assert(lp.contains("gram"))
  }

  test("prefixFilterPairs ≡ uncapped exact mine (lossless prefix filter)") {
    // the differential that proves the prefix filter drops no pair: the
    // quadratic uncapped mine is ground truth at every threshold tried
    def canon(df: org.apache.spark.sql.DataFrame, jCol: String) =
      df.select($"id_a", $"id_b", round(col(jCol), 9).as("j"))
        .as[(Long, Long, Double)].collect().toSet
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val exact = canon(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleK = 8, threshold = t), "jaccard")
      // UnlimitedPairs: this differential tests the LOSSLESS path itself
      val pp = canon(Dedup.prefixFilterPairs(docs, "doc_id", "text",
        shingleK = 8, threshold = t,
        maxCandidatePairs = Some(Dedup.UnlimitedPairs)), "jaccard")
      assert(pp == exact, s"t=$t: ppjoin=${pp.size} exact=${exact.size}")
    }
  }

  test("prefixFilterPairs guardrail: pre-flight estimate aborts or falls " +
      "back to the df-capped mine; inert when the budget covers the work") {
    // abort: a 1-pair budget cannot cover the fixture corpus
    val ex = intercept[IllegalStateException] {
      Dedup.prefixFilterPairs(docs, "doc_id", "text", shingleK = 8,
        threshold = 0.7, maxCandidatePairs = Some(1L))
    }
    assert(ex.getMessage.contains("candidate pairs") &&
      ex.getMessage.contains("maxCandidatePairs=1"))
    // fallback: the df-capped mine at the same threshold, exactly
    val fb = Dedup.prefixFilterPairs(docs, "doc_id", "text", shingleK = 8,
      threshold = 0.7, maxCandidatePairs = Some(1L),
      fallbackToCapped = true)
      .select($"id_a", $"id_b", round($"jaccard", 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    val capped = Dedup.ngramJaccardPairsFromHashes(
      Dedup.gramHashes(docs, "doc_id", "text", 8).localCheckpoint(false),
      threshold = 0.7, maxDocFreq = 256)
      .select($"id_a", $"id_b", round($"jaccard", 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(fb == capped, "fallback must be the df-capped mine's result")
    // inert: a FINITE budget above the estimate (the pre-flight runs and
    // passes) yields exactly the lossless result — same as the explicit
    // unlimited opt-in, which skips the pre-flight entirely
    val guarded = Dedup.prefixFilterPairs(docs, "doc_id", "text",
      shingleK = 8, threshold = 0.7,
      maxCandidatePairs = Some(10000000L))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val unlimited = Dedup.prefixFilterPairs(docs, "doc_id", "text",
      shingleK = 8, threshold = 0.7,
      maxCandidatePairs = Some(Dedup.UnlimitedPairs))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(guarded == unlimited)
    // the DEFAULT (no arguments) on this 500-doc template-heavy fixture
    // (estimate ~241k > 64·500) trips the derived budget — the governed
    // default refuses the quadratic path even at test scale
    intercept[IllegalStateException] {
      Dedup.prefixFilterPairs(docs, "doc_id", "text",
        shingleK = 8, threshold = 0.7).count()
    }
  }

  test("prefixFilterPairs default budget: derived 64·|docs| aborts on a " +
      "template-heavy corpus; UnlimitedPairs is the explicit opt-in") {
    // 200 near-identical docs: every prefix gram is shared corpus-wide, so
    // the estimate is Θ(n²) ≈ 280k — far over the derived 64·200 = 12800.
    // The engine's own 100 TB advice must fire with NO arguments set.
    val templated = spark.range(200)
      .select(col("id").as("doc_id"),
        concat(lit("the quarterly compliance report was filed on time by "),
          lit("department one under section "),
          (col("id") % 3).cast("string")).as("text"))
    val ex = intercept[IllegalStateException] {
      Dedup.prefixFilterPairs(templated, "doc_id", "text", shingleK = 8,
        threshold = 0.7)
    }
    assert(ex.getMessage.contains("default: 64 per doc"),
      s"abort must name the derived default budget: ${ex.getMessage}")
    // same call with the fallback flag: the corpus-linear capped mine runs
    val fb = Dedup.prefixFilterPairs(templated, "doc_id", "text",
      shingleK = 8, threshold = 0.7, fallbackToCapped = true)
      .select($"id_a", $"id_b", round($"jaccard", 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    val capped = Dedup.ngramJaccardPairsFromHashes(
      Dedup.gramHashes(templated, "doc_id", "text", 8).localCheckpoint(false),
      threshold = 0.7, maxDocFreq = 256)
      .select($"id_a", $"id_b", round($"jaccard", 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(fb == capped && fb.nonEmpty)
    // the explicit sentinel accepts the quadratic path and stays lossless
    val unlimited = Dedup.prefixFilterPairs(templated, "doc_id", "text",
      shingleK = 8, threshold = 0.7,
      maxCandidatePairs = Some(Dedup.UnlimitedPairs))
      .select($"id_a", $"id_b", round($"jaccard", 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(templated, "doc_id", "text",
      shingleK = 8, threshold = 0.7)
      .select($"id_a", $"id_b", round($"jaccard", 9).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(unlimited == exact)
  }

  test("prefixFilterPairs estimate brackets the real candidate workload") {
    // the estimate is Σ c·(c−1)/2 over prefix-gram occupancies — a strict
    // upper bound on the candidate join's (length-filtered) output; on the
    // fixture it must also stay within ~2× (the estimate is an attribution,
    // not a worst-case fiction)
    val threshold = 0.7
    val g = Dedup.gramHashes(docs, "doc_id", "text", 8)
      .select(col("id"), explode($"hs0").as("g"))
    val withDf = g.join(g.groupBy($"g").agg(count(lit(1)).as("df")), "g")
    val sorted = withDf.groupBy($"id")
      .agg(sort_array(collect_list(struct($"df", $"g"))).as("sg"))
      .select($"id", transform($"sg", _.getField("g")).as("gs"),
        size($"sg").as("n"))
      .localCheckpoint(false)
    val prefix = sorted.select($"id", $"n",
      posexplode(slice($"gs", lit(1),
        greatest($"n" - ceil($"n" * threshold).cast("int") + 1,
          lit(1)))).as(Seq("p", "g")))
      .localCheckpoint(false)
    val est = prefix.groupBy($"g").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(($"c" * ($"c" - 1) / 2).cast("long")), lit(0L)))
      .head().getLong(0)
    val t = lit(threshold)
    val actual = prefix.as("a").join(prefix.as("b"),
      col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
        col("a.n") * t <= col("b.n") && col("b.n") * t <= col("a.n"))
      .count()
    assert(actual <= est, s"estimate $est must upper-bound actual $actual")
    assert(est <= 2 * math.max(actual, 1L),
      s"estimate $est should stay within 2x of actual $actual")
  }

  test("prefixFilterPairs edges: identical docs at t=1.0; no self/dup pairs") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "an entirely different document body with other words in it"),
      (4L, "THE QUICK  brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    // canonicalization folds case/whitespace: 1,2,4 are identical gram sets
    val pairs = Dedup.prefixFilterPairs(df, "doc_id", "text",
      shingleK = 8, threshold = 1.0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    // every pair canonical (a < b) and emitted once
    val all = Dedup.prefixFilterPairs(docs, "doc_id", "text",
      shingleK = 8, threshold = 0.7,
      maxCandidatePairs = Some(Dedup.UnlimitedPairs))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(all.forall { case (a, b) => a < b })
    assert(all.distinct.size == all.size)
  }
}
