package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions.{TextFunctions => T}

/** Corpus-curation operators for the training-data pipeline surface: the
  * steps that turn a deduplicated, quality-scored document pool into an
  * actual training corpus — deterministic splits, deterministic shuffle,
  * quantile-based quality filtering, per-domain caps, and benchmark
  * contamination checks.
  *
  * All assignment logic is content-hash-based (md5 over a salted key), never
  * RNG-based: reruns are idempotent, assignment survives repartitioning, and
  * every operator is exactly reproducible in an external engine for the
  * oracle gate. Scale notes per operator below.
  */
object Corpus {

  /** Salted md5 hex of a row key — the deterministic randomness source shared
    * by [[splitAssign]] and [[globalShuffle]]. Pure map-side, codegen'd.
    */
  def saltedHash(idCol: Column, salt: String): Column =
    md5(concat(lit(salt), idCol.cast("string")))

  /** Deterministic train/val/test (or arbitrary) split assignment.
    *
    * The first 4 hex chars of the salted hash are compared lexicographically
    * against cumulative-weight boundaries rendered as 4-digit hex — for
    * equal-length lowercase hex, lexicographic order IS numeric order, so the
    * comparison needs no hex→int conversion and reproduces identically in any
    * engine with md5 (the oracle gate compares against DuckDB `CASE` over the
    * same substrings).
    *
    * Scale: a single projection — no shuffle, no state; 100 TB assignment is
    * a map over the scan. Changing `salt` re-rolls every assignment;
    * adding documents never moves existing ones between splits.
    */
  def splitAssign(df: DataFrame, idCol: String, salt: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val bucket = substring(saltedHash(col(idCol), salt), 1, 4)
    // Cumulative upper boundaries rendered by hexBoundary — which also
    // guards cum >= 1.0 (a zero-weight tail split would otherwise produce
    // the 5-char "10000", lexicographically BELOW most 4-char buckets).
    val bounds = splits.init.scanLeft(0.0)(_ + _._2).tail.map(hexBoundary)
    val assigned = splits.init.zip(bounds).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (els, ((name, _), b)) => when(bucket < b, lit(name)).otherwise(els)
      }
    df.withColumn("split", assigned)
  }

  /** Hex boundary for a cumulative weight — exposed so oracle SQL can pin the
    * exact same constants. A weight of 1.0 would render "10000" (5 chars),
    * which sorts BELOW 4-char buckets starting ≥ '2' — return "g" instead,
    * which is lexicographically above every 4-char hex string.
    */
  def hexBoundary(cum: Double): String =
    if (cum >= 1.0) "g" else f"${math.floor(cum * 65536).toLong}%04x"

  /** Deterministic global shuffle: orders the corpus by salted hash (id as
    * tiebreak against the ~2^-64 collision) and assigns a contiguous 0-based
    * position — the "shuffle once, read sequentially" layout every training
    * run wants.
    *
    * Scale: `repartitionByRange` samples the key space and range-partitions
    * (one shuffle — unavoidable for a global permutation), sorts within
    * partitions, then `zipWithIndex` assigns contiguous indices with one
    * lightweight per-partition count job (the classic distributed zip — no
    * window-over-everything, which would funnel 100 TB through ONE task).
    * The RDD hop is deliberate: it is the only codegen break in the operator
    * and buys a truly distributed contiguous index.
    */
  def globalShuffle(df: DataFrame, idCol: String, salt: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val key = "_shuffle_key"
    val sorted = df
      .withColumn(key, saltedHash(col(idCol), salt))
      .repartitionByRange(parts, col(key), col(idCol))
      .sortWithinPartitions(col(key), col(idCol))
    val schema = sorted.schema.add("pos", LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema).drop(key)
  }

  /** Exact quality-quantile filter: keep rows whose `percent_rank` of
    * `scoreCol` within each `byCol` group is ≥ `minRank` (e.g. 0.5 keeps the
    * top half per language). Rank ties are broken by `tieCol` so the result
    * is fully deterministic and engine-reproducible.
    *
    * Scale: one shuffle on `byCol` + per-group sort. Group skew (`en` is most
    * of a web corpus) concentrates sort work; at 100 TB prefer
    * [[qualityThresholdFilter]], which reduces the corpus to a handful of
    * per-group thresholds and filters map-side.
    */
  def qualityQuantileFilter(df: DataFrame, scoreCol: String, byCol: String,
      tieCol: String, minRank: Double): DataFrame = {
    val w = Window.partitionBy(col(byCol)).orderBy(col(scoreCol), col(tieCol))
    df.withColumn("pct_rank", round(percent_rank().over(w), 6))
      .where(col("pct_rank") >= minRank)
  }

  /** Approximate-threshold form of the quality filter: one pass computes a
    * per-group `percentile_approx` threshold (mergeable sketch — map-side
    * partials, tiny shuffle), the thresholds broadcast-join back, and the
    * filter itself is map-side. The 100 TB path: the full corpus is never
    * sorted, only scanned twice (or once, if thresholds are precomputed).
    */
  def qualityThresholdFilter(df: DataFrame, scoreCol: String, byCol: String,
      quantile: Double, accuracy: Int = 10000): DataFrame = {
    val thresholds = df.groupBy(col(byCol))
      .agg(percentile_approx(col(scoreCol), lit(quantile), lit(accuracy))
        .as("_thr"))
    df.join(broadcast(thresholds), byCol)
      .where(col(scoreCol) >= col("_thr"))
      .drop("_thr")
  }

  /** Per-domain document cap: keep at most `cap` rows per `domainCol`, best
    * first by (`scoreCol` desc, `tieCol` asc) — the anti-monoculture step
    * that stops one crawl domain from dominating the corpus.
    *
    * Scale: expressed as `row_number() ≤ cap`, which Spark's
    * `WindowGroupLimit` rewrite turns into a per-map-partition top-`cap`
    * before the shuffle — each task forwards at most `cap` rows per domain
    * instead of the domain's full membership (pinned in PlanAuditSpec).
    */
  def domainCap(df: DataFrame, domainCol: String, scoreCol: String,
      tieCol: String, cap: Int): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(scoreCol).desc, col(tieCol))
    df.withColumn("rn", row_number().over(w)).where(col("rn") <= cap)
  }

  /** Deterministic stratified sampling: keep a per-group fraction of rows by
    * comparing the salted hash against each group's rate boundary (the
    * rebalancing step that up/down-weights languages or domains without an
    * RNG). `rates` maps group value → keep fraction; groups not listed keep
    * `defaultRate`.
    *
    * Scale: pure map-side filter — the rate table is a literal CASE, the
    * hash is per-row; no shuffle, no state, reruns keep the identical rows.
    */
  def stratifiedSample(df: DataFrame, idCol: String, groupCol: String,
      salt: String, rates: Map[String, Double],
      defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val bucket = substring(saltedHash(col(idCol), salt), 1, 4)
    val bound = rates.foldLeft(lit(hexBoundary(defaultRate)): Column) {
      case (els, (g, r)) => when(col(groupCol) === g, lit(hexBoundary(r))).otherwise(els)
    }
    df.where(bucket < bound)
  }

  /** Weighted sample without replacement (Efraimidis–Spirakis A-ES): each
    * row draws a deterministic uniform u ∈ (0,1) from its salted hash and
    * competes on the key ln(u)/w — monotone in the classic u^(1/w), so the
    * k largest keys are a draw where row i's inclusion odds are
    * proportional to its weight (sample by token count, by quality score,
    * by domain boost). Hash-based, not RNG-based: the same rows win on any
    * cluster size and the oracle gate can replay the draw exactly; the key
    * is rounded to 9 decimals for cross-engine double stability (+0.0
    * folds a -0.0 from near-zero keys — engines disagree on the sign).
    *
    * Scale: the top-k is `orderBy(...).limit(k)` — Spark plans
    * TakeOrderedAndProject: per-partition bounded heaps, then ONE merge of
    * k-row heads on the driver; no global sort, no full shuffle. 100 TB in,
    * k rows out, one pass.
    *
    * Ref: Efraimidis & Spirakis, "Weighted random sampling with a
    * reservoir" (Inf. Process. Lett. 97(5), 2006).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
      k: Int, salt: String): DataFrame = {
    require(k > 0, "k must be positive")
    // 6 hex chars = 24 uniform bits; +0.5 keeps u strictly inside (0,1)
    val u = (conv(substring(saltedHash(col(idCol), salt), 1, 6), 16, 10)
      .cast("double") + 0.5) / 16777216.0
    df.withColumn("es_key", round(log(u) / weightCol, 9) + 0.0)
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Token-budget selection: walk each group best-first and keep rows while
    * the group's cumulative token count stays under `budget` — "fill the
    * training budget with the best data, per language/domain". A row is kept
    * when the tokens BEFORE it are under budget, so the budget may overflow
    * by at most one document (the standard greedy-prefix contract).
    *
    * Scale: one window per group (same sharding story as [[packSequences]] —
    * groups select independently in parallel). A single GLOBAL budget is
    * [[tokenBudgetGlobalFilter]] — the two-phase histogram form.
    */
  def tokenBudgetFilter(df: DataFrame, groupCol: String, scoreCol: String,
      tieCol: String, tokenCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tokens_before",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .where(col("tokens_before") < budget)
  }

  /** Deterministic weighted interleave of N corpora — the training-data
    * MIXING recipe ("70% web, 20% code, 10% books"): every source is given
    * a deterministic internal order ([[globalShuffle]]'s salted-hash
    * permutation) and its k-th row takes virtual position k/weight (stride
    * scheduling), so ANY prefix of the merged order contains the sources
    * in their weight proportions (±1 per source) — which is exactly the
    * property a sequential training run needs from a mixed corpus. Output
    * carries `src`, the 1-based in-source `rk`, and the merge key
    * `mix_pos`; consumers range-partition/sort by (`mix_pos`, `src`, id)
    * to materialize the interleave.
    *
    * Scale: one range shuffle per source (the globalShuffle permutation)
    * plus a union — no cross-source shuffle at all; the final ordering is
    * the consumer's range partitioning. Deterministic: same salt → same
    * mix, appends to one source never reorder another.
    */
  def mixCorpora(sources: Seq[(DataFrame, String, Double)], idCol: String,
      salt: String): DataFrame = {
    require(sources.nonEmpty, "need at least one source")
    require(sources.forall(_._3 > 0), "weights must be positive")
    sources.map { case (df, tag, w) =>
      globalShuffle(df, idCol, salt)
        .withColumn("src", lit(tag))
        .withColumn("rk", col("pos") + 1)
        .withColumn("mix_pos", round((col("pos") + 1) / w, 6))
        .drop("pos")
    }.reduce(_.unionByName(_))
  }

  /** GLOBAL token-budget selection — exact greedy-prefix over the WHOLE
    * corpus ordered (`scoreCol` desc, `tieCol` asc), kept while the tokens
    * before a row stay under `budget` — without a global sort. Two-phase
    * histogram form:
    *
    *  1. Bucket scores into `nBuckets` equal-width bins (bucket 0 = best;
    *     binning is monotonic in score, so bucket order IS score order up to
    *     in-bucket ties) and aggregate per-bucket token sums — one map-side-
    *     partial shuffle of ≤ nBuckets rows, collected to the driver (the
    *     bounded broadcast-build idiom).
    *  2. Walk the tiny histogram to the CROSSING bucket (first whose
    *     cumulative sum reaches the budget): every better bucket is kept
    *     outright (map-side filter), every worse bucket dropped outright,
    *     and only the crossing bucket — ~1/nBuckets of the corpus — is
    *     refined with an exact running-total window, seeded with the better
    *     buckets' token sum.
    *
    * The result is bit-identical to the naive global-window form (ties
    * never straddle buckets: equal scores bin together), but the one
    * unpartitioned window runs over a single bucket instead of funneling
    * 100 TB through one task. Degenerate case: all scores equal → one
    * bucket → the window sees everything; raise `nBuckets` only spreads
    * DISTINCT scores.
    */
  def tokenBudgetGlobalFilter(df0: DataFrame, scoreCol: String, tieCol: String,
      tokenCol: String, budget: Long, nBuckets: Int = 1024): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(nBuckets > 0, "need at least one bucket")
    // unscorable rows are excluded up front: a NULL score has no place in a
    // best-first order, and a null bucket key would silently read back as
    // bucket 0 (= best) from the collected histogram row
    val df = df0.where(col(scoreCol).isNotNull && col(tokenCol).isNotNull)
    val stats = df.agg(min(col(scoreCol)).cast("double"),
      max(col(scoreCol)).cast("double"),
      sum(col(tokenCol)).cast("long")).head()
    if (stats.isNullAt(0)) return df // empty input: nothing to select
    val mx = stats.getDouble(1)
    val width = (mx - stats.getDouble(0)) / nBuckets
    if (stats.getLong(2) <= budget) return df // whole corpus fits
    val bucketOf: Column =
      if (width == 0.0) lit(0)
      else least(floor((lit(mx) - col(scoreCol).cast("double")) / width),
        lit(nBuckets - 1)).cast("int")
    val hist = df.groupBy(bucketOf.as("_b"))
      .agg(sum(col(tokenCol)).cast("long").as("_t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    var crossing = hist.last._1
    var offset = 0L
    var i = 0
    var found = false
    while (i < hist.length && !found) {
      val (b, t) = hist(i)
      if (cum + t >= budget) { crossing = b; offset = cum; found = true }
      else { cum += t; i += 1 }
    }
    val w = Window.orderBy(col(scoreCol).desc, col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boundary = df.where(bucketOf === lit(crossing))
      .withColumn("_tb", coalesce(sum(col(tokenCol)).over(w), lit(0L)) + offset)
      .where(col("_tb") < budget)
      .drop("_tb")
    df.where(bucketOf < lit(crossing)).unionByName(boundary)
  }

  /** Sequence packing: lay a chunk stream end-to-end into fixed
    * `budget`-token packs (the "concatenate and cut" layout LLM training
    * uses — chunks may straddle a pack boundary, recorded by
    * `pack_id` ≠ `pack_id_end`). Each chunk gets its exclusive running
    * token offset within its shard and the pack index of its first and last
    * token.
    *
    * Scale: packing is sequential by nature, so it is sharded — the running
    * sum is a window per `shardCol`, and shards pack independently
    * (embarrassingly parallel; size shards to a few GB so each window task
    * is bounded). A single global pack order would serialize 100 TB through
    * one task.
    */
  def packSequences(chunks: DataFrame, shardCol: String,
      orderCols: Seq[String], tokenCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .withColumn("pack_offset",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("pack_offset") / budget))
      .withColumn("pack_id_end",
        floor((col("pack_offset") + col(tokenCol) - 1) / budget))
  }

  /** Benchmark-contamination check: the fraction of each candidate document's
    * distinct k-char shingles that appear anywhere in the eval/benchmark set.
    * Returns per-document (`n_grams`, `n_shared`, `overlap`) for documents
    * sharing at least one gram at or above `minOverlap` (keep it > 0 — zero-
    * overlap docs are never emitted).
    *
    * Shape matters here: exploding a PRE-BUILT shingle array
    * (`explode(shinglesOfCanonical(...))`) lets the optimizer collapse the
    * canonicalization INTO the generator, re-running the regex once per
    * shingle position — O(len²) per document, measured 10× slower at sf0.1.
    * Instead the Generate explodes only the position sequence and the k-char
    * `substr` is taken AFTER the generator, where the canonical text is a
    * once-per-row attribute. Distinctness is restored in the aggregate
    * (`countDistinct`), which partial-aggregates map-side.
    *
    * Scale: the eval side (benchmarks are small by construction) is collapsed
    * to a DISTINCT gram set and broadcast; the corpus side is one scan —
    * position-explode, map-side broadcast left join, then a single
    * per-document aggregation shuffle.
    */
  def contaminationCheck(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 8, minOverlap: Double = 0.2): DataFrame = {
    // Positional explode + DISTINCT-FIRST: grams stream through codegen
    // (substr over the canonical text — no per-doc array ever materializes;
    // the array_distinct form measured ~9× slower on repetitive docs, all
    // allocation+GC), and the (id, gram) distinct runs BEFORE the eval
    // join, so within-doc repeats collapse in the partial aggregate and
    // the join + final aggregation see one row per distinct gram. The
    // previous form pushed every gram OCCURRENCE through an expand×2
    // double-countDistinct — ~20× the aggregated volume on this corpus.
    // n_grams is a plain count over the distinct stream (same value the
    // oracle's list_distinct length computes); grams stay STRINGS end to
    // end — the probe is exact, no hash-collision trade on a gate-checked
    // count.
    def posGrams(df: DataFrame) = df
      .select(col(idCol).as("id"), T.canonicalText(col(textCol)).as("ct"))
      // docs shorter than one shingle carry no content to compare — without
      // this filter an empty doc's single truncated gram ("") would count
      // as 100% contaminated against any blank eval row
      .where(length(col("ct")) >= shingleK)
      .select(col("id"), col("ct"), explode(sequence(lit(1),
        length(col("ct")) - (shingleK - 1))).as("p"))
      .select(col("id"), col("ct").substr(col("p"), lit(shingleK)).as("g"))
    val evalGrams = posGrams(evalSet)
      .select(col("g")).distinct().withColumn("hit", lit(1))
    posGrams(corpus)
      .select(col("id"), col("g")).distinct()
      .join(broadcast(evalGrams), Seq("g"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("hit") === 1, lit(1))).as("n_shared"))
      .withColumn("overlap",
        round(col("n_shared").cast("double") / col("n_grams"), 6))
      .where(col("n_shared") > 0 && col("overlap") >= minOverlap)
      .select(col("id"), col("n_grams"), col("n_shared"), col("overlap"))
  }

  /** Vocabulary-apply tokenization — the "run the tokenizer over the
    * corpus" step after [[graft.SparkEntry]]'s vocab induction: the top
    * `vocabSize` tokens by (frequency desc, token asc) get ids 1..V, every
    * other token id 0 (OOV), and each document re-emerges as its id
    * sequence (CSV-flattened so the result stays scalar-comparable).
    *
    * Scale: token explode is map-side; the vocab is a TakeOrdered of the
    * frequency aggregate (vocabSize rows — the single-partition row_number
    * runs over that bounded set only) broadcast into the id join; the one
    * real shuffle is the per-doc reassembly groupBy. Whitespace
    * tokenization keeps the oracle exact; swap the splitter for a BPE
    * pre-tokenizer regex at no plan-shape cost.
    */
  def tokenizeToIds(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val toks = docs
      .select(col(idCol), posexplode(split(lower(col(textCol)), "\\s+"))
        .as(Seq("pos", "tok")))
      .where(length(col("tok")) > 0)
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok")).limit(vocabSize)
      .withColumn("tok_id",
        row_number().over(Window.orderBy(col("freq").desc, col("tok"))))
      .select(col("tok"), col("tok_id"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("long").as("n_tokens"),
        sum(when(col("tok_id").isNull, 1L).otherwise(0L)).as("n_oov"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"),
            coalesce(col("tok_id"), lit(0)).as("tid")))),
          x => x.getField("tid").cast("string")), ",").as("ids_csv"))
  }

  /** Count-min-sketch frequency check over the exact top-k heavy hitters:
    * builds ONE mergeable sketch across the corpus (`count_min_sketch`,
    * partial-agg — the shuffle moves sketches, not tokens), then verifies
    * the CMS point estimates against the exact counts within the
    * (eps·N, never-undercount) guarantee.
    *
    * Why this exists at 100 TB: the exact `groupBy(token)` is affordable
    * once, but every LATER frequency probe (filter thresholds, stop-word
    * lists, vocab pruning during streaming ingest) wants an O(1)-state
    * estimator instead of a re-shuffle of the corpus — this operator is the
    * audited bridge between the two. The k-row collect is the bounded
    * broadcast-build idiom (k heavy hitters, not the vocabulary).
    *
    * @return (token, freq, within_bound) for the exact top-k by
    *         (freq desc, token); `within_bound` is the CMS guarantee check.
    */
  def cmsHeavyHitters(df: DataFrame, tokenCol: String, k: Int = 20,
      eps: Double = 0.0001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(tokenCol).as("token"))
    val (sketchBin, total) = {
      val r = toks.agg(
        count_min_sketch(col("token"), lit(eps), lit(confidence), lit(seed))
          .as("s"),
        count(lit(1)).as("n")).head()
      (r.getAs[Array[Byte]](0), r.getLong(1))
    }
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBin))
    val top = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(k)
      .as[(String, Long)].collect()
    top.toSeq.map { case (t, f) =>
      val est = cms.estimateCount(t)
      (t, f, est >= f && est <= f + (eps * total).ceil.toLong)
    }.toDF("token", "freq", "within_bound")
  }
  /** Temperature-based group rebalancing — the multilingual-corpus
    * sqrt-sampling heuristic (mC4 / XLM-R, α = 0.5): a group (language,
    * domain) holding n_g documents is retained at a target of
    * `totalTarget · √n_g / Σ √n`, capped at n_g — low-resource groups keep
    * proportionally MORE of their documents than high-resource ones, which
    * is the whole point of temperature < 1. α is fixed at 0.5 because √ is
    * IEEE-correctly-rounded in every engine while pow(x, α) is not — the
    * learned targets replay bit-for-bit in the oracle.
    *
    * Determinism end-to-end: weights are quantized to integers
    * (round(√n·10⁶)) so the target arithmetic is pure integer HALF-UP
    * ((2·T·w + Σw) div (2·Σw)) — no float summation order anywhere — and
    * the kept documents are each group's salted-md5 shuffle prefix (the
    * [[globalShuffle]] ordering), so adding a group never reorders another.
    *
    * Scale: one group-count aggregation (group-cardinality rows,
    * broadcast back), one window rank per group, one filter. The corpus is
    * scanned twice (count + rank), never collected.
    */
  def temperatureRebalance(df: DataFrame, idCol: String, groupCol: String,
      salt: String, totalTarget: Long): DataFrame = {
    require(totalTarget > 0, "totalTarget must be positive")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__wq",
        round(sqrt(col("__n").cast("double")) * 1e6).cast("long"))
    // Target arithmetic in decimal(38,0): 2·T·wq can reach ~5.5e34 for a
    // Long-range totalTarget (T ≤ 2^63) against wq ≈ √n·10⁶ ≈ 3e15, far
    // past Long.MaxValue — a silent Long overflow here yields negative
    // targets (empty sample) at exactly the corpus scale this targets.
    // `div` (IntegralDivide) accepts decimals and returns long; the
    // quotient itself is ≤ n_g, so the result always fits.
    val targets = counts
      .crossJoin(broadcast(counts.agg(sum(col("__wq")).as("__swq"))))
      .select(col(groupCol),
        least(col("__n"), expr(
          s"(2BD * cast(${totalTarget}L as decimal(38,0)) " +
            "* cast(__wq as decimal(38,0)) + __swq) " +
            "div (2BD * cast(__swq as decimal(38,0)))"))
          .as("__target"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
      .orderBy(saltedHash(col(idCol), salt), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(targets), groupCol)
      .where(col("__rn") <= col("__target"))
      .drop("__rn", "__target")
  }
}
