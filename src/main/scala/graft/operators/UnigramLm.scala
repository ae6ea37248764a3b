package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge

import graft.functions.{UnigramScore, UnigramSegment}

/** Unigram-LM subword tokenizer TRAINING (Kudo, ACL 2018 — the SentencePiece
  * unigram model), the probabilistic sibling of [[Bpe]]: instead of learning
  * greedy merges, learn a piece vocabulary with log-probabilities and
  * segment by Viterbi. Complements the engine's BPE trainer the way the
  * reference pairs extraction recipes with per-dtype dispatch — two
  * interchangeable tokenization strategies over one corpus surface.
  *
  * Algorithm (hard-EM variant): seed the vocabulary with the most frequent
  * substrings (≤ `maxPieceLen` chars) of the distinct-word table, then
  * alternate
  *   E: Viterbi-segment every distinct word under the current model
  *      ([[graft.functions.UnigramSegment]] — codegen'd, map-side),
  *   M: re-estimate piece probabilities from occurrence-weighted Viterbi
  *      counts (integer sums → the model is exactly reproducible),
  *   prune: keep the `shrink`-fraction highest-count pieces (every observed
  *      single character is exempt — character coverage is an invariant),
  * until the vocabulary fits `vocabSize`. Classic SentencePiece uses soft EM
  * (forward-backward expected counts) and loss-ranked pruning; hard EM is
  * the documented simplification — same model family, same coverage
  * guarantee, deterministic integer count statistics instead of
  * summation-order-sensitive float expectations.
  *
  * Scale shape (the [[Bpe]] contract): the corpus collapses ONCE to the
  * distinct-word vocabulary with counts; every EM round is one map-side
  * segmentation + one piece-keyed aggregation over that table. The only
  * driver-side data is the piece table itself, bounded by `seedSize`
  * (thousands) — the bounded broadcast-vocab idiom; the corpus is never
  * re-scanned after the initial collapse.
  */
object UnigramLm {

  /** A trained model: pieces with log-probabilities, the DP scan bound, and
    * the unknown-character score (applies only to characters never seen in
    * training; seen characters are vocabulary members by construction).
    */
  case class Model(pieces: Seq[(String, Double)], maxPieceLen: Int,
      unkScore: Double) {
    def size: Int = pieces.size
  }

  /** All substrings of `word` up to `maxPieceLen` chars, as a column —
    * the seed-vocabulary candidate generator (runs once, over distinct
    * words). O(len × maxPieceLen) candidates per word.
    */
  private def substrCandidates(word: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)),
      i => transform(
        sequence(lit(1), least(lit(maxPieceLen), length(word) - i + 1)),
        l => word.substr(i, l))))

  /** Occurrence-weighted substring counts over a `(word, n)` vocabulary —
    * the seed statistics. Exposed for the oracle gate (DuckDB recomputes
    * the same counts with list comprehensions).
    */
  def seedCounts(vocab: DataFrame, maxPieceLen: Int): DataFrame =
    vocab.select(col("n"),
        explode(substrCandidates(col("word"), maxPieceLen)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))

  /** The Viterbi segmentation as a composable column (word → pieces) —
    * for callers that keep their own surrounding projection (the gate
    * pipeline carries the squashed expectation alongside).
    */
  def segmentColumn(word: Column, m: Model): Column = segment(word, m)

  private def segment(word: Column, m: Model): Column =
    GraftSqlBridge.column(UnigramSegment(
      GraftSqlBridge.expression(word), m.pieces, m.unkScore))

  private def score(word: Column, m: Model): Column =
    GraftSqlBridge.column(UnigramScore(
      GraftSqlBridge.expression(word), m.pieces, m.unkScore))

  /** One E-step: occurrence-weighted Viterbi piece counts under `model`. */
  def viterbiCounts(vocab: DataFrame, model: Model): DataFrame =
    vocab.select(col("n"), explode(segment(col("word"), model)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))

  /** Corpus negative log-likelihood under `model` (occurrence-weighted sum
    * of Viterbi word scores) — the training objective, for the
    * non-increasing-per-EM-round spec and model comparison.
    */
  def corpusNll(vocab: DataFrame, model: Model): Double =
    vocab.select(sum(-col("n") * score(col("word"), model)).as("nll"))
      .collect()(0).getDouble(0)

  /** Collect a count table into a normalized log-prob model. Bounded: the
    * count frame is piece-keyed (≤ seedSize rows by construction). Order
    * ties on count break lexicographically → reproducible model.
    */
  private def toModel(counts: Seq[(String, Long)], maxPieceLen: Int,
      unkScore: Double): Model = {
    val total = counts.map(_._2).sum.toDouble
    Model(counts.sortBy { case (p, c) => (-c, p) }
      .map { case (p, c) => (p, math.log(c / total)) },
      maxPieceLen, unkScore)
  }

  /** Train from a prebuilt `(word, n)` vocabulary (the gate entry — a
    * deterministic sub-vocabulary makes the learned model
    * engine-independent, the [[Bpe.trainFromVocab]] convention).
    *
    * Per round: one distributed E-step aggregation, one bounded collect
    * (≤ current piece count rows), one driver-side prune. Rounds are
    * bounded by log_shrink(seedSize/vocabSize) + `finalRounds`.
    */
  def trainFromVocab(vocab: DataFrame, vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 2000, shrink: Double = 0.75,
      finalRounds: Int = 2, unkScore: Double = -20.0): Model = {
    require(vocabSize > 0 && seedSize >= vocabSize,
      "need vocabSize > 0 and seedSize >= vocabSize")
    require(shrink > 0 && shrink < 1, "shrink must be in (0, 1)")
    val v = vocab.select(col("word"), col("n")).localCheckpoint(true)

    // observed characters with occurrence-weighted counts: always seeded
    // and never pruned (coverage invariant, independent of the top-K cut)
    val charCounts = v
      .select(col("n"), explode(split(col("word"), "")).as("piece"))
      .where(length(col("piece")) > 0)
      .groupBy(col("piece")).agg(sum(col("n")).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val chars = charCounts.map(_._1).toSet

    val seed = seedCounts(v, maxPieceLen)
      .where(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece")).limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val seedKeep = (charCounts ++
      seed.take(math.max(0, seedSize - charCounts.length))).toSeq
    var model = toModel(seedKeep, maxPieceLen, unkScore)

    var rounds = 0
    val maxRounds = // shrink-path length + the fixed-vocab polish rounds
      math.ceil(math.log(vocabSize.toDouble / seedSize) / math.log(shrink))
        .toInt + finalRounds + 2
    var polish = finalRounds
    while ((model.size > vocabSize || polish > 0) && rounds < maxRounds) {
      if (model.size <= vocabSize) polish -= 1
      val counts = viterbiCounts(v, model)
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy { case (p, c) => (-c, p) }
      val (charPieces, rest) = counts.partition(p => chars.contains(p._1))
      // unseen-by-Viterbi characters keep a count floor of 1: coverage
      // survives even when every occurrence rides a longer piece
      val charFloor = charPieces ++
        chars.diff(charPieces.map(_._1).toSet).toSeq.sorted.map((_, 1L))
      val target =
        if (model.size > vocabSize)
          math.max(vocabSize, (model.size * shrink).toInt)
        else vocabSize
      val kept = charFloor ++ rest.take(math.max(0, target - charFloor.size))
      model = toModel(kept.toSeq, maxPieceLen, unkScore)
      rounds += 1
    }
    model
  }

  /** Train end-to-end from documents (whitespace words, the [[Bpe]]
    * convention).
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, seedSize: Int = 2000): Model =
    trainFromVocab(Bpe.wordVocab(docs, textCol), vocabSize, maxPieceLen,
      seedSize)

  /** Tokenize `textCol` under a trained model: whitespace words → Viterbi
    * pieces — map-side, one codegen'd expression per row, no shuffle.
    * Output: idCol, tokens (array<string>), n_tokens.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    docs.where(length(trim(col(textCol))) > 0)
      .select(col(idCol),
        flatten(transform(split(trim(col(textCol)), "\\s+"),
          w => segment(w, model))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
}
