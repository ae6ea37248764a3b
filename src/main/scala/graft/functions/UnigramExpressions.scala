package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word under a unigram language model over
  * subword pieces (Kudo, ACL 2018 — the SentencePiece unigram model): the
  * hot loop of both unigram-LM tokenizer TRAINING (the E-step segments every
  * distinct word each round) and encoding, as one codegen'd Catalyst
  * expression — the same static-compute pattern as [[BpeApply]]. Per row it
  * runs one O(len × maxPieceLen) dynamic program with primitive arrays and a
  * piece→score hash probe per candidate; no per-element boxing beyond the
  * map probe, and it stays inside whole-stage codegen.
  *
  * Semantics: `best(i)` = max over admissible last pieces `w[j..i)` of
  * `best(j) + logp(piece)`; a single character absent from the vocabulary
  * scores `unkScore` (the character-fallback keeps the DP total — every
  * word is segmentable, matching SentencePiece's required character
  * coverage). Ties prefer the LONGER last piece (candidates are scanned
  * short-to-long with `>=`), a deterministic rule that biases toward fewer
  * tokens and makes the learned model reproducible engine-to-engine.
  */
case class UnigramSegment(child: Expression,
    pieces: Seq[(String, Double)], unkScore: Double)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val table: UnigramSegment.ScoreTable =
    UnigramSegment.buildTable(pieces, unkScore)

  override def nullSafeEval(input: Any): Any =
    UnigramSegment.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramSegment.ScoreTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramSegment.compute($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): UnigramSegment =
    copy(child = c)
  override def prettyName: String = "unigram_segment"
}

/** The Viterbi best log-probability of a word under the piece model — the
  * NLL leg of unigram training ([[UnigramSegment]]'s score-only twin; same
  * DP, same tie rule, so `score(w) == Σ logp(segment(w))` exactly).
  */
case class UnigramScore(child: Expression,
    pieces: Seq[(String, Double)], unkScore: Double)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  private lazy val table: UnigramSegment.ScoreTable =
    UnigramSegment.buildTable(pieces, unkScore)

  override def nullSafeEval(input: Any): Any =
    UnigramSegment.bestScore(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table,
      classOf[UnigramSegment.ScoreTable].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramSegment.bestScore($c, $ref);")
  }

  override protected def withNewChildInternal(c: Expression): UnigramScore =
    copy(child = c)
  override def prettyName: String = "unigram_score"
}

object UnigramSegment {

  /** Broadcast-safe score table: piece → logp plus the scan bound. */
  final class ScoreTable(
      val scores: java.util.HashMap[UTF8String, java.lang.Double],
      val maxPieceLen: Int, val unkScore: Double) extends Serializable

  def buildTable(pieces: Seq[(String, Double)], unkScore: Double): ScoreTable = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](
      math.max(16, pieces.size * 2))
    var maxLen = 1
    pieces.foreach { case (p, lp) =>
      val u = UTF8String.fromString(p)
      m.put(u, lp)
      if (u.numChars() > maxLen) maxLen = u.numChars()
    }
    new ScoreTable(m, maxLen, unkScore)
  }

  /** Shared by interpreted eval and generated code. */
  def compute(word: UTF8String, t: ScoreTable): GenericArrayData = {
    val n = word.numChars()
    if (n == 0) return new GenericArrayData(new Array[Any](0))
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      // short-to-long with >= : on a score tie the longer last piece wins
      var l = 1
      val lMax = if (t.maxPieceLen < i) t.maxPieceLen else i
      while (l <= lMax) {
        val j = i - l
        if (best(j) != Double.NegativeInfinity || j == 0) {
          val sub = word.substring(j, i)
          val p = t.scores.get(sub)
          val s =
            if (p != null) p.doubleValue()
            else if (l == 1) t.unkScore
            else Double.NegativeInfinity
          if (s != Double.NegativeInfinity) {
            val cand = best(j) + s
            if (cand >= best(i)) { best(i) = cand; back(i) = j }
          }
        }
        l += 1
      }
      i += 1
    }
    // reconstruct backward; single-char fallback guarantees reachability
    var cnt = 0
    var k = n
    while (k > 0) { cnt += 1; k = back(k) }
    val out = new Array[Any](cnt)
    k = n
    var w = cnt - 1
    while (k > 0) {
      out(w) = word.substring(back(k), k)
      w -= 1
      k = back(k)
    }
    new GenericArrayData(out)
  }

  /** The Viterbi path's total log-probability — the score leg of the DP,
    * exposed for [[UnigramScore]] and the improvement-per-round spec.
    */
  def bestScore(word: UTF8String, t: ScoreTable): Double = {
    val n = word.numChars()
    if (n == 0) return 0.0
    val best = new Array[Double](n + 1)
    var i = 1
    while (i <= n) {
      best(i) = Double.NegativeInfinity
      var l = 1
      val lMax = if (t.maxPieceLen < i) t.maxPieceLen else i
      while (l <= lMax) {
        val j = i - l
        if (best(j) != Double.NegativeInfinity || j == 0) {
          val sub = word.substring(j, i)
          val p = t.scores.get(sub)
          val s =
            if (p != null) p.doubleValue()
            else if (l == 1) t.unkScore
            else Double.NegativeInfinity
          if (s != Double.NegativeInfinity) {
            val cand = best(j) + s
            if (cand >= best(i)) best(i) = cand
          }
        }
        l += 1
      }
      i += 1
    }
    best(n)
  }
}
