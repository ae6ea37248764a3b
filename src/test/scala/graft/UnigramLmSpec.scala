package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnigramSegment
import graft.operators.{Bpe, UnigramLm}

/** Unigram-LM tokenizer: Viterbi DP vs exhaustive segmentation search,
  * EM-objective monotonicity, character coverage, determinism, and the
  * concat round-trip on the real corpus.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()

  // ---- in-memory reference: score every segmentation, take the max ------

  private def allSegmentations(word: String, maxLen: Int): Seq[Seq[String]] =
    if (word.isEmpty) Seq(Seq.empty)
    else (1 to math.min(maxLen, word.length)).flatMap { l =>
      allSegmentations(word.drop(l), maxLen).map(word.take(l) +: _)
    }

  private def naiveBest(word: String, pieces: Map[String, Double],
      maxLen: Int, unk: Double): Double =
    allSegmentations(word, maxLen).map(_.map { p =>
      pieces.getOrElse(p, if (p.length == 1) unk else Double.NegativeInfinity)
    }.sum).max

  test("Viterbi score equals exhaustive-search max on random vocabularies") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    (1 to 60).foreach { _ =>
      val word = Seq.fill(2 + rnd.nextInt(7))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val vocabPieces = (Seq.tabulate(alphabet.length)(i =>
        alphabet(i).toString) ++
        Seq.fill(6)(Seq.fill(1 + rnd.nextInt(3))(
          alphabet(rnd.nextInt(alphabet.length))).mkString)).distinct
      val logps = vocabPieces.map(p => p -> -(1.0 + rnd.nextDouble() * 4)).toMap
      val table = UnigramSegment.buildTable(logps.toSeq, -20.0)
      val got = UnigramSegment.bestScore(UTF8String.fromString(word), table)
      val want = naiveBest(word, logps, table.maxPieceLen, -20.0)
      assert(math.abs(got - want) < 1e-9, s"word=$word got=$got want=$want")
    }
  }

  test("segment path score equals bestScore and concatenates to the word") {
    val pieces = Seq("a" -> -1.0, "b" -> -1.5, "ab" -> -1.2, "ba" -> -1.3,
      "aba" -> -2.0)
    val table = UnigramSegment.buildTable(pieces, -20.0)
    val logp = pieces.toMap
    Seq("ababab", "aaa", "b", "abba", "x", "xabx").foreach { w =>
      val segs = UnigramSegment.compute(UTF8String.fromString(w), table)
        .array.map(_.asInstanceOf[UTF8String].toString)
      assert(segs.mkString == w, s"concat broken for $w: ${segs.toSeq}")
      val pathScore = segs.map(p => logp.getOrElse(p, -20.0)).sum
      val best = UnigramSegment.bestScore(UTF8String.fromString(w), table)
      assert(math.abs(pathScore - best) < 1e-9, s"$w path != best")
    }
  }

  test("ties prefer the longer last piece (fewer tokens)") {
    // "ab" scores exactly a+b: the DP must still emit the single piece
    val table = UnigramSegment.buildTable(
      Seq("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0), -20.0)
    val segs = UnigramSegment.compute(UTF8String.fromString("ab"), table)
      .array.map(_.asInstanceOf[UTF8String].toString)
    assert(segs.toSeq == Seq("ab"))
  }

  test("corpus NLL is non-increasing across EM rounds at fixed vocabulary") {
    val vocab = Bpe.wordVocab(docs.limit(40), "text")
      .where(col("word").rlike("^[a-z]+$")).localCheckpoint(true)
    var model = UnigramLm.trainFromVocab(vocab, vocabSize = 120,
      maxPieceLen = 4, seedSize = 120, finalRounds = 0)
    var nll = UnigramLm.corpusNll(vocab, model)
    (1 to 3).foreach { _ =>
      // one manual hard-EM round at fixed vocab: re-estimate from Viterbi
      // counts over the SAME piece set (chars floored at 1)
      val counts = UnigramLm.viterbiCounts(vocab, model)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val re = model.pieces.map { case (p, _) =>
        (p, math.max(counts.getOrElse(p, 0L), 1L)) }
      val total = re.map(_._2).sum.toDouble
      model = UnigramLm.Model(
        re.map { case (p, c) => (p, math.log(c / total)) },
        model.maxPieceLen, model.unkScore)
      val next = UnigramLm.corpusNll(vocab, model)
      // hard-EM objective: the floor/renorm perturbs by at most a hair
      assert(next <= nll + math.abs(nll) * 1e-6,
        s"NLL increased: $nll -> $next")
      nll = next
    }
  }

  test("training is deterministic and character-covering") {
    val vocab = Bpe.wordVocab(docs.limit(60), "text")
      .where(col("word").rlike("^[a-z]+$"))
    val m1 = UnigramLm.trainFromVocab(vocab, vocabSize = 150,
      maxPieceLen = 4, seedSize = 300)
    val m2 = UnigramLm.trainFromVocab(vocab, vocabSize = 150,
      maxPieceLen = 4, seedSize = 300)
    assert(m1.pieces == m2.pieces, "training must be reproducible")
    assert(m1.size <= 150)
    val chars = vocab.select(explode(split(col("word"), "")).as("c"))
      .where(length(col("c")) > 0).distinct().as[String].collect().toSet
    val inModel = m1.pieces.map(_._1).filter(_.length == 1).toSet
    assert(chars.subsetOf(inModel), s"missing chars: ${chars -- inModel}")
  }

  test("encode round-trips and compresses vs characters on the corpus") {
    val vocab = Bpe.wordVocab(docs, "text")
      .where(col("word").rlike("^[a-z]+$"))
    val model = UnigramLm.trainFromVocab(vocab, vocabSize = 400,
      maxPieceLen = 5, seedSize = 800)
    val lower = docs.select(col("doc_id"),
      // keep only model-alphabet words so coverage is exact
      array_join(filter(split(trim(col("text")), "\\s+"),
        w => w.rlike("^[a-z]+$")), " ").as("text"))
      .where(length(col("text")) > 0)
    val enc = UnigramLm.encode(lower, "doc_id", "text", model)
      .withColumn("joined", concat_ws("", col("tokens")))
    val expect = lower.select(col("doc_id").as("did"),
      regexp_replace(col("text"), "\\s+", "").as("squash"))
    val bad = enc.join(expect, col("doc_id") === col("did"))
      .where(col("joined") =!= col("squash")).count()
    assert(bad == 0, "tokens must concatenate back to the input words")
    val Row2 = enc.join(expect, col("doc_id") === col("did"))
      .agg(sum(col("n_tokens")).cast("double"),
        sum(length(col("squash"))).cast("double"))
      .as[(Double, Double)].head()
    assert(Row2._1 < Row2._2,
      s"expected subword compression: ${Row2._1} tokens vs ${Row2._2} chars")
  }
}
