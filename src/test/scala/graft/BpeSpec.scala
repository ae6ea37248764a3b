package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer vs an independent in-memory reference: merge tables must be
  * identical (order, pairs, counts) on any corpus, and encoding with the
  * learned merges must equal the reference tokenization.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- naive reference (Sennrich et al. semantics) -----------------------

  private def naiveTrain(words: Seq[String], nMerges: Int)
      : Seq[(Int, String, String, Long)] = {
    val vocab = scala.collection.mutable.Map.empty[List[String], Long]
    words.filter(_.nonEmpty).foreach { w =>
      val k = w.toList.map(_.toString)
      vocab(k) = vocab.getOrElse(k, 0L) + 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var continue = true
    while (rank <= nMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some(((a, b), n)) if n >= 2 =>
          out += ((rank, a, b, n))
          val merged = vocab.toSeq.map { case (syms, cnt) =>
            (naiveApply(syms, a, b), cnt)
          }
          vocab.clear()
          merged.foreach { case (k, c) =>
            vocab(k) = vocab.getOrElse(k, 0L) + c
          }
          rank += 1
        case _ => continue = false
      }
    }
    out.toSeq
  }

  private def naiveApply(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def naiveEncode(text: String,
      merges: Seq[(Int, String, String, Long)]): Seq[String] =
    text.trim.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { w =>
      merges.sortBy(_._1).foldLeft(w.toList.map(_.toString)) {
        case (syms, (_, a, b, _)) => naiveApply(syms, a, b)
      }
    }

  // ---- fixtures -----------------------------------------------------------

  test("learns the classic merges on a hand corpus") {
    // "aaab" x3 + "aab": (a,a) dominates, then (aa,a) vs (aa,b)…
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab aab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", nMerges = 3)
    val want = naiveTrain(Seq("aaab", "aaab", "aaab", "aab"), 3)
    assert(merges == want)
    assert(merges.head._2 == "a" && merges.head._3 == "a")
  }

  test("encode with learned merges equals the reference, reduces tokens") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(60)
    val merges = Bpe.train(docs, "text", nMerges = 12)
    assert(merges.size == 12)
    // merge ranks strictly increasing, counts non-increasing is NOT
    // guaranteed (later merges can create hot pairs), but counts >= 2
    assert(merges.map(_._1) == (1 to 12) && merges.forall(_._4 >= 2))
    val rows = docs.select("doc_id", "text").as[(Long, String)].collect()
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .select("doc_id", "tokens").as[(Long, Seq[String])].collect().toMap
    rows.foreach { case (id, text) =>
      if (text.trim.nonEmpty)
        assert(got(id) == naiveEncode(text, merges), s"doc $id diverged")
    }
    // merging strictly compresses: fewer tokens than characters
    val charCount = rows.map(_._2.replaceAll("\\s+", "").length.toLong).sum
    val tokCount = got.values.map(_.size.toLong).sum
    assert(tokCount < charCount)
  }

  test("merge table equals the reference on random tiny-vocab corpora") {
    val docGen: Gen[List[String]] = Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 6).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf('x', 'y', 'z')).map(_.mkString))))
    val prop = Prop.forAll(docGen) { words =>
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      Bpe.train(docs, "text", nMerges = 5) == naiveTrain(words, 5)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
