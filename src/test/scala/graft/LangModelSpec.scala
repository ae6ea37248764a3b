package graft

import graft.operators.LangModel
import org.apache.spark.sql.functions._

/** Hand-computed add-k bigram LM fixtures. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigramPerplexity matches hand-computed smoothed bigram NLL") {
    // corpus: "a b a" and "a b" → bigrams (a,b),(b,a) | (a,b)
    // c(a,b)=2 c(b,a)=1; history c(a·)=2 c(b·)=1; V=2, k=0.5
    val docs = Seq((1L, "a b a"), (2L, "A  b")).toDF("doc_id", "text")
    val out = LangModel.bigramPerplexity(docs, "doc_id", "text", k = 0.5)
      .orderBy("doc_id").collect()

    val pAB = (2 + 0.5) / (2 + 0.5 * 2) // p(b|a)
    val pBA = (1 + 0.5) / (1 + 0.5 * 2) // p(a|b)
    val nll1 = -(math.log(pAB) + math.log(pBA))
    val nll2 = -math.log(pAB)

    assert(out.length == 2)
    assert(out(0).getLong(1) == 2L)
    assert(math.abs(out(0).getDouble(2) - nll1) < 1e-12)
    assert(math.abs(out(0).getDouble(3) - math.exp(nll1 / 2)) < 1e-12)
    // "A  b" normalizes (lower + \S+) to the same tokens as "a b"
    assert(out(1).getLong(1) == 1L)
    assert(math.abs(out(1).getDouble(2) - nll2) < 1e-12)
    assert(math.abs(out(1).getDouble(3) - math.exp(nll2)) < 1e-12)
  }

  test("bigramPerplexity: sub-2-token docs emit zero bigrams and null ppl") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val out = LangModel.bigramPerplexity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    Seq(0, 1).foreach { i =>
      assert(out(i).getLong(1) == 0L)
      assert(out(i).getDouble(2) == 0.0)
      assert(out(i).isNullAt(3))
    }
    assert(out(2).getLong(1) == 1L && !out(2).isNullAt(3))
  }

  test("bigramPerplexity flags the out-of-distribution document") {
    // 20 near-identical docs + one gibberish doc: the oddball must carry
    // the highest perplexity (the CCNet filter decision)
    val normal = (1L to 20L).map(i => (i, s"the quick brown fox ${i % 3}"))
    val docs = (normal :+ (99L, "zzq qqz zqz qzz")).toDF("doc_id", "text")
    val top = LangModel.bigramPerplexity(docs, "doc_id", "text")
      .orderBy(desc("ppl")).select("doc_id").as[Long].first()
    assert(top == 99L)
  }
}
