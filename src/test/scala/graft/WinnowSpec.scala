package graft

import org.apache.spark.sql.functions._
import graft.operators.Winnow

/** Winnowing fingerprints vs an independent in-memory reference, the
  * shared-substring coverage guarantee, density bounds, and the map-side
  * (shuffle-free) plan pin.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  // ---- in-memory reference (Schleimer et al. §4, rightmost-min rule) ----

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def canonical(s: String): String =
    s.trim.toLowerCase.replaceAll("\\s+", " ")

  private def naive(text: String, k: Int, w: Int): Set[(Int, String)] = {
    val c = canonical(text)
    val nGrams = math.max(c.length - k + 1, 1)
    val hs = (1 to nGrams).map(i =>
      md5hex(c.substring(i - 1, math.min(i - 1 + k, c.length))))
    val nWin = math.max(nGrams - w + 1, 1)
    (1 to nWin).flatMap { j =>
      val ps = j to math.min(j + w - 1, nGrams)
      // rightmost minimum: scan left→right, replace on <=
      var best = ("~", 0)
      ps.foreach(p => if (hs(p - 1) <= best._1) best = (hs(p - 1), p))
      Some((best._2, best._1))
    }.toSet
  }

  lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    .limit(25).cache()

  test("fingerprint set equals the in-memory reference on real documents") {
    val got = Winnow.fingerprints(docs, "doc_id", "text", k = 8, w = 4)
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).map { case (id, fs) =>
        id -> fs.map(f => (f._2.toInt, f._3)).toSet }
    val want = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> naive(t, 8, 4) }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, fs) =>
      assert(fs == want(id), s"doc $id fingerprints diverge") }
  }

  test("any shared substring of length >= w+k-1 shares a fingerprint hash") {
    val shared = "zq8 planted shared run xv7" // 26 chars >= 11
    val rnd = new scala.util.Random(11)
    def noise(n: Int) =
      Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    (1 to 10).foreach { _ =>
      val a = noise(40) + " " + shared + " " + noise(30)
      val b = noise(55) + " " + shared + " " + noise(20)
      val fa = naive(a, 8, 4).map(_._2)
      val fb = naive(b, 8, 4).map(_._2)
      assert((fa & fb).nonEmpty, "coverage guarantee violated")
    }
    // and the Spark side agrees with naive on those synthetic docs (one
    // pair is enough; full equality is pinned above on real docs)
    val a = noise(40) + " " + shared
    val df = Seq((1L, a)).toDF("doc_id", "text")
    val got = Winnow.fingerprints(df, "doc_id", "text", 8, 4)
      .select("fp").as[String].collect().toSet
    assert(got == naive(a, 8, 4).map(_._2))
  }

  test("digest is canonical: identical text => identical digest; density bounded") {
    val two = Seq((1L, "The quick brown fox jumps over the lazy dog again"),
      (2L, "  the  QUICK brown fox jumps over the lazy dog again "))
    // canonicalization folds case/whitespace → same fingerprints
    val d = Winnow.digests(two.toDF("doc_id", "text"), "doc_id", "text", 8, 4)
      .select("fp_digest").as[String].collect()
    assert(d(0) == d(1))

    val stats = Winnow.digests(docs, "doc_id", "text", 8, 4)
      .select("n_grams", "n_fp").as[(Long, Long)].collect()
    stats.foreach { case (n, fp) =>
      val nWin = math.max(n - 3, 1)
      assert(fp <= nWin, "cannot select more than one fp per window")
      assert(fp >= (nWin + 3) / 4, "every w-window run selects at least one")
    }
  }

  test("digests plan is map-side: no shuffle exchange") {
    val plan = Winnow.digests(docs, "doc_id", "text", 8, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
