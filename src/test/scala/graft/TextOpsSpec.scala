package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** PII redaction and chunking invariants. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces emails and IPs, leaves clean text alone") {
    val df = Seq(
      ("mail me at a.b+c@x-y.co today", 1),
      ("server 192.168.10.254 down", 2),
      ("both x@y.io and 10.0.0.1 here", 3),
      ("nothing sensitive", 4)).toDF("t", "id")
    val out = df.select($"id", T.redactPii($"t").as("r"),
      T.piiCount($"t").as("n")).orderBy("id")
      .as[(Int, String, Long)].collect()
    assert(out(0)._2 == "mail me at <EMAIL> today" && out(0)._3 == 1)
    assert(out(1)._2 == "server <IP> down" && out(1)._3 == 1)
    assert(out(2)._2 == "both <EMAIL> and <IP> here" && out(2)._3 == 2)
    assert(out(3)._2 == "nothing sensitive" && out(3)._3 == 0)
  }

  test("chunking covers every token with the configured overlap") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val toks = docs.select($"doc_id",
      regexp_extract_all($"text", lit("\\S+"), lit(0)).as("toks"))
    val window = 50; val stride = 40
    val chunks = toks.select($"doc_id", size($"toks").as("n_toks"),
      posexplode(T.chunkTokens($"toks", window, stride))
        .as(Seq("idx", "chunk")))
      .select($"doc_id", $"n_toks", $"idx",
        size(split($"chunk", " ")).as("chunk_len"))
    val perDoc = chunks.groupBy("doc_id", "n_toks")
      .agg(count(lit(1)).as("nc"), max($"idx").as("max_idx"),
        sum($"chunk_len").as("sum_len"), max($"chunk_len").as("max_len"))
      .as[(Long, Int, Long, Int, Long, Int)].collect()
    perDoc.foreach { case (id, n, nc, maxIdx, sumLen, maxLen) =>
      assert(maxLen <= window, s"doc $id chunk exceeds window")
      assert(maxIdx == nc - 1)
      // coverage: last chunk must reach the final token
      val lastStart = (nc - 1) * stride
      assert(lastStart + window >= n, s"doc $id tail tokens uncovered")
      // total emitted tokens = n + overlap duplication
      val expectedDup = (nc - 1) * (window - stride)
      assert(sumLen <= n + expectedDup, s"doc $id overlap accounting")
    }
  }

  test("canonicalizeUrl: host-only lowering, tracking stripped, slash/fragment dropped") {
    val cases = Seq(
      ("HTTPS://Example.COM/A/B/", "https://example.com/A/B"),
      ("http://host/p?utm_source=x", "http://host/p"),
      ("http://host/p?utm_source=x&keep=1&gclid=z#f", "http://host/p?keep=1"),
      ("http://HOST/CaseSensitive/Path", "http://host/CaseSensitive/Path"),
      ("https://h/p?fbclid=abc&utm_campaign=c", "https://h/p"),
      ("https://h/p?keep=1&also=2", "https://h/p?keep=1&also=2"))
      .toDF("url", "expected")
    cases.select(T.canonicalizeUrl($"url").as("got"), $"expected")
      .as[(String, String)].collect()
      .foreach { case (g, e) => assert(g == e, s"got '$g' want '$e'") }
  }

  test("gopher rules: each heuristic rejects its pathological document") {
    val w20 = Seq.fill(20)("word").mkString(" ")
    val rows = Seq(
      (1L, w20),                                  // healthy: kept
      (2L, Seq.fill(19)("word").mkString(" ")),   // too few words
      (3L, Seq.fill(20)("aa").mkString(" ")),     // mean word length 2 < 3
      (4L, Seq.fill(20)("a" * 11).mkString(" ")), // mean word length 11 > 10
      (5L, w20 + " " + Seq.fill(3)("###").mkString(" ")), // symbol-heavy
      (6L, (Seq.fill(12)("word") ++ Seq.fill(8)("123")).mkString(" ")) // 60% alpha < 80%
    ).toDF("id", "text")
    val counters = T.gopherCounters($"text")
    val got = rows
      .select($"id" +: counters.map { case (n, c) => c.as(n) }: _*)
      .withColumn("keep", T.gopherKeep($"n_words", $"n_word_chars",
        $"n_alpha_words", $"n_symbols", minWords = 20))
      .select("id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got(1L), "healthy doc must pass")
    Seq(2L, 3L, 4L, 5L, 6L).foreach(id =>
      assert(!got(id), s"doc $id must fail its rule"))
  }

  test("c4LineFilter keeps only punctuated lines with enough words") {
    val text = Seq(
      "this line has plenty of words and ends well.",
      "too short line.",
      "this line has plenty of words but no terminal punctuation",
      "does this question line with many words count?",
      "  padded line with five words here!  ").mkString("\n")
    val got = Seq(text).toDF("t")
      .select(T.c4LineFilter($"t", minWords = 5).as("c"))
      .as[String].head()
    val kept = got.split("\n")
    assert(kept.length == 3, s"got ${kept.toSeq}")
    assert(kept(0).endsWith("well.") && kept(1).endsWith("count?") &&
      kept(2).trim.endsWith("here!"))
  }

  test("stripHtml drops blocks and tags, decodes entities in the safe order") {
    val rows = Seq(
      ("<p>Hello <b>world</b></p>", "Hello world"),
      ("<script>if (a < b) { x(); }</script>after", "after"),
      ("<style>p > a {}</style>text", "text"),
      // &amp;lt; must decode to the LITERAL "&lt;", never to "<"
      ("a &amp;lt; b &amp; c &lt;tag&gt; &quot;q&quot; &#39;s&#39;",
        "a &lt; b & c <tag> \"q\" 's'"),
      ("   spaced \n\t out   ", "spaced out"),
      ("<div class=\"x\" data-y='z'>keep</div>", "keep"))
      .toDF("html", "expected")
    val got = rows.select(T.stripHtml($"html").as("got"), $"expected")
      .as[(String, String)].collect()
    got.foreach { case (g, e) => assert(g == e, s"got '$g' want '$e'") }
  }

  test("hashedLinearScore equals the plain-Scala replay; empty text scores 0.5") {
    // differential against an independent reimplementation (MessageDigest
    // md5, same bucket/weight derivation, BigDecimal HALF_UP round like
    // Spark's round)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def replay(text: String, buckets: Int = 64, salt: String = "graftq"): Double = {
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val raw =
        if (toks.isEmpty) 0.0
        else toks.map { t =>
          val b = Integer.parseInt(md5hex(salt + t).substring(0, 4), 16) % buckets
          java.lang.Long.parseLong(md5hex(salt + "w" + b).substring(0, 6), 16) /
            16777216.0 * 2 - 1
        }.foldLeft(0.0)(_ + _) / toks.length
      BigDecimal(1.0 / (1.0 + math.exp(-4.0 * raw)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val texts = Seq("the quick brown fox", "THE QUICK brown  fox",
      "a", "numbers 123 and symbols !?", "", "   \n\t  ",
      "repeated repeated repeated words words")
    val got = texts.toDF("t")
      .select(T.hashedLinearScore($"t").as("s")).as[Double].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g == replay(t), s"'$t': spark=$g replay=${replay(t)}")
      assert(g > 0.0 && g < 1.0)
    }
    // whitespace-only and empty text: no tokens → raw 0 → sigmoid(0) = 0.5
    assert(got(4) == 0.5 && got(5) == 0.5)
    // case-insensitive, whitespace-normalized: rows 0 and 1 tie
    assert(got(0) == got(1))
  }
}
