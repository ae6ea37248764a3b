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
}
