package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** Bloom-reduced semi join: row-identical to the plain semi join (the FP
  * cleanup join guarantees it), null-safe, works for long and string keys,
  * and the bloom pre-filter sits on the probe side of the plan.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("result is identical to the plain left-semi join (long keys)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_linenumber")
    val hot = spark.read.parquet(s"$sf0001/orders.parquet")
      .where($"o_totalprice" > 300000.0)
    val viaBloom = BloomJoin.bloomSemiJoin(li, hot, "l_orderkey", "o_orderkey")
    val plain = li.join(hot.select($"o_orderkey".as("l_orderkey")),
      Seq("l_orderkey"), "left_semi")
    assert(viaBloom.count() == plain.count())
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
    assert(plain.count() > 0)
  }

  test("string keys and null probe keys are handled") {
    val probe = Seq(Some("a"), Some("b"), None, Some("c"), Some("a"))
      .toDF("k")
    val build = Seq("a", "c", "d").toDF("bk")
    val out = BloomJoin.bloomSemiJoin(probe, build, "k", "bk")
      .as[String].collect().sorted.toSeq
    assert(out == Seq("a", "a", "c"))
  }

  test("explicit expectedItems skips nothing semantically") {
    val probe = (1L to 1000L).toDF("k")
    val build = (900L to 1100L).toDF("bk")
    val out = BloomJoin.bloomSemiJoin(probe, build, "k", "bk",
      expectedItems = 256L, fpp = 0.05)
    assert(out.as[Long].collect().sorted.toSeq == (900L to 1000L))
  }

  test("mismatched probe/build key types fail fast instead of dropping rows") {
    // A plain semi join would coerce long-vs-string and still match; the
    // bloom would hash the two representations differently and silently
    // drop genuine matches — so the contract violation must be an error.
    val probe = (1L to 10L).toDF("k")
    val build = Seq("3", "5").toDF("bk")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(probe, build, "k", "bk")
    }
    assert(e.getMessage.contains("identical key types"))
  }

  test("the bloom pre-filter is a codegen'd might_contain below the join — no UDF") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey")
    val hot = spark.read.parquet(s"$sf0001/orders.parquet")
      .where($"o_totalprice" > 300000.0).select("o_orderkey")
    val p = BloomJoin.bloomSemiJoin(li, hot, "l_orderkey", "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"codegen'd bloom probe missing:\n${p.take(1500)}")
    // the probe path must stay inside whole-stage codegen: no Scala UDF,
    // no Python eval node anywhere in the physical plan
    assert(!p.contains("UDF") && !p.contains("BatchEvalPython"),
      s"bloom probe fell out of codegen:\n${p.take(1500)}")
    val probeIdx = p.indexOf("might_contain")
    val joinIdx = p.indexOf("Join")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "probe-side filter should appear below the join in the plan tree")
  }
}
