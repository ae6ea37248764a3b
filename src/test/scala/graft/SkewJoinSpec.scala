package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted join: result equivalence with the plain join, salt spread. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join returns the same multiset as the plain join") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("l_orderkey").count()
    val salted = SkewJoin.saltedInnerJoin(
      li.withColumnRenamed("l_orderkey", "k"),
      ord.withColumnRenamed("o_orderkey", "k"), "k", saltFactor = 7)
      .groupBy("k").count()
    val a = plain.as[(Long, Long)].collect().toMap
    val b = salted.as[(Long, Long)].collect().toMap
    assert(a.map { case (k, v) => v }.sum == b.map { case (k, v) => v }.sum)
    assert(a == b.map { case (k, v) => (k, v) })
  }

  test("hot keys diagnostic ranks by frequency") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val hot = SkewJoin.hotKeys(li, "l_orderkey", 5).as[(Long, Long)].collect()
    assert(hot.length == 5)
    assert(hot.map(_._2).sliding(2).forall(p => p.head >= p.last))
  }

  test("hotKeyProfile: frac sums the share, lift flags the hot key") {
    // key 1 has 60 of 100 rows over 5 distinct keys: frac 0.6, lift 3.0
    val df = (Seq.fill(60)(1) ++ Seq.fill(10)(2) ++ Seq.fill(10)(3) ++
      Seq.fill(10)(4) ++ Seq.fill(10)(5)).toDF("k")
    val top = SkewJoin.hotKeyProfile(df, "k", topN = 2).collect()
    assert(top(0).getInt(0) == 1 && top(0).getLong(1) == 60L)
    assert(top(0).getDouble(2) == 0.6 && top(0).getDouble(3) == 3.0)
    // uniform keys sit at lift 0.5 here (10 * 5 / 100)
    assert(top(1).getDouble(3) == 0.5)
  }

  test("salting spreads a pathological key across salt values") {
    // one key with 10k rows — the single-partition hot-key scenario
    val hotLeft = spark.range(10000).select(lit(1L).as("k"), $"id")
    val right = Seq((1L, "x")).toDF("k", "v")
    val joined = SkewJoin.saltedInnerJoin(hotLeft, right, "k", saltFactor = 8)
    assert(joined.count() == 10000)
    // distinct salts actually used (derived pre-drop): recompute spread
    val spread = hotLeft.select(
      pmod(xxhash64(struct($"k", $"id")), lit(8L)).as("s"))
      .groupBy("s").count().count()
    assert(spread == 8, "all salt buckets should be populated")
  }

  test("AQE skew-join splits the hot partition at runtime (skew=true)") {
    // one key carries ~97% of the left side; with the skew thresholds
    // lowered to fixture scale, AQE must re-plan the sort-merge join with
    // the hot partition split — the runtime complement to manual salting
    val left = (1 to 150000).map(i => (1L, i)) ++ (1 to 3000).map(i => ((i % 50 + 2).toLong, i))
    val right = (1L to 60L).map(k => (k, s"r$k"))
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = left.toDF("k", "v").join(right.toDF("k", "s"), "k")
      // drive THIS queryExecution (count() would plan a separate one and
      // leave df's own AQE plan unfinalized)
      assert(df.collect().length == 153000)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should have split the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
