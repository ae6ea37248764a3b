package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopK

/** TopKPerKey physical operator: equivalence with the window form, plan
  * shape (partial below the exchange), and shuffle elision on
  * pre-partitioned input.
  */
class TopKPerKeySpec extends SparkSpec {

  private lazy val orders = spark.read.parquet(s"$sf0001/orders.parquet")

  private def windowForm(k: Int) = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k).drop("rn")
  }

  test("matches the row_number window form under a total order") {
    val k = 3
    val got = TopK.topKPerKey(orders, Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), k)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    val want = windowForm(k)
      .select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.length == want.length && got.toSeq == want.toSeq)
  }

  test("k larger than any group degenerates to the identity") {
    val got = TopK.topKPerKey(orders, Seq("o_custkey"),
      Seq(col("o_orderkey")), k = 1000000)
    assert(got.count() == orders.count())
  }

  test("plan: partial heap below the exchange, no WindowExec, no sort") {
    val df = TopK.topKPerKey(orders, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(!plan.contains("Window"), plan)
    // partial runs before the exchange: Exchange must appear between the
    // two operator names in the tree rendering (Final above, Partial below)
    val fin = plan.indexOf("TopKPerKeyFinal")
    val ex = plan.indexOf("Exchange", fin)
    val part = plan.indexOf("TopKPerKeyPartial", ex)
    assert(fin >= 0 && ex > fin && part > ex, plan)
  }

  test("partial-side key cap degrades to pass-through, result still exact") {
    spark.conf.set("spark.graft.topk.maxKeysPerPartition", "1")
    try {
      val got = TopK.topKPerKey(orders, Seq("o_custkey"),
          Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .select("o_orderkey").collect().map(_.getLong(0)).sorted
      val want = windowForm(3)
        .select("o_orderkey").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == want.toSeq)
    } finally spark.conf.unset("spark.graft.topk.maxKeysPerPartition")
  }

  test("final-side key overflow spills to the external sort and stays exact") {
    // cap=1: every shuffle partition owns many keys but may heap only one,
    // so nearly all rows take the final exec's spill path — the skewed-
    // partition scenario that used to hold one heap per key unbounded
    spark.conf.set("spark.graft.topk.maxKeysPerPartition", "1")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan tree
    try {
      val df = TopK.topKPerKey(orders, Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
      val got = df.collect().map(_.getAs[Long]("o_orderkey")).sorted
      val want = windowForm(3)
        .select("o_orderkey").collect().map(_.getLong(0)).sorted
      assert(got.toSeq == want.toSeq)
      val fin = df.queryExecution.executedPlan.collectFirst {
        case t: graft.plans.TopKPerKeyExec if !t.partial => t
      }.get
      assert(fin.metrics("spillRows").value > 0, "spill path did not engage")
    } finally {
      spark.conf.unset("spark.graft.topk.maxKeysPerPartition")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("pre-partitioned input elides the top-k shuffle") {
    val pre = orders.repartition(col("o_custkey"))
    val df = TopK.topKPerKey(pre, Seq("o_custkey"),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
    val plan = df.queryExecution.executedPlan.toString
    // exactly the repartition exchange — none added for the final top-k
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    val got = df.select("o_orderkey").collect().map(_.getLong(0)).sorted
    val want = windowForm(3).select("o_orderkey").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == want.toSeq)
  }
}
