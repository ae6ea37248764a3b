package graft

import graft.operators.Constraints
import graft.operators.Constraints._

/** Single-pass declarative constraint suite: metric math on planted
  * violations, verdict thresholds, and the one-scan compilation shape. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1, 1, "A", 0.05, 10.0, Option("x1")),
    (1, 1, "A", 0.05, 10.0, Option("x2")), // duplicate (k1, k2) key
    (2, 1, "Z", 0.50, 100.0, None), // bad flag, both ranges out, null s
    (3, 1, "N", 0.00, 1.0, Option("ok"))
  ).toDF("k1", "k2", "flag", "disc", "qty", "s")

  private def verdicts(cs: Seq[Constraint]): Map[String, (Double, Boolean)] =
    Constraints.check(df, cs).as[(String, Double, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("planted violations measure exact fractions and fail") {
    val v = verdicts(Seq(
      NotNull("s"),
      Unique(Seq("k1", "k2")),
      InRange("disc", 0.0, 0.1),
      InRange("qty", 1.0, 50.0),
      AcceptedValues("flag", Seq("A", "N", "R")),
      MinSize(5)))
    assert(v("not_null(s)") == (0.25, false))
    assert(v("unique(k1,k2)") == (0.25, false)) // 3 distinct of 4
    assert(v("in_range(disc)") == (0.25, false))
    assert(v("in_range(qty)") == (0.25, false))
    assert(v("accepted_values(flag)") == (0.25, false))
    assert(v("min_size") == (4.0, false))
  }

  test("thresholds flip verdicts without changing metrics") {
    val v = verdicts(Seq(NotNull("s", maxNullFraction = 0.3), MinSize(4)))
    assert(v("not_null(s)") == (0.25, true))
    assert(v("min_size") == (4.0, true))
  }

  test("regex constraint counts rlike matches against minFraction") {
    val v1 = verdicts(Seq(MatchesRegex("flag", "[ANR]", minFraction = 0.75)))
    val v2 = verdicts(Seq(MatchesRegex("flag", "[ANR]", minFraction = 0.8)))
    assert(v1("matches_regex(flag)") == (0.75, true))
    assert(v2("matches_regex(flag)") == (0.75, false))
    // duplicate constraint names cannot compile into one row each — rejected
    intercept[IllegalArgumentException] {
      Constraints.check(df, Seq(
        MatchesRegex("flag", "[ANR]"), MatchesRegex("flag", "[AN]")))
    }
  }

  test("a clean table passes the full suite") {
    val clean = Seq((1, "A", 0.05), (2, "N", 0.07)).toDF("k", "flag", "disc")
    val out = Constraints.check(clean, Seq(
      NotNull("flag"), Unique(Seq("k")), InRange("disc", 0.0, 0.1),
      AcceptedValues("flag", Seq("A", "N", "R")), MinSize(2)))
      .as[(String, Double, Boolean)].collect()
    assert(out.length == 5, "vacuity guard: one verdict per constraint")
    assert(out.forall(_._3), s"all must pass: ${out.mkString(", ")}")
    assert(out.map(_._1).toSeq == out.map(_._1).sorted.toSeq,
      "verdicts come back ordered by constraint name")
  }

  test("an empty table passes vacuously, except min_size") {
    val empty = df.where($"k1" < 0)
    val out = Constraints.check(empty, Seq(
      NotNull("s"), Unique(Seq("k1", "k2")), InRange("disc", 0.0, 0.1),
      AcceptedValues("flag", Seq("A")), MatchesRegex("flag", "[A]"),
      MinSize(1)))
      .as[(String, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("not_null(s)") == (0.0, true))
    assert(out("unique(k1,k2)") == (0.0, true))
    assert(out("in_range(disc)") == (0.0, true))
    assert(out("accepted_values(flag)") == (0.0, true))
    assert(out("matches_regex(flag)") == (1.0, true), "vacuously compliant")
    assert(out("min_size") == (0.0, false), "only min_size can fail empty")
  }

  test("the suite compiles to one scan of the input") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val out = Constraints.check(li, Seq(
      NotNull("l_shipdate"), Unique(Seq("l_orderkey", "l_linenumber")),
      InRange("l_quantity", 1.0, 50.0), MinSize(1)))
    // AQE wraps the physical plan, so count scans in the formatted explain
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // count node-detail headers only (the tree section repeats the name)
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(plan).size
    assert(scans == 1,
      s"constraint suite must be one pass, found $scans scans in:\n$plan")
  }
}
