package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sinks.SnapshotLake

/** DataSource V2 connector: snapshot isolation + time travel through the
  * plain `format("snapshot-lake")` / SQL `USING` surface, with Spark's own
  * parquet pushdown intact. */
class SnapshotLakeSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_dsv2_").resolve("t").toString

  test("connector reads the pinned version; default is latest; options validate") {
    val t = freshTable()
    SnapshotLake.commitAppend(
      Seq((1, "a"), (2, "b")).toDF("id", "s").coalesce(1), t)
    SnapshotLake.commitOverwrite(Seq((9, "z")).toDF("id", "s").coalesce(1), t)

    val latest = spark.read.format("snapshot-lake").option("path", t).load()
    assert(latest.as[(Int, String)].collect().toSeq == Seq(9 -> "z"))

    val pinned = spark.read.format("snapshot-lake")
      .option("path", t).option("versionAsOf", "0").load()
    assert(pinned.orderBy("id").as[(Int, String)].collect().toSeq ==
      Seq(1 -> "a", 2 -> "b"))

    val t0 = SnapshotLake.commitTimestamp(t, 0L).get
    val t1 = SnapshotLake.commitTimestamp(t, 1L).get
    if (t1 > t0) // monotone wall clock; skip the assertion on a tie
      assert(spark.read.format("snapshot-lake").option("path", t)
        .option("timestampAsOf", t0.toString).load()
        .orderBy("id").as[(Int, String)].collect().toSeq ==
        Seq(1 -> "a", 2 -> "b"))

    intercept[IllegalArgumentException] {
      spark.read.format("snapshot-lake").option("path", t)
        .option("versionAsOf", "0").option("timestampAsOf", "1").load()
    }
    intercept[IllegalArgumentException] {
      spark.read.format("snapshot-lake").load()
    }
  }

  test("connector scan keeps parquet filter pushdown and column pruning") {
    val t = freshTable()
    SnapshotLake.commitAppend(
      (1 to 1000).map(i => (i, s"n$i", i * 2.0)).toDF("id", "name", "x")
        .coalesce(1), t)
    val q = spark.read.format("snapshot-lake").option("path", t).load()
      .where($"id" > 900).select($"id")
    q.collect()
    val p = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("id"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse("")
    assert(!readSchema.contains("name"),
      s"column pruning through the connector failed: $readSchema")
    assert(q.count() == 100)
  }

  test("SQL INSERT INTO / INSERT OVERWRITE commit through the manifest protocol") {
    val t = freshTable()
    SnapshotLake.commitAppend(
      Seq((1, 10.0)).toDF("id", "v").coalesce(1), t)
    spark.sql(s"""
      CREATE OR REPLACE TEMPORARY VIEW lake_w
      USING `snapshot-lake` OPTIONS (path '$t')""")
    spark.sql("INSERT INTO lake_w VALUES (2, 20.0)")
    // the insert created a REAL commit: a new version, readable through
    // both the connector and the programmatic API, old version intact.
    // The view itself keeps showing the snapshot it resolved at CREATE
    // time (snapshot-view semantics); a fresh resolution sees the head.
    assert(SnapshotLake.versions(t) == Seq(0L, 1L))
    assert(SnapshotLake.read(spark, t).orderBy("id")
      .as[(Int, Double)].collect().toSeq == Seq(1 -> 10.0, 2 -> 20.0))
    assert(spark.sql("SELECT sum(v) FROM lake_w").as[Double].first() == 10.0)
    assert(spark.read.format("snapshot-lake").option("path", t).load()
      .agg(sum($"v")).as[Double].first() == 30.0)
    spark.sql("INSERT OVERWRITE lake_w VALUES (9, 90.0)")
    assert(SnapshotLake.versions(t) == Seq(0L, 1L, 2L))
    assert(spark.read.format("snapshot-lake").option("path", t).load()
      .agg(sum($"v")).as[Double].first() == 90.0)
    assert(SnapshotLake.read(spark, t, Some(1L)).count() == 2) // time travel
    // a version-pinned view refuses writes
    spark.sql(s"""
      CREATE OR REPLACE TEMPORARY VIEW lake_w0
      USING `snapshot-lake` OPTIONS (path '$t', versionAsOf '0')""")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO lake_w0 VALUES (3, 30.0)") }
    assert(e.getMessage.contains("version-pinned"), e.getMessage)
    // and no stray files landed outside the manifest protocol
    assert(SnapshotLake.read(spark, t, Some(0L)).count() == 1)
  }

  test("pure-SQL surface: temporary view USING snapshot-lake, version-pinned") {
    val t = freshTable()
    SnapshotLake.commitAppend(
      Seq((1, 10.0), (2, 20.0)).toDF("id", "v").coalesce(1), t)
    SnapshotLake.commitAppend(Seq((3, 30.0)).toDF("id", "v").coalesce(1), t)
    spark.sql(s"""
      CREATE OR REPLACE TEMPORARY VIEW lake_v0
      USING `snapshot-lake` OPTIONS (path '$t', versionAsOf '0')""")
    spark.sql(s"""
      CREATE OR REPLACE TEMPORARY VIEW lake_head
      USING `snapshot-lake` OPTIONS (path '$t')""")
    assert(spark.sql("SELECT sum(v) FROM lake_v0").as[Double].first() == 30.0)
    assert(spark.sql("SELECT sum(v) FROM lake_head").as[Double].first() == 60.0)
    // a commit AFTER view creation: BOTH views keep the snapshot they
    // resolved at CREATE time (snapshot-view semantics — a reader's world
    // never changes under it); new resolutions see the new head
    SnapshotLake.commitAppend(Seq((4, 40.0)).toDF("id", "v").coalesce(1), t)
    assert(spark.sql("SELECT sum(v) FROM lake_v0").as[Double].first() == 30.0)
    assert(spark.sql("SELECT sum(v) FROM lake_head").as[Double].first() == 60.0)
    assert(spark.read.format("snapshot-lake").option("path", t).load()
      .agg(sum($"v")).as[Double].first() == 100.0)
  }
  test("whole-table COUNT/MIN/MAX answer from metadata as a LocalTableScan") {
    val t = freshTable()
    SnapshotLake.commitAppend(
      (1 to 500).map(i => (i, i * 1.5)).toDF("id", "x").coalesce(2), t,
      statsCols = Seq("x"))
    SnapshotLake.commitAppend(
      (501 to 700).map(i => (i, i * 1.5)).toDF("id", "x").coalesce(1), t,
      statsCols = Seq("x"))
    val v = spark.read.format("snapshot-lake").option("path", t).load()
    val q = v.agg(count(lit(1)).as("n"), min(col("x")).as("mn"),
      max(col("x")).as("mx"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected metadata answer:\n$plan")
    assert(!plan.contains("BatchScan"), s"data files were opened:\n$plan")
    assert(q.as[(Long, Double, Double)].head() == ((700L, 1.5, 1050.0)))
  }

  test("metadata aggregate refuses on filters, bad columns, or missing stats") {
    val t = freshTable()
    SnapshotLake.commitAppend(
      (1 to 100).map(i => (i, i * 1.0, s"s$i")).toDF("id", "x", "s")
        .coalesce(1), t, statsCols = Seq("x"))

    // WHERE present -> metadata would be wrong -> parquet scan, same answer
    val filtered = spark.read.format("snapshot-lake").option("path", t).load()
      .where(col("id") <= 10).agg(max(col("x")).as("mx"))
    assert(filtered.queryExecution.executedPlan.toString
      .contains("BatchScan"))
    assert(filtered.as[Double].head() == 10.0)

    // no sidecar stats for id -> falls back; result still exact
    val noStats = spark.read.format("snapshot-lake").option("path", t).load()
      .agg(min(col("id")).as("mn"))
    assert(noStats.queryExecution.executedPlan.toString
      .contains("BatchScan"))
    assert(noStats.as[Int].head() == 1)

    // string min is never metadata-answerable here
    val str = spark.read.format("snapshot-lake").option("path", t).load()
      .agg(min(col("s")).as("mn"))
    assert(str.queryExecution.executedPlan.toString.contains("BatchScan"))
    assert(str.as[String].head() == "s1")

    // GROUP BY is never metadata-answerable
    val grouped = spark.read.format("snapshot-lake").option("path", t).load()
      .groupBy(col("s")).agg(max(col("x"))).limit(1)
    assert(grouped.queryExecution.executedPlan.toString
      .contains("BatchScan"))
  }

  test("metadata aggregate respects version pinning") {
    val t = freshTable()
    SnapshotLake.commitAppend(Seq((1, 5.0)).toDF("id", "x").coalesce(1), t,
      statsCols = Seq("x"))
    SnapshotLake.commitAppend(Seq((2, 50.0)).toDF("id", "x").coalesce(1), t,
      statsCols = Seq("x"))
    val pinned = spark.read.format("snapshot-lake").option("path", t)
      .option("versionAsOf", "0").load()
      .agg(count(lit(1)).as("n"), max(col("x")).as("mx"))
    assert(pinned.queryExecution.executedPlan.toString
      .contains("LocalTableScan"))
    assert(pinned.as[(Long, Double)].head() == ((1L, 5.0)))
  }
}
