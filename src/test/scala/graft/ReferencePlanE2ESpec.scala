package graft

import java.sql.DriverManager
import graft.ledger.{InMemoryLedger, RunStatus}
import graft.plan.PlanCodec
import graft.run.{BufferNotifier, PlanRunner}
import graft.sources.{JdbcCredentials, StaticCredentialsProvider}

/** EXECUTES the reference's own shipped plan JSONs end to end —
  * `example1-sybase.json` and `example2-postgre.json` parsed verbatim from
  * `/root/reference/MigrationPlans/...`, run through [[PlanRunner]] against
  * Derby-hosted fixture tables shaped like the plans' sources (superstore /
  * tb_agg_sales), landing in a lake tempdir. This closes the loop that
  * [[ReferencePlanCompatSpec]] only parses.
  *
  * The ONLY fields adapted are the ones the reference itself documents as
  * per-engine swaps (`adapt_postgre.json:2-5`): the JDBC URL/driver, and the
  * query's source-dialect spellings (Sybase `[Row ID]` bracket quoting and
  * the `iqdemo.dba.` catalog prefix have no Derby equivalent). Bounds,
  * NumPartitions, partition columns, expected counts, part order and the
  * rest run exactly as shipped.
  */
class ReferencePlanE2ESpec extends SparkSpec {

  private val planDir = java.nio.file.Paths.get(
    "/root/reference/MigrationPlans/sybaseiq/migrationplans/run_on_schedule_1")

  private def creds = StaticCredentialsProvider(JdbcCredentials("", "",
    Some("org.apache.derby.iapi.jdbc.AutoloadedDriver")))

  /** Superstore-shaped Derby DB: 9994 rows, "Row ID" 1..9994 (the real
    * dataset's row count — the plan's 4997/4997 split covers it exactly),
    * order_date spread over three years for the K2 date layout.
    */
  private lazy val superstoreUrl: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ss_derby_")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE tb_tableau_superstore (
      "Row ID" INT NOT NULL PRIMARY KEY, order_date DATE,
      region VARCHAR(16), sales DOUBLE)""")
    val ps = conn.prepareStatement(
      "INSERT INTO tb_tableau_superstore VALUES (?, ?, ?, ?)")
    (1 to 9994).foreach { i =>
      ps.setInt(1, i)
      ps.setDate(2, java.sql.Date.valueOf(
        f"${2014 + i % 3}%d-${1 + i % 12}%02d-${1 + i % 28}%02d"))
      ps.setString(3, s"r${i % 4}")
      ps.setDouble(4, i * 1.25)
      ps.addBatch()
      if (i % 1000 == 0) ps.executeBatch()
    }
    ps.executeBatch()
    st.close(); conn.close()
    url
  }

  /** tb_agg_sales-shaped Derby DB (example2): reference_date spans both
    * parts' BETWEEN windows; row count deliberately differs from the plan's
    * ExpectedAmountOfRecords (1.096M) so the run exercises the third
    * reconciliation state — SUCCEEDED WITH WARNING — on the reference's own
    * numbers.
    */
  private lazy val aggSalesUrl: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_as_derby_")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("""CREATE TABLE transactions.tb_agg_sales (
      id INT NOT NULL PRIMARY KEY, reference_date DATE,
      id_branch VARCHAR(8), amount DOUBLE)""")
    val ps = conn.prepareStatement(
      "INSERT INTO transactions.tb_agg_sales VALUES (?, ?, ?, ?)")
    (1 to 3000).foreach { i =>
      ps.setInt(1, i)
      // half in [2010, 2016-01-01], half in [2016-01-02, 2021]
      val y = if (i % 2 == 0) 2010 + i % 6 else 2016 + i % 6
      val moDay = f"${1 + i % 12}%02d-${2 + i % 27}%02d"
      ps.setDate(2, java.sql.Date.valueOf(s"$y-$moDay"))
      ps.setString(3, s"b${i % 5}")
      ps.setDouble(4, i * 0.5)
      ps.addBatch()
      if (i % 1000 == 0) ps.executeBatch()
    }
    ps.executeBatch()
    st.close(); conn.close()
    url
  }

  test("example1-sybase.json runs end to end: 4997/4997 split, ledger, " +
      "K2 date layout, exact reconciliation") {
    assume(java.nio.file.Files.exists(planDir), "reference tree not present")
    val shipped = PlanCodec.parseFile(planDir.resolve("example1-sybase.json"))
    assert(shipped.sequential && shipped.specs.size == 2)
    // the documented per-engine adaptation (adapt_postgre.json): URL +
    // dialect spellings; everything else runs as shipped
    val plan = shipped.copy(specs = shipped.specs.map(sp => sp.copy(
      JDBCConnectionString = Some(superstoreUrl),
      Query = sp.Query
        .replace("iqdemo.dba.", "")
        .replace("[Row ID]", "\"Row ID\""))))

    val lake = java.nio.file.Files.createTempDirectory("graft_ss_lake_").toString
    val ledger = new InMemoryLedger
    val notifier = new BufferNotifier
    val runner = new PlanRunner(spark, sf0001, lake, ledger, notifier,
      credentials = creds)
    val reports = runner.runPlan(plan)

    // both parts succeed with EXACT reconciliation (4997 = 4997)
    assert(reports.map(_.status) == Seq(RunStatus.Succeeded, RunStatus.Succeeded),
      reports.map(_.error))
    assert(reports.forall(_.reconciliation.exists(r =>
      r.ok && r.expected.contains(4997L) && r.actual == 4997L)))

    // the split semantics: part 1 is "Row ID" <= 4997, part 2 the rest —
    // together exactly the table, no overlap
    val landed = spark.read.parquet(s"$lake/sybaseiq/dba/tb_tableau_superstore")
    assert(landed.count() == 9994)
    import org.apache.spark.sql.functions.col
    assert(landed.select(col("row_id")).distinct().count() == 9994,
      "parts must not overlap")

    // K2: order_date is a DATE → unpadded year/month/day layout
    val dirs = new java.io.File(s"$lake/sybaseiq/dba/tb_tableau_superstore").list()
    assert(dirs.exists(_.startsWith("year=")), dirs.toSeq.toString)

    // ledger: one row per part hash, terminal SUCCEEDED, counts + schema
    val entries = ledger.all.filter(_.sourceTable == "tb_tableau_superstore")
    assert(entries.size == 2)
    assert(entries.forall(e => e.status == RunStatus.Succeeded &&
      e.rowCount.contains(4997L) && e.expectedRows.contains(4997L) &&
      e.schemaTree.exists(_.nonEmpty)))
    assert(entries.map(_.executionHashId).toSet ==
      plan.specs.map(_.executionHashId).toSet)

    // notifications: plain SUCCEEDED subjects (exact reconcile)
    val subjects = notifier.messages.map(_._1)
    assert(subjects.count(_ == "Extraction of tb_tableau_superstore SUCCEEDED") == 2,
      subjects.toString)

    // X6 idempotency on the reference's own hash recipe: a re-run of the
    // same shipped plan skips both parts
    val again = runner.runPlan(plan)
    assert(again.map(_.status) == Seq(RunStatus.Skipped, RunStatus.Skipped))
    assert(landed.count() == 9994, "skipped re-run must not double-land")
  }

  test("example2-postgre.json runs end to end: date-striped read, K3 " +
      "column layout, SUCCEEDED WITH WARNING reconciliation") {
    assume(java.nio.file.Files.exists(planDir), "reference tree not present")
    val shipped = PlanCodec.parseFile(planDir.resolve("example2-postgre.json"))
    assert(shipped.sequential && shipped.specs.size == 2)
    // example2's URL is literally "jdbc:postgresql:" — the engine swap the
    // reference documents; the query runs as shipped (the transactions.
    // schema exists in Derby too)
    val plan = shipped.copy(specs = shipped.specs.map(sp => sp.copy(
      JDBCConnectionString = Some(aggSalesUrl))))

    val lake = java.nio.file.Files.createTempDirectory("graft_as_lake_").toString
    val ledger = new InMemoryLedger
    val notifier = new BufferNotifier
    val runner = new PlanRunner(spark, sf0001, lake, ledger, notifier,
      credentials = creds)
    val reports = runner.runPlan(plan)

    // both parts SUCCEED, but actual ≠ ExpectedAmountOfRecords (1.096M in
    // the shipped plan vs the 3000-row fixture) → the third reconciliation
    // state on the reference's own numbers
    assert(reports.map(_.status) == Seq(RunStatus.Succeeded, RunStatus.Succeeded),
      reports.map(_.error))
    assert(reports.forall(_.reconciliation.exists(r => !r.ok)))
    val subjects = notifier.messages.map(_._1)
    assert(subjects.count(
      _ == "Extraction of tb_agg_sales SUCCEEDED WITH WARNING") == 2,
      subjects.toString)

    // the two BETWEEN windows partition the fixture exactly
    val landed = spark.read.parquet(s"$lake/postgres/transactions/tb_agg_sales")
    assert(landed.count() == 3000)

    // K3: id_branch is a VARCHAR → single-column Hive layout
    val dirs = new java.io.File(s"$lake/postgres/transactions/tb_agg_sales").list()
    assert(dirs.exists(_.startsWith("id_branch=")), dirs.toSeq.toString)

    // ledger terminal states with the shipped expectations recorded
    val entries = ledger.all.filter(_.sourceTable == "tb_agg_sales")
    assert(entries.size == 2)
    assert(entries.forall(e => e.status == RunStatus.Succeeded &&
      e.expectedRows.exists(_ > 1000000L)))
  }
}
