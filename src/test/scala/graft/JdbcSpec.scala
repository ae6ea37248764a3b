package graft

import java.sql.DriverManager
import graft.plan.PlanCodec
import graft.ledger.{InMemoryLedger, RunStatus}
import graft.run.{BufferNotifier, PlanRunner}
import graft.sources.{JdbcCredentials, JdbcSource, JdbcSourceConfig,
  StaticCredentialsProvider}

/** Real JDBC reads (S1 striped / S2 single-stream) against an embedded
  * Apache Derby database — the genuine RDBMS ingest path the reference runs
  * against Sybase IQ/Postgres, exercised end-to-end including a full
  * JDBC-sourced plan through PlanRunner into the lake.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  lazy val dbUrl: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby_")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      "CREATE TABLE sales (id INT NOT NULL, region VARCHAR(16), amount DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO sales VALUES (?, ?, ?)")
    (1 to 1000).foreach { i =>
      ps.setInt(1, i)
      ps.setString(2, s"r${i % 5}")
      ps.setDouble(3, i * 1.5)
      ps.addBatch()
    }
    ps.executeBatch()
    st.close(); conn.close()
    url
  }

  private def cfg = JdbcSourceConfig(dbUrl, "", "",
    Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"))

  test("S2 single-stream JDBC read returns the full result") {
    val df = JdbcSource.readSingle(spark, cfg, "SELECT * FROM sales")
    assert(df.count() == 1000)
    assert(df.columns.map(_.toLowerCase).toSet == Set("id", "region", "amount"))
  }

  test("S1 striped JDBC read: numPartitions stripes, complete union") {
    val df = JdbcSource.readPartitioned(spark, cfg,
      "SELECT * FROM sales WHERE amount > 0", "id", "1", "1000", 4)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000)
    // out-of-stride values are still read (first/last stripes unbounded)
    val df2 = JdbcSource.readPartitioned(spark, cfg,
      "SELECT * FROM sales", "id", "200", "300", 3)
    assert(df2.count() == 1000)
  }

  test("full JDBC-sourced plan lands in the lake with audit columns (S1→K3)") {
    val lake = java.nio.file.Files.createTempDirectory("graft_jdbc_lake_").toString
    val plan = PlanCodec.parse(
      s"""{"SourceName":"derby","SourceDatabase":"db","SourceSchema":"app",
         |"SourceTable":"sales","Active":true,"MigrationPart":1,
         |"Query":"SELECT * FROM sales WHERE id <= 500",
         |"ExpectedAmountOfRecords":500,
         |"NumPartitions":4,"LowerBound":"1","UpperBound":"500",
         |"ColumnForPartitioningOnSpark":"id",
         |"ColumnForPartitioningOnS3":"region",
         |"JDBCConnectionString":"$dbUrl",
         |"CredentialsSecretArn":"unused"}""".stripMargin)
    val runner = new PlanRunner(spark, sf0001, lake, new InMemoryLedger,
      new BufferNotifier,
      credentials = StaticCredentialsProvider(JdbcCredentials("", "",
        Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"))))
    val report = runner.runPlan(plan).head
    assert(report.status == RunStatus.Succeeded, report.error)
    assert(report.reconciliation.exists(_.ok))
    val landed = spark.read.parquet(s"$lake/derby/app/sales")
    assert(landed.count() == 500)
    assert(landed.columns.contains("migration_executionhashid"))
    // K3 single-column layout on the normalized S3 partition column
    val dirs = new java.io.File(s"$lake/derby/app/sales").list()
    assert(dirs.exists(_.startsWith("region=")), dirs.toSeq.toString)
  }
}
