package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.{CommitStore, LeaseLockCommitStore, PosixLinkCommitStore,
  SnapshotLake}

/** 50-way concurrent commit throughput (VERDICT r10 item 6): the
  * reference's X4 ceiling is 50 parallel runs
  * (`CloudFormation/template2.yaml:640-641`); correctness under that
  * concurrency is spec-verified (16-thread races, FileLock admission),
  * but throughput was never measured. Three rows:
  *
  *   1. 50 writers × commitAppend into ONE snapshot-lake table on the
  *      POSIX link(2) backend — the OCC worst case (every commit
  *      contends for the same version counter): commits/s, lost-race
  *      retries, zero lost commits.
  *   2. same on the lease-lock backend (the object-store-portable
  *      protocol: mkdir leases instead of link).
  *   3. 50 PlanRunner plans through runPlansParallel(maxConcurrent=50) —
  *      the X4 control-plane shape end-to-end (catalog SQL → transforms
  *      → LakeWriter → ledger admission): plans/s.
  *
  * `runMain graft.tools.CommitThroughputProbe [sfDir]`.
  */
object CommitThroughputProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val writers = 50

    def commitRow(label: String, store: CommitStore): Unit = {
      val table = java.nio.file.Files
        .createTempDirectory(s"graft_ct_${label}_").resolve("t").toString
      // one tiny pre-staged frame per writer: the probe times the COMMIT
      // protocol, not parquet encode of big payloads
      val frames = (0 until writers).map(i =>
        spark.range(i * 1000L, i * 1000L + 200L).toDF("id")
          .withColumn("w", lit(i)).localCheckpoint(false))
      frames.foreach(_.count())
      val retries0 = SnapshotLake.casRetries.get()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
      val t0 = System.nanoTime()
      try {
        frames.map { f =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = SnapshotLake.commitAppend(f, table, store)
          })
        }.map(_.get())
      } finally pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      val retries = SnapshotLake.casRetries.get() - retries0
      val vs = SnapshotLake.versions(table, store)
      val rows = SnapshotLake.read(spark, table, None, store).count()
      val lost = (vs.size != writers) || (rows != writers * 200L)
      println(f"[commit-probe] $label writers=$writers wall=$sec%.2fs " +
        f"commits_per_s=${writers / sec}%.2f retries=$retries " +
        f"versions=${vs.size} rows=$rows lost=$lost")
    }

    commitRow("posix_link", PosixLinkCommitStore)
    commitRow("lease_lock", new LeaseLockCommitStore())

    // X4 end-to-end: 50 distinct plans, one bounded pool, one lake root
    {
      import graft.plan.PlanCodec
      import graft.ledger.InMemoryLedger
      import graft.run.PlanRunner
      val lake = java.nio.file.Files
        .createTempDirectory("graft_ct_plans_").toString
      val runner = new PlanRunner(spark, sfDir, lake, new InMemoryLedger)
      val plans = (0 until writers).map { i =>
        PlanCodec.parse(
          s"""{"SourceName":"graft","SourceDatabase":"tpch",
             |"SourceSchema":"main","SourceTable":"nation_$i","Active":true,
             |"MigrationPart":1,
             |"Query":"SELECT * FROM nation WHERE n_nationkey % $writers = $i",
             |"ColumnForPartitioningOnS3":""}""".stripMargin)
      }
      val t0 = System.nanoTime()
      val results = runner.runPlansParallel(plans, maxConcurrent = writers)
      val sec = (System.nanoTime() - t0) / 1e9
      val ok = results.flatten.count(_.status ==
        graft.ledger.RunStatus.Succeeded)
      println(f"[commit-probe] plan_runner_50way plans=$writers " +
        f"wall=$sec%.2fs plans_per_s=${writers / sec}%.2f succeeded=$ok")
    }
    spark.stop()
  }
}
