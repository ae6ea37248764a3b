package graft

import org.apache.spark.sql.SparkSession
import graft.plan.PlanCodec
import graft.ledger.FileLedger
import graft.run.{ConsoleNotifier, PlanRunner, PlanStore}
import java.nio.file.Paths

/** CLI — the engine's trigger paths (X11), replacing the reference's three
  * intake routes (`routing/lambda_function.py:161-189`):
  *
  *   run-now <plan.json> <sfDir> <lakeDir>       one plan, immediately
  *   run-scheduled <planDir> <sfDir> <lakeDir>   every eligible plan in a
  *                                               folder (skips non-.json and
  *                                               names containing "done"),
  *                                               bounded-parallel, then moves
  *                                               each to succeeded/ failed/
  *
  * The ledger lives at <lakeDir>/_ledger.jsonl; idempotency (X6) applies
  * across invocations.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  def run(spark: SparkSession, args: Array[String]): Unit = args.toList match {
    case "run-now" :: planFile :: sfDir :: lakeDir :: Nil =>
      val runner = newRunner(spark, sfDir, lakeDir)
      val plan = PlanCodec.parseFile(Paths.get(planFile))
      val reports = runner.runPlan(plan)
      reports.foreach(r => println(
        s"[graft] ${r.spec.SourceTable} part=${r.spec.MigrationPart}: ${r.status}"))

    case "run-scheduled" :: planDir :: sfDir :: lakeDir :: Nil =>
      val runner = newRunner(spark, sfDir, lakeDir)
      val files = PlanStore.scheduledPlanFiles(Paths.get(planDir))
      println(s"[graft] ${files.size} eligible plan file(s) in $planDir")
      val plans = files.map(PlanCodec.parseFile)
      val results = runner.runPlansParallel(plans)
      files.lazyZip(results).foreach { (file, reports) =>
        val ok = reports.forall(_.status != graft.ledger.RunStatus.Failed)
        val dest = PlanStore.moveProcessed(file, allSucceeded = ok)
        println(s"[graft] ${file.getFileName} -> $dest")
      }

    case other =>
      System.err.println(
        s"""usage:
           |  run-now <plan.json> <sfDir> <lakeDir>
           |  run-scheduled <planDir> <sfDir> <lakeDir>
           |got: ${other.mkString(" ")}""".stripMargin)
      throw new IllegalArgumentException("bad arguments")
  }

  private def newRunner(spark: SparkSession, sfDir: String,
      lakeDir: String): PlanRunner =
    new PlanRunner(spark, sfDir, lakeDir,
      new FileLedger(s"$lakeDir/_ledger.jsonl"), ConsoleNotifier)
}
