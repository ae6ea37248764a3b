package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plan.PlanCodec
import java.nio.file.{Files, Path, Paths}

/** Parse-compatibility against the reference's own shipped plan files
  * (`/root/reference/MigrationPlans/...`) — a user's existing plan JSONs
  * must load unchanged. Skipped when the reference tree is absent.
  */
class ReferencePlanCompatSpec extends AnyFunSuite {

  private val planDir = Paths.get(
    "/root/reference/MigrationPlans/sybaseiq/migrationplans/run_on_schedule_1")

  private def planFiles: Seq[Path] =
    if (!Files.exists(planDir)) Nil
    else {
      val s = Files.list(planDir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toSeq
          .filter(_.getFileName.toString.endsWith(".json"))
          .sortBy(_.getFileName.toString)
      } finally s.close()
    }

  test("the reference's example plans parse with both parts promoted") {
    assume(planFiles.nonEmpty, "reference plans not present")
    planFiles.foreach { p =>
      val plan = PlanCodec.parseFile(p)
      assert(plan.sequential, s"$p: examples are sequential multi-part")
      assert(plan.specs.size == 2, s"$p: expected 2 Jobs")
      assert(plan.specs.map(_.MigrationPart) == Vector(1, 2))
      plan.specs.foreach { spec =>
        assert(spec.SourceTable.nonEmpty && spec.Query.nonEmpty)
        assert(spec.executionHashId.matches("[0-9a-f]{32}"))
        assert(spec.isPartitionedRead,
          s"$p: examples declare striped reads (NumPartitions + bounds)")
      }
      // parts must produce distinct idempotency hashes
      assert(plan.specs.map(_.executionHashId).distinct.size == 2)
    }
  }
}
