package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plan.{PlanCodec, PlanHash}
import graft.operators.Transforms

/** Unit tests for the plan layer: JSON parsing (both shapes, BOM, quirks)
  * and the idempotency-hash recipe (`routing/lambda_function.py:107-111`).
  */
class PlanSpec extends AnyFunSuite {

  val singleJob =
    """{"SourceName":"sybaseiq","SourceDatabase":"iqdemo","SourceSchema":"dbo",
      |"SourceTable":"superstore","Active":true,"MigrationPart":1,
      |"Query":"SELECT * FROM dbo.superstore WHERE [Row ID] <= 4997",
      |"ExpectedAmountOfRecords":4997,"NumPartitions":"8",
      |"LowerBound":"1","UpperBound":"4997",
      |"ColumnForPartitioningOnSpark":"Row ID",
      |"ColumnForPartitioningOnS3":"Order Date"}""".stripMargin

  val sequentialPlan =
    """{"SourceName":"pg","SourceDatabase":"d","SourceSchema":"s",
      |"SourceTable":"t","Active":true,"SequentialMultipleParts":true,
      |"Jobs":[
      |  {"MigrationPart":1,"Query":"SELECT 1","ExpectedAmountOfRecords":10},
      |  {"MigrationPart":2,"Query":"SELECT 2","Active":true}
      |]}""".stripMargin

  test("single-job plan parses with stringified numerics") {
    val p = PlanCodec.parse(singleJob)
    assert(!p.sequential && p.specs.size == 1)
    val s = p.specs.head
    assert(s.SourceTable == "superstore")
    assert(s.NumPartitions.contains(8)) // "8" as string — reference quirk
    assert(s.ExpectedAmountOfRecords.contains(4997L))
    assert(s.isPartitionedRead)
    assert(s.s3PartitionColumn.contains("Order Date"))
  }

  test("BOM-prefixed plan parses (routing/lambda_function.py:21-23)") {
    val p = PlanCodec.parse("﻿" + singleJob)
    assert(p.specs.head.SourceTable == "superstore")
  }

  test("sequential envelope promotes shared fields onto each part") {
    val p = PlanCodec.parse(sequentialPlan)
    assert(p.sequential && p.specs.size == 2)
    assert(p.specs.forall(_.SourceTable == "t"))
    assert(p.specs.map(_.MigrationPart) == Vector(1, 2))
    assert(p.specs.map(_.Query) == Vector("SELECT 1", "SELECT 2"))
  }

  test("inactive plans are filtered (routing/lambda_function.py:25-26)") {
    val p = PlanCodec.parse(singleJob.replace("\"Active\":true", "\"Active\":false"))
    assert(p.activeSpecs.isEmpty)
  }

  test("hash recipe matches python md5(table+part+UPPER(TRIM(query)))") {
    // golden value: hashlib.md5('t1' + '1' + 'SELECT 1'.upper()).hexdigest()
    assert(PlanHash.hashId("t1", 1, "  select 1  ") ==
      PlanHash.hashId("t1", 1, "SELECT 1"))
    assert(PlanHash.hashId("t1", 1, "select 1") !=
      PlanHash.hashId("t1", 2, "select 1"))
    // cross-check against python -c "import hashlib;
    //   print(hashlib.md5(b't11SELECT 1').hexdigest())"
    assert(PlanHash.hashId("t1", 1, "select 1") ==
      "0ba8b24c85930d02f877f77762386fa4")
  }

  test("name normalization is idempotent and catalog-safe (property)") {
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val s = (1 to rnd.nextInt(24)).map(_ => rnd.nextPrintableChar()).mkString
      val n = Transforms.normalizeName(s)
      assert(n.matches("[a-z0-9_]*"), s"bad normalization of '$s' -> '$n'")
      assert(Transforms.normalizeName(n) == n)
    }
    assert(Transforms.normalizeName("Row ID") == "row_id")
    assert(Transforms.normalizeName(" L ReturnFlag ") == "l_returnflag")
  }

  test("coalesce tiering thresholds (sybaseiq_extractor.py:149-154)") {
    assert(Transforms.coalesceTier(0L) == 8)
    assert(Transforms.coalesceTier(49999999L) == 8)
    assert(Transforms.coalesceTier(50000000L) == 16)
    assert(Transforms.coalesceTier(99999999L) == 16)
    assert(Transforms.coalesceTier(100000000L) == 24)
  }

  test("target-size file count scales with volume, min 1") {
    assert(Transforms.filesForTargetSize(0L, 100) == 1)
    assert(Transforms.filesForTargetSize(1000L, 100) == 1)
    // 1e9 rows x 200 B = 200 GB at 512 MB target -> 373 files
    assert(Transforms.filesForTargetSize(1000000000L, 200) == 373)
    // 100 TB at 1 KB rows -> ~200k files, not 24
    val files100TB = Transforms.filesForTargetSize(100000000000L, 1000)
    assert(files100TB > 100000 && files100TB < 300000)
  }
}
