package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Writes EXPLAIN.md: formatted physical plans of headline queries, as
  * executed (AQE final where applicable) — the plan-quality evidence in
  * reviewable form. Run: `sbt "runMain graft.Explain"`.
  *
  * The headline list is DERIVED from the `HL(...)` tags at the query
  * definition sites in [[SparkEntry.queries]] — there is no second list to
  * drift; tagging a new flagship query is the one and only step.
  */
object Explain
    extends org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {
  /** Row bound of a BroadcastNestedLoopJoin's BUILD side — the shared
    * audit primitive behind the EXPLAIN.md annotations and
    * PlanAuditSpec's whole-surface gate. Strips AQE-stage and
    * broadcast/reuse wrappers, then bounds the build input by its
    * logical plan's STATIC `maxRows` when Catalyst can prove one (the
    * legal builds are global scalar aggregates — provably ≤1 row — so
    * the common case never executes anything); otherwise re-plans the
    * build's logical subtree as its own query and counts `bound+1` rows
    * (executing the RAW physical subtree instead would CCE: pre-AQE
    * stage trees lack the columnar→row transitions that stage
    * materialization inserts). Returns bound+1 when the side is
    * unexecutable or has no logical link — callers treat that as a
    * gate failure, never a pass. */
  private[graft] def bnljBuildRows(spark: SparkSession,
      j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec,
      bound: Int): Int = {
    val buildPlan = j.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
      case _ => j.right
    }
    def inner(p: org.apache.spark.sql.execution.SparkPlan):
        org.apache.spark.sql.execution.SparkPlan = p match {
      case q: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => inner(q.plan)
      case e: org.apache.spark.sql.execution.exchange
          .BroadcastExchangeExec => inner(e.child)
      case r: org.apache.spark.sql.execution.exchange
          .ReusedExchangeExec => inner(r.child)
      case p => p
    }
    val sub = inner(buildPlan)
    val logical = linkedLogical(sub)
    logical.flatMap(_.maxRows) match {
      case Some(m) => math.min(m, (bound + 1).toLong).toInt
      case None => logical match {
        case Some(l) =>
          try spark.sessionState.executePlan(l).executedPlan
            .executeTake(bound + 1).length
          catch { case _: Throwable => bound + 1 }
        case None => bound + 1
      }
    }
  }

  /** Find the logical link that upper-bounds a (stripped) physical build
    * root's row count. Descends to a DESCENDANT's logicalLink ONLY through
    * single-child wrappers that provably never increase row count
    * (project / filter / codegen plumbing / sort / limit): the linked
    * subtree's maxRows is then an upper bound on the root's rows. Any
    * other node in between (join, generate, union, ...) could multiply
    * rows ABOVE the linked subtree, so the first-link-found bound would
    * under-count and the gate would falsely pass an oversized build
    * (ADVICE r12) — fail closed (None → callers use bound+1) instead.
    * Exposed private[graft] so PlanAuditSpec's planted-offender control
    * can drive the multiplying-node case directly. */
  @annotation.tailrec
  private[graft] def linkedLogical(
      p: org.apache.spark.sql.execution.SparkPlan):
      Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
    if (p.logicalLink.isDefined) p.logicalLink
    else p match {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        linkedLogical(w.child)
      case i: org.apache.spark.sql.execution.InputAdapter =>
        linkedLogical(i.child)
      case c: org.apache.spark.sql.execution.ColumnarToRowExec =>
        linkedLogical(c.child)
      case pr: org.apache.spark.sql.execution.ProjectExec =>
        linkedLogical(pr.child)
      case f: org.apache.spark.sql.execution.FilterExec =>
        linkedLogical(f.child)
      case s: org.apache.spark.sql.execution.SortExec =>
        linkedLogical(s.child)
      case l: org.apache.spark.sql.execution.LocalLimitExec =>
        linkedLogical(l.child)
      case g: org.apache.spark.sql.execution.GlobalLimitExec =>
        linkedLogical(g.child)
      case _ => None
    }

  /** The SECOND legal BroadcastNestedLoopJoin class (beyond the ≤16-row
    * scalar metric-panel cross): gates whose exact-baseline side is
    * `Similarity.bruteForceBatchTopK` — a crossJoin against the
    * BROADCAST QUERY SAMPLE (1-in-25 of the corpus at the driver SFs:
    * 20–80 rows). The build is O(sample) by the operator's documented
    * contract ("at 100 TB you run it only on samples — the |corpus|·|Q|
    * cosine sweep is the thing the indexed paths exist to avoid"), never
    * O(corpus); the operator under test in each gate is the INDEXED
    * path, whose own plan is BNLJ-free. Audited at [[SampleBuildBound]]
    * rows instead of 16. Shared by the EXPLAIN.md annotations and
    * PlanAuditSpec's whole-surface sweep so the two can't drift. */
  private[graft] val SampleBuildGates: Set[String] = Set(
    "sim_ann_ivf_batch", "sim_ann_ivfbq_batch", "sim_ann_ivfpq_batch",
    "sim_ann_ivfsq_batch", "sim_ann_pq_batch",
    "sim_ann_ivf_filtered", "sim_ann_ivfpq_filtered",
    "sim_ann_ivfsq_filtered")
  private[graft] val SampleBuildBound = 1024
  private[graft] def bnljBound(queryName: String): Int =
    if (SampleBuildGates(queryName)) SampleBuildBound else 16

  def Headline: Seq[String] = {
    val hs = SparkEntry.headline
    require(hs.nonEmpty, "no HL-tagged queries in SparkEntry.queries")
    val missing = hs.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"HL tags without a query: $missing")
    hs
  }

  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "EXPLAIN.md"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# EXPLAIN — formatted physical plans of headline queries\n\n")
    sb.append(s"Generated by `graft.Explain` on `$sfDir`. Executed plans " +
      "(AQE final): look for `PushedFilters`/`ReadSchema` on scans, " +
      "`BroadcastHashJoin` on dimension joins, `TakeOrderedAndProject` " +
      "for top-k, `[codegen id : n]` spans, and the absence of " +
      "`CartesianProduct`.\n")
    Headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(FormattedMode).take(8000))
      sb.append("\n```\n")
      // Annotate every BroadcastNestedLoopJoin in the section against the
      // PlanAuditSpec build-side gate (VERDICT r11 item 7): the 1-row
      // metric-panel crosses read as red flags until cross-referenced, so
      // the audit result rides in the document itself — a BNLJ section
      // with no annotation (or a FAILED one) is a regression.
      // collectWithSubqueries comes from AdaptiveSparkPlanHelper, NOT
      // TreeNode: AdaptiveSparkPlanExec is a LeafExecNode, so plain tree
      // traversal stops at every AQE boundary and sees zero joins.
      val bnljs = collectWithSubqueries(df.queryExecution.executedPlan) {
        case j: org.apache.spark.sql.execution.joins
            .BroadcastNestedLoopJoinExec => j
      }
      if (bnljs.nonEmpty) {
        val bound = bnljBound(name)
        val sizes = bnljs.map(j => bnljBuildRows(spark, j, bound))
        val tier =
          if (SampleBuildGates(name))
            "bounded query-sample broadcast — the brute-force " +
              "exact-baseline side, O(sample) by contract, never O(corpus)"
          else "scalar metric-panel cross, broadcasting a constant, not data"
        val verdict =
          if (sizes.forall(_ <= bound))
            s"PASSED the PlanAuditSpec build-side gate (≤$bound rows: " +
              s"${sizes.mkString(", ")} — $tier)"
          else s"FAILED the ≤$bound-row build gate: ${sizes.mkString(", ")}"
        sb.append(s"\n> BNLJ audit: ${bnljs.size} " +
          s"BroadcastNestedLoopJoin node(s); build side $verdict.\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[explain] wrote $out")
    spark.stop()
  }
}
