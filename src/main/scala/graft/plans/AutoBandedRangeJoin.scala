package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure range join (inner join whose only
  * cross-side predicates are numeric bounds, e.g.
  * `p.x >= r.lo AND p.x < r.hi`) into the binned equi-join of
  * [[graft.operators.RangeJoin.binnedRangeJoin]] — automatically, for ANY
  * query that declares the range predicate, including plain SQL through the
  * query slot (reference: `etl/query_runner.py:32-41`, which accepts
  * arbitrary SQL and would hand Sybase IQ such joins).
  *
  * Spark plans an equality-free inner join as BroadcastNestedLoopJoin —
  * O(|points| x |ranges|) comparisons and one whole side broadcast, which
  * dies at 100 TB. This rule adds a band column `floor(x / w)` to the point
  * side, explodes each range into the bands it covers (a Generate of
  * `sequence(floor(lo/w), floor(hi/w))`), and re-joins on band EQUALITY
  * plus the ORIGINAL predicate — a shuffled hash join with full partition
  * parallelism. A matching (point, range) pair lands in exactly one band
  * (the point's), so no dedup is needed; keeping every original conjunct in
  * the join condition makes the rewrite semantics-preserving regardless of
  * which bounds were used for binning.
  *
  * Opt-in via `spark.graft.rangeJoin.binSize` (same contract as the range
  * join bin size hint in other engines: pick ~ the median range span).
  * Registered by [[graft.GraftExtensions]]; also usable on a live session
  * through `spark.experimental.extraOptimizations`. The rewrite is stable
  * under the optimizer's fixed-point batches: its own output contains a
  * cross-side band equality, which the eligibility check excludes.
  *
  * Caveats: bounds must be numeric (cast to double for binning — exact for
  * the int/date-epoch/price domains this targets); a NaN bound falls in an
  * arbitrary band, matching Spark's own NaN ordering quirks; a range wider
  * than `spark.graft.rangeJoin.maxBinsPerRange` bins raises an error rather
  * than exploding mid-shuffle (same guard as the explicit operator).
  */
object AutoBandedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"
  val MaxBinsKey = "spark.graft.rangeJoin.maxBinsPerRange"

  /** One reading of a cross-side comparison: `point` (all refs on one side)
    * is bounded by `bound` (all refs on the other). `a > b` yields two
    * readings — a lower bound on `a` and an upper bound on `b`.
    */
  private case class BoundOn(point: Expression, pointOnLeft: Boolean,
      bound: Expression, isLower: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // A malformed conf value must not throw from inside the optimizer —
    // that would break EVERY query on the session, not just range joins.
    // Unparseable ⇒ rule disabled, with a one-line warning naming the key.
    def confDouble(key: String, default: Double): Double = {
      val raw = SQLConf.get.getConfString(key, default.toString)
      try raw.toDouble catch {
        case _: NumberFormatException =>
          logWarning(s"ignoring unparseable $key='$raw' " +
            "(expected a number); banded range-join rewrite disabled")
          default
      }
    }
    val w = confDouble(BinSizeKey, 0.0)
    if (w <= 0) return plan
    val maxBins = confDouble(MaxBinsKey, 100000.0).toLong
    if (maxBins <= 0) return plan
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(cond), _) =>
        rewrite(j, cond, w, maxBins).getOrElse(j)
    }
  }

  private def rewrite(j: Join, cond: Expression, w: Double,
      maxBins: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(true)
      else if (e.references.subsetOf(j.right.outputSet)) Some(false)
      else None
    def splitSides(a: Expression, b: Expression): Option[(Boolean, Boolean)] =
      for { sa <- side(a); sb <- side(b); if sa != sb } yield (sa, sb)

    // A cross-side equality already plans as a hash join — nothing to fix.
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => splitSides(a, b).isDefined
      case EqualNullSafe(a, b) => splitSides(a, b).isDefined
      case _ => false
    }
    if (hasEqui) return None

    def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]
    def readings(a: Expression, b: Expression,
        aHasLower: Boolean): Seq[BoundOn] =
      splitSides(a, b).toSeq.flatMap { case (sa, sb) =>
        if (!numeric(a) || !numeric(b)) Nil
        else Seq(BoundOn(a, sa, b, isLower = aHasLower),
          BoundOn(b, sb, a, isLower = !aHasLower))
      }
    val bounds = conjuncts.flatMap {
      case GreaterThan(a, b) => readings(a, b, aHasLower = true)
      case GreaterThanOrEqual(a, b) => readings(a, b, aHasLower = true)
      case LessThan(a, b) => readings(a, b, aHasLower = false)
      case LessThanOrEqual(a, b) => readings(a, b, aHasLower = false)
      case _ => Nil
    }
    // First point expression bounded from both directions defines the bins.
    bounds.groupBy(b => (b.point.canonicalized, b.pointOnLeft)).values
      .collectFirst {
        case bs if bs.exists(_.isLower) && bs.exists(!_.isLower) =>
          build(j, bs.find(_.isLower).get, bs.find(!_.isLower).get, w, maxBins)
      }
  }

  private def build(j: Join, lo: BoundOn, hi: BoundOn, w: Double,
      maxBins: Long): LogicalPlan = {
    def bin(e: Expression): Expression =
      Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType)))
    val (pointPlan, boundPlan) =
      if (lo.pointOnLeft) (j.left, j.right) else (j.right, j.left)
    val pBand = Alias(bin(lo.point), "_graft_band")()
    val newPoint = Project(pointPlan.output :+ pBand, pointPlan)
    val loBin = bin(lo.bound)
    val hiBin = bin(hi.bound)
    // Fail fast on pathological fan-out (open-ended sentinel bounds, or a
    // bin size far below the range spans) instead of dying mid-shuffle.
    val guardedHi = If(
      GreaterThanOrEqual(Subtract(hiBin, loBin), Literal(maxBins)),
      Cast(RaiseError(Literal(
        s"range spans more than $maxBins bins at $BinSizeKey=$w; " +
          "widen the bin size or clean the range")), LongType),
      hiBin)
    val seq = new Sequence(loBin, guardedHi, None,
      Some(SQLConf.get.sessionLocalTimeZone))
    val bandAttr =
      AttributeReference("_graft_band", LongType, nullable = false)()
    val gen =
      Generate(Explode(seq), Nil, outer = false, None, Seq(bandAttr), boundPlan)
    val bandEq = EqualTo(pBand.toAttribute, bandAttr)
    val (nl, nr) = if (lo.pointOnLeft) (newPoint, gen) else (gen, newPoint)
    Project(j.output,
      Join(nl, nr, Inner, Some(And(bandEq, j.condition.get)), j.hint))
  }
}
