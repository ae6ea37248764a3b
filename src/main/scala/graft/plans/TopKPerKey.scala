package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Top-k rows per key as a FIRST-CLASS physical operator — the (c) tier of
  * the custom-operator ladder: logical node + strategy + SparkPlan,
  * registered by [[graft.GraftExtensions]].
  *
  * The declarative form (`row_number() OVER (PARTITION BY key ORDER BY ord)
  * <= k`) shuffles EVERY input row to its key's partition and sorts it,
  * because WindowExec needs the whole group. For "top 3 orders per
  * customer over 100 TB of orders" that is a full-data shuffle for an
  * output that is at most `k x n_keys` rows. This operator runs a bounded
  * heap per key inside each input partition first (the classic
  * partial-aggregation move, applied to top-k, which Spark only has for
  * global limits via TakeOrderedAndProject), so at most `k` rows PER KEY
  * PER PARTITION reach the shuffle — for high-fanout keys that is the
  * difference between shuffling the table and shuffling the answer.
  *
  * Semantics: the first `k` rows of each key group under `order`. Supply a
  * TOTAL order (include a unique tiebreak column) for deterministic
  * output — ties at the k boundary are otherwise broken by partition
  * layout, exactly as in the window form.
  *
  * Memory: one k-sized heap per distinct key per input partition
  * (map side) / per key per shuffle partition (final); k is expected small
  * (1-1000). The partial side is HARD-BOUNDED by
  * `spark.graft.topk.maxKeysPerPartition` (default 100k): above it,
  * untracked-key rows stream through to the shuffle unchanged — extreme
  * cardinality degrades to the plain shuffle instead of OOMing, because
  * the final exec re-applies exact top-k either way.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

/** Plans [[TopKPerKey]] as partial + final [[TopKPerKeyExec]]; the final's
  * required ClusteredDistribution makes EnsureRequirements insert the
  * (k-rows-per-key-per-partition) shuffle — or elide it entirely when the
  * child is already hash-partitioned on the keys (bucketed/pre-shuffled
  * inputs join the answer for free).
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val kLocal = k
    val isPartial = partial
    // Memory bound for the PARTIAL side: the map holds at most maxKeys
    // k-row heaps per input partition; once full, rows of untracked keys
    // PASS THROUGH to the shuffle unchanged. Correct by construction — the
    // partial heap is a row-count optimization, and the final exec
    // re-applies exact top-k per key — so extreme key cardinality degrades
    // to the plain shuffle instead of OOMing the map side. The final side
    // is exact and keeps every key it owns (cardinality/shuffle-partitions
    // keys, the same state a hash aggregate holds).
    val maxKeys =
      conf.getConfString("spark.graft.topk.maxKeysPerPartition", "100000").toInt
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(sortOrder, childOutput)
      // max-heap under the sort order: head = worst row currently kept
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      val passThrough = iter.flatMap { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(q) =>
            if (q.size < kLocal) q.enqueue(row.copy())
            else if (rowOrd.compare(row, q.head) < 0) {
              q.dequeue(); q.enqueue(row.copy())
            }
            None
          case None if isPartial && heaps.size >= maxKeys =>
            numOutputRows += 1
            Some(row) // overflow: emit lazily, no buffering
          case None =>
            val q = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            q.enqueue(row.copy())
            heaps.update(key.copy(), q)
            None
        }
      }
      def flush: Iterator[InternalRow] = heaps.iterator.flatMap { case (_, q) =>
        numOutputRows += q.size
        q.dequeueAll.reverseIterator // best-first within the key
      }
      passThrough ++ flush // ++ is by-name: flush builds after the drain
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
}

/** DataFrame-level entry point. Works with or without the
  * `spark.sql.extensions=graft.GraftExtensions` wiring — embedded callers
  * get the strategy via `spark.experimental.extraStrategies` (idempotent).
  */
object TopK {
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val analyzed = df.queryExecution.analyzed
    import org.apache.spark.sql.GraftSqlBridge
    val keys = keyCols.map(c => GraftSqlBridge.expression(df.col(c)))
    val order = orderBy.map(GraftSqlBridge.expression).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    GraftSqlBridge.ofRows(spark, TopKPerKey(keys, order, k, analyzed))
  }
}
