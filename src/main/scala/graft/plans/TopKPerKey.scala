package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

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
  * (1-1000). BOTH sides are hard-bounded by
  * `spark.graft.topk.maxKeysPerPartition` (default 100k). Above it the
  * partial side streams untracked-key rows through to the shuffle
  * unchanged (the partial heap is only a row-count optimization; the final
  * exec re-applies exact top-k). The final side cannot pass through — it
  * must emit exact answers — so overflow-key rows route to a
  * disk-spillable sort on (keys, order) and stream back key-clustered
  * after the drain, where exact per-key top-k is a counting pass: the
  * same degradation WindowExec's external sort provides, paid only by the
  * keys past the cap. Extreme key cardinality on a skewed shuffle
  * partition therefore spills instead of OOMing.
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
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "spillRows" -> SQLMetrics.createMetric(sparkContext,
      "rows routed to the spillable sort (final-side key overflow)"))

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
    val spillRowsMetric = longMetric("spillRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(sortOrder, childOutput)
      // max-heap under the sort order: head = worst row currently kept
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      // FINAL-side overflow sink, created only if the key map actually
      // fills: a disk-spillable sort on (keys ++ order). insertRow copies
      // the record into sorter-managed (spillable) pages, so the iterator's
      // row reuse is safe without a per-row copy. Cleanup is registered on
      // task completion by the sorter itself.
      var spill: UnsafeExternalRowSorter = null
      lazy val toUnsafe = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
      def spillSorter(): UnsafeExternalRowSorter = {
        if (spill == null) {
          val schema = StructType(childOutput.map(a =>
            StructField(a.name, a.dataType, a.nullable)))
          val spillOrd: Ordering[InternalRow] = new LazilyGeneratedOrdering(
            keyExprs.map(SortOrder(_, Ascending)) ++ sortOrder, childOutput)
          // constant prefix ⇒ every comparison falls through to the full
          // record ordering; radix sort needs a real prefix, so off
          val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
            private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
            override def computePrefix(row: InternalRow) = {
              p.value = 0L; p.isNull = false; p
            }
          }
          spill = UnsafeExternalRowSorter.create(schema, spillOrd,
            PrefixComparators.LONG, prefixComputer,
            4L * 1024 * 1024, /* canUseRadixSort = */ false)
        }
        spill
      }
      val passThrough = iter.flatMap { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(q) =>
            if (q.size < kLocal) q.enqueue(row.copy())
            else if (rowOrd.compare(row, q.head) < 0) {
              q.dequeue(); q.enqueue(row.copy())
            }
            None
          case None if heaps.size >= maxKeys && isPartial =>
            numOutputRows += 1
            Some(row) // overflow: emit lazily, no buffering
          case None if heaps.size >= maxKeys =>
            spillRowsMetric += 1
            spillSorter().insertRow(row match {
              case u: UnsafeRow => u
              case r => toUnsafe(r)
            })
            None
          case None =>
            val q = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            q.enqueue(row.copy())
            heaps.update(key.copy(), q)
            None
        }
      }
      def flushHeaps: Iterator[InternalRow] = heaps.iterator.flatMap { case (_, q) =>
        numOutputRows += q.size
        q.dequeueAll.reverseIterator // best-first within the key
      }
      // Overflow keys stream back key-clustered and order-sorted: exact
      // top-k is a counting pass with one key-change comparison per row.
      def flushSpill: Iterator[InternalRow] =
        if (spill == null) Iterator.empty
        else {
          var prevKey: UnsafeRow = null
          var taken = 0
          spill.sort().flatMap { row =>
            val key = keyProj(row)
            if (prevKey == null || key != prevKey) {
              prevKey = key.copy(); taken = 0
            }
            if (taken < kLocal) {
              taken += 1; numOutputRows += 1; Some(row)
            } else None
          }
        }
      // ++ is by-name: heap/spill flushes build only after the drain
      passThrough ++ flushHeaps ++ flushSpill
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
