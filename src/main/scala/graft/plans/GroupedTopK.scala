package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.SparkSessionExtensions

/** Grouped top-k as a first-class operator: for each value of `keys`, keep
  * the `k` smallest rows under `order` (ties broken by the order itself —
  * callers wanting determinism pass a total order, exactly as with
  * row_number()).
  *
  * Why a custom operator: this operator runs a bounded per-key heap BEFORE
  * the exchange ([[GroupedTopKPartialExec]]) so at most k rows per key per
  * input partition are ever shuffled, then the same heap after it
  * ([[GroupedTopKFinalExec]]) — the partial/final aggregation pattern
  * applied to top-k. Spark 3.5+'s native WindowGroupLimit bounds the
  * window form's shuffle the same way (measured on this Spark 4.1), so the
  * differentiators are CPU and generality, not shuffle volume: the heap is
  * O(n log k) with NO full partition sort on either side of the exchange
  * (the native path sorts every input partition before its partial limit
  * and re-sorts after for WindowExec), there is no post-shuffle window
  * evaluation at all, and one operator covers both shapes: empty `keys`
  * degrade to a correct GLOBAL top-k (AllTuples), the same bounded
  * per-partition shape orderBy().limit(k)'s TakeOrderedAndProject plans.
  *
  * The full custom-operator stack: logical node → strategy → partial+final
  * physical plans, registered via [[GraftExtensions]]
  * (`injectPlannerStrategy`) or `spark.experimental.extraStrategies`.
  */
final case class GroupedTopK(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive: $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopK =
    copy(child = newChild)
}

object GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopK(keys, order, k, child) =>
      GroupedTopKFinalExec(keys, order, k,
        GroupedTopKPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Shared per-partition bounded-heap pass. The heap itself lives in
  * [[GroupedTopK.topKPerKey]] and is invoked with explicit (serializable)
  * arguments captured as locals — the exec node itself never enters the
  * task closure.
  */
private[plans] trait TopKHeapExec extends UnaryExecNode {
  def keys: Seq[Expression]
  def order: Seq[SortOrder]
  def k: Int

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  protected def heapRDD(): RDD[InternalRow] = {
    val keysL = keys
    val orderL = order
    val kL = k
    val outL = child.output
    child.execute().mapPartitions(
      GroupedTopK.topKPerKey(keysL, orderL, kL, outL, _),
      preservesPartitioning = true)
  }
}

object GroupedTopK {
  /** Bounded per-key heap over one partition: max-heap under the sort order
    * whose root is the WORST retained row, evicted when a better arrives.
    *
    * Memory contract: O(distinct keys in the partition × k) retained rows —
    * the same in-memory hash-by-key shape as a non-spilling hash aggregate.
    * A production hardening for pathological key cardinality would add the
    * sort-based spill fallback hash aggregates use; at the intended k
    * (top-N-per-entity) the retained set is orders of magnitude below the
    * input.
    */
  private[plans] def topKPerKey(
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      output: Seq[Attribute],
      iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(keys, output)
    val rowOrd = RowOrdering.create(order, output)
    // scala's PriorityQueue is a MAX-heap under its ordering, so using the
    // sort order directly puts the WORST retained row (largest = sorts
    // last) at the head, ready for eviction when a better row arrives
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val key = keyProj(row) // reused buffer; copied only on first sight
      val heap = heaps.get(key) match {
        case Some(h) => h
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
          heaps.put(key.copy(), h)
          h
      }
      if (heap.size < k) heap.enqueue(row.copy())
      else if (rowOrd.compare(row, heap.head) < 0) {
        heap.dequeue()
        heap.enqueue(row.copy())
      }
    }
    heaps.valuesIterator.flatMap(_.iterator)
  }
}

/** Map-side pass: no distribution requirement; bounds what the exchange
  * carries to ≤ k rows per (key, input partition).
  */
final case class GroupedTopKPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends TopKHeapExec {
  override protected def doExecute(): RDD[InternalRow] = heapRDD()
  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKPartialExec =
    copy(child = newChild)
}

/** Reduce-side pass: requires co-located keys (EnsureRequirements inserts
  * the hash exchange), then the same bounded heap yields the exact answer.
  */
final case class GroupedTopKFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends TopKHeapExec {
  // empty keys = GLOBAL top-k: all partial outputs must meet in one place
  // (AllTuples), else each partition would emit its own local "top-k"
  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) Seq(AllTuples) else Seq(ClusteredDistribution(keys))
  override protected def doExecute(): RDD[InternalRow] = heapRDD()
  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKFinalExec =
    copy(child = newChild)
}

/** Dataset-level API for [[GroupedTopK]]. The session must have
  * [[GroupedTopKStrategy]] installed (via [[GraftExtensions]] or
  * `spark.experimental.extraStrategies`).
  */
object GroupedTopKOps {
  import org.apache.spark.sql.{Column, DataFrame, SparkSession}
  import org.apache.spark.sql.catalyst.expressions.Ascending
  import org.apache.spark.sql.graftglue.ColumnGlue

  /** Idempotent strategy registration (synchronized: extraStrategies is a
    * read-modify-write of shared session state).
    */
  def ensureInstalled(s: SparkSession): Unit = synchronized {
    if (!s.experimental.extraStrategies.contains(GroupedTopKStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ GroupedTopKStrategy
  }

  /** Top `k` rows per distinct value of `keyCols`, smallest-first under
    * `orderCols` (use `col.desc` for largest-first; pass a total order for
    * deterministic results, as with row_number).
    */
  def groupedTopK(
      df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    // eager conversion: these expressions live in the node's non-child
    // fields and must be pure catalyst before they reach task closures
    val keys = keyCols.map(ColumnGlue.expressionEager)
    val order = orderCols.map(c => ColumnGlue.expressionEager(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    ColumnGlue.dataFrame(df.sparkSession,
      GroupedTopK(keys, order, k, ColumnGlue.logicalPlan(df)))
  }
}
