package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: exact top-k rows PER KEY as a
  * first-class plan node — logical node + planner strategy + physical
  * operator, registered via GraftExtensions.injectPlannerStrategy.
  *
  * Why a custom operator: Spark's built-ins give either GLOBAL top-k
  * (TakeOrderedAndProject) or per-key ranking via a window
  * (`row_number().over(partitionBy(key).orderBy(...)) <= k`), and the
  * window shape must SHUFFLE AND SORT EVERY INPUT ROW before it can
  * discard anything. This operator runs a bounded heap (size k) per key on
  * the MAP side first — each input partition emits at most k rows per key
  * — so the exchange carries ≤ k·keys·partitions rows instead of N, and
  * nothing is globally sorted. The same partial/final split Spark applies
  * to aggregates, applied to per-key top-k: at 100 TB this is the
  * difference between shuffling the corpus and shuffling the candidates.
  *
  * Tie semantics: callers must pass a TOTAL order (e.g. sim DESC, id ASC)
  * — with ties at the k boundary under a partial order, which ties
  * survive would be partition-dependent.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRowsPerPartition: Option[Long] = None
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Plans the logical node as partial (map-side, no distribution
  * requirement) + final (clustered by key); EnsureRequirements inserts the
  * hash exchange between them, which then only ever carries each
  * partition's per-key top-k survivors.
  */
case class TopKPerKeyStrategy() extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val orderLocal = order
    val keysLocal = keys
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      // ordering: compare(a, b) < 0 ⇔ a ranks before b. The heap is a
      // max-heap under that ordering, so heap.head is the WORST kept row.
      val ordering = RowOrdering.create(orderLocal, childOutput)
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](ordering)
            heaps.put(key.copy(), h) // projection buffer is reused — copy stored keys
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
