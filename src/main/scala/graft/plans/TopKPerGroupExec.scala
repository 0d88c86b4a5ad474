package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import scala.collection.mutable

/** Physical side of TopKPerGroup: bounded k-row heaps per group.
  *
  * Partial stage (map side, any distribution): each input partition keeps
  * at most k rows per group — the shuffle then moves only candidate
  * survivors, exactly like partial aggregation does for sums.
  * Final stage (requires clustering on the group key): merges candidates,
  * sorts each group's ≤ partitions×k rows, emits the true top-k with the
  * row_number attribute appended.
  */
abstract class TopKExecBase extends UnaryExecNode {
  def partitionSpec: Seq[Expression]
  def orderSpec: Seq[SortOrder]
  def k: Int

  /** group key → bounded max-heap (worst candidate on top). */
  protected def accumulate(iter: Iterator[InternalRow]): mutable.HashMap[UnsafeRow, mutable.PriorityQueue[UnsafeRow]] = {
    val groupProj = UnsafeProjection.create(partitionSpec, child.output)
    val ordering = GenerateOrdering.generate(orderSpec, child.output)
    // children usually emit UnsafeRow, but that's not contractual —
    // convert anything else so the value-based hash/equals of the heap
    // keys and entries stays valid
    val toUnsafe = UnsafeProjection.create(child.output, child.output)
    def unsafeCopy(row: InternalRow): UnsafeRow = row match {
      case u: UnsafeRow => u.copy()
      case other => toUnsafe(other).copy()
    }
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
    iter.foreach { row =>
      val key = groupProj(row)
      val heap = heaps.getOrElseUpdate(key.copy(),
        mutable.PriorityQueue.empty[UnsafeRow](ordering.asInstanceOf[Ordering[UnsafeRow]]))
      if (heap.size < k) heap.enqueue(unsafeCopy(row))
      else if (ordering.compare(row, heap.head) < 0) {
        heap.dequeue(); heap.enqueue(unsafeCopy(row))
      }
    }
    heaps
  }
}

/** Map-side candidate pruning; output schema unchanged. */
case class TopKPartialExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends TopKExecBase {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] = Seq(UnspecifiedDistribution)

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      accumulate(iter).valuesIterator.flatMap(_.iterator)
    }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

/** Reduce-side exact top-k + rank emission. */
case class TopKFinalExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: SparkPlan) extends TopKExecBase {

  override def output: Seq[Attribute] = child.output :+ rnAttr

  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionSpec.isEmpty) Seq(AllTuples) else Seq(ClusteredDistribution(partitionSpec))

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      val ordering = GenerateOrdering.generate(orderSpec, child.output)
      val project = UnsafeProjection.create(output, child.output :+ rnAttr)
      accumulate(iter).valuesIterator.flatMap { heap =>
        val sorted = heap.dequeueAll.reverse // ascending under `ordering`
        sorted.iterator.zipWithIndex.map { case (row, i) =>
          project(new JoinedRow(row, InternalRow(i + 1)))
        }
      }
    }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}

/** Planner strategy: TopKPerGroup → final(shuffle inserted by
  * EnsureRequirements)(partial(child)).
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(part, order, k, rnAttr, child) =>
      TopKFinalExec(part, order, k, rnAttr,
        TopKPartialExec(part, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
