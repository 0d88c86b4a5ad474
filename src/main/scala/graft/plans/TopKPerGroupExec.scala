package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import scala.collection.mutable

/** Physical side of TopKPerGroup.
  *
  * Partial stage (map side, any distribution): best-effort candidate
  * pruning — at most k rows per group survive, exactly like partial
  * aggregation prunes for sums. Memory is BOUNDED: the group map caps at
  * [[TopKPartialExec.MaxTrackedGroups]]; once full, rows of untracked
  * groups pass through unpruned (correctness never depends on the partial
  * stage). Without the cap, a high-cardinality group key (groups ≈ rows)
  * would allocate one heap object per input row and OOM an executor at
  * scale — measured 35 s of GC churn on a 10M-unique-group input before
  * this bound existed (ScaleSmoke b7).
  *
  * Final stage (requires clustering on the group key): SORT-BASED — asks
  * EnsureRequirements for child ordering (groupKey, orderSpec), then emits
  * ranks in one streaming pass with O(1) state beyond Spark's external
  * (spillable) sort. No per-group state ever accumulates, so group
  * cardinality cannot OOM the reduce side either.
  */
case class TopKPartialExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] = Seq(UnspecifiedDistribution)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "prunedRows" -> SQLMetrics.createMetric(sparkContext,
      "rows pruned map-side (worse than k tracked candidates)"),
    "passthroughRows" -> SQLMetrics.createMetric(sparkContext,
      "rows passed through (group map at capacity)"))

  override protected def doExecute(): RDD[InternalRow] = {
    // resolved driver-side so tests can shrink the bound to force the
    // passthrough path on small data
    val maxTracked = conf.getConfString("spark.graft.topk.maxTrackedGroups",
      TopKPartialExec.MaxTrackedGroups.toString).toInt
    val pruned = longMetric("prunedRows")
    val passedThrough = longMetric("passthroughRows")
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(partitionSpec, child.output)
      val ordering = GenerateOrdering.generate(orderSpec, child.output)
        .asInstanceOf[Ordering[InternalRow]]
      val toUnsafe = UnsafeProjection.create(child.output, child.output)
      def unsafeCopy(row: InternalRow): UnsafeRow = row match {
        case u: UnsafeRow => u.copy()
        case other => toUnsafe(other).copy()
      }
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      // rows of tracked groups are absorbed (or provably pruned); rows of
      // untracked groups flow through once the map hits its memory bound
      val passthrough = iter.flatMap { row =>
        val key = groupProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < k) { heap.enqueue(unsafeCopy(row)); Iterator.empty }
            else if (ordering.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(unsafeCopy(row)); pruned += 1; Iterator.empty
            } else { pruned += 1; Iterator.empty } // worse than k tracked candidates
          case None if heaps.size < maxTracked =>
            val heap = mutable.PriorityQueue.empty[UnsafeRow](
              ordering.asInstanceOf[Ordering[UnsafeRow]])
            heap.enqueue(unsafeCopy(row))
            heaps.put(key.copy(), heap)
            Iterator.empty
          case None => passedThrough += 1; Iterator.single(row) // map full: defer to final stage
        }
      }
      passthrough ++ heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

object TopKPartialExec {
  /** Default for `spark.graft.topk.maxTrackedGroups`: ≤ cap × (k+1) rows
    * resident per task — a few hundred MB worst-case at k≲100, independent
    * of input group cardinality.
    */
  val MaxTrackedGroups: Int = 1 << 16
}

/** Reduce-side exact top-k + rank emission, sort-based (see class doc). */
case class TopKFinalExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr

  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partitionSpec.isEmpty) Seq(AllTuples) else Seq(ClusteredDistribution(partitionSpec))

  /** Sort by (group key, order) — EnsureRequirements plants an external
    * spillable SortExec, so this node never buffers more than one row.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(partitionSpec.map(SortOrder(_, Ascending)) ++ orderSpec)

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions { iter =>
      val groupProj = UnsafeProjection.create(partitionSpec, child.output)
      val project = UnsafeProjection.create(output, child.output :+ rnAttr)
      var currentGroup: UnsafeRow = null
      var rank = 0
      iter.flatMap { row =>
        val key = groupProj(row)
        if (currentGroup == null || key != currentGroup) {
          currentGroup = key.copy()
          rank = 0
        }
        rank += 1
        if (rank <= k) Iterator.single(project(new JoinedRow(row, InternalRow(rank))))
        else Iterator.empty
      }
    }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}

/** Planner strategy: TopKPerGroup → final(shuffle+sort inserted by
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
