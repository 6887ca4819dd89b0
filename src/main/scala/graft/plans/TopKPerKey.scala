package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkStrategy

/** Per-key top-k as a first-class operator.
  *
  * The built-in formulation — `row_number().over(Window.partitionBy(key)
  * .orderBy(ord))` then `filter(rn <= k)` — shuffles EVERY row and fully
  * sorts every key partition before discarding all but k rows. This operator
  * keeps a bounded heap per key on the map side, shuffles only ≤ k rows per
  * (key, input-partition), and merges heaps on the reduce side: for top-k
  * over n rows it moves O(k · partitions · keys) instead of O(n), with no
  * sort. At 100 TB this is the difference between shuffling terabytes and
  * shuffling megabytes.
  *
  * Pieces (SURVEY.md §9 roadmap item 2):
  *  - [[TopKPerKey]] — logical node
  *  - [[TopKPerKeyStrategy]] — plans logical → partial + final exec pair
  *    (the final's `requiredChildDistribution` makes Catalyst insert the
  *    key-clustered exchange between them)
  *  - [[TopKPerKeyExec]] — bounded-heap physical operator (both phases)
  *  - registered via [[graft.functions.GraftExtensions]], or used directly
  *    through [[graft.ops.TopK.perKey]]
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Expression,
    descending: Boolean, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, desc, child) =>
      val partial = TopKPerKeyExec(k, keys, order, desc, partial = true,
        planLater(child))
      TopKPerKeyExec(k, keys, order, desc, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k. `partial = true` runs before the exchange
  * (any distribution); the final phase requires key-clustered input, which
  * the planner satisfies with a hash exchange on the keys. */
case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Expression,
    descending: Boolean, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val ordExpr = order
    val desc = descending
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val boundOrd = org.apache.spark.sql.catalyst.expressions
        .BindReferences.bindReference(ordExpr, childOutput)
      val ordering = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(ordExpr.dataType)
      // Evaluated order values for buffer-backed types (strings, structs,
      // arrays) alias the reused UnsafeRow buffer and would be silently
      // mutated as the iterator advances — copy before storing in the heap.
      val copyOrd: Any => Any = {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case r: InternalRow => r.copy()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
        case v => v
      }
      // heap keeps the WORST element on top so it can be evicted
      implicit val heapOrd: Ordering[(Any, UnsafeRow)] = new Ordering[(Any, UnsafeRow)] {
        override def compare(a: (Any, UnsafeRow), b: (Any, UnsafeRow)): Int = {
          val c = ordering.compare(a._1, b._1)
          if (desc) -c else c
        }
      }
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[(Any, UnsafeRow)]]()
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty[(Any, UnsafeRow)]
          heaps.put(key.copy(), heap)
        }
        val ordVal = boundOrd.eval(row)
        if (ordVal != null) {
          if (heap.size < limit) heap.enqueue((copyOrd(ordVal), rowProj(row).copy()))
          else {
            val worst = heap.head
            val c = ordering.compare(ordVal, worst._1)
            if ((desc && c > 0) || (!desc && c < 0)) {
              heap.dequeue()
              heap.enqueue((copyOrd(ordVal), rowProj(row).copy()))
            }
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator.map(_._2))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}
