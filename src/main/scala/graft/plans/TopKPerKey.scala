package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator: per-key top-k with bounded heaps — the (c)
  * extension path (LogicalPlan + Strategy + SparkPlan) from the build
  * guidance, used where composing built-ins is wasteful: the window
  * formulation (`row_number().over(partitionBy(key).orderBy(...))` +
  * filter) SORTS every partition fully; this operator keeps only k rows
  * per key in a heap on both sides of the shuffle, so memory is
  * O(keys·k) and no sort happens at all.
  *
  * Two-phase: a partial exec runs before the shuffle (map-side top-k —
  * the same combiner trick the reference's takeOrdered uses per
  * partition, RDD.scala:1631), then a final exec after clustering by
  * key.
  *
  * Semantics: emits, per distinct key, the k rows that come FIRST under
  * `order` (ties resolved by whatever the order expression distinguishes;
  * pass a struct with a tiebreaker for determinism). Output rows are
  * unordered — callers sort if they need order.
  */
final case class TopKPerKey(
    groupExprs: Seq[Expression],
    order: SortOrder,
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

final case class TopKPerKeyExec(
    groupExprs: Seq[Expression],
    order: SortOrder,
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupLocal = groupExprs
    val orderLocal = order
    val kLocal = k
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      val rowOrd: Ordering[InternalRow] = RowOrdering.create(Seq(orderLocal), childOutput)
      // PriorityQueue dequeues the MAX under its ordering; ordered by
      // rowOrd the max is the row sorting LAST — the eviction candidate
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        // copy the key only on first insert — getOrElseUpdate would
        // evaluate key.copy() per input row
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            heaps.update(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(g, o, k, child) =>
      val partialExec = TopKPerKeyExec(g, o, k, partial = true, planLater(child))
      TopKPerKeyExec(g, o, k, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Per-key top-k over a DataFrame.
    *
    * @param orderCol rows sorting FIRST by this column are kept; wrap in
    *                 a struct with a tiebreak column for determinism
    */
  def perKey(df: DataFrame, keyNames: Seq[String], orderCol: Column,
             k: Int, descending: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    // materialize the order expression through the normal Dataset API
    // (Spark 4 Columns resolve lazily via column nodes, which a custom
    // logical node cannot evaluate), then build the plan from resolved
    // attributes only
    val ordName = "__topk_ord"
    val prepared = df.withColumn(ordName, orderCol)
    val analyzed = prepared.queryExecution.analyzed
    def attr(n: String): Attribute =
      analyzed.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${analyzed.output.map(_.name)}"))
    val direction = if (descending) Descending else Ascending
    val plan = TopKPerKey(
      keyNames.map(attr(_)),
      SortOrder(attr(ordName), direction),
      k,
      analyzed)
    GraftSqlBridge.ofRows(spark, plan).drop(ordName)
  }
}
