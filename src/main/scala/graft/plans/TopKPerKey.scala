package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute,
  AttributeReference,
  Expression,
  JoinedRow,
  SortOrder,
  UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.{ColumnBridge, PlanBridge}
import org.apache.spark.sql.types.IntegerType

/** Custom whole-operator: bounded per-key top-k.
  *
  * The DataFrame idiom — `row_number().over(Window.partitionBy(keys)
  * .orderBy(...)) <= k` — must SORT every key group in full before it can
  * rank (Spark's WindowExec sorts each partition by (keys, ordering)). For
  * "top 3 of millions of rows per key" that is an O(n log n) sort +
  * spill of the whole fact table to keep k rows per key.
  *
  * [[TopKPerKeyExec]] instead keeps one bounded k-element heap per key per
  * partition: O(n log k) with O(keys·k) memory and no sort buffer. The
  * required child distribution is clustering on the keys, so the planner
  * inserts the same single hash exchange a window would need — everything
  * after the shuffle is cheaper.
  *
  * Registered as a planner strategy ([[TopKPerKey.install]] or
  * `spark.experimental.extraStrategies`); constructed via
  * [[TopKPerKey.perKey]], which appends a `rank` column (1-based within
  * each key, in `ordering` order) like the window form it replaces.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    // Constructor parameter (not a val): plan copies during optimization
    // must preserve the exprId or downstream references fail to bind.
    rankAttr: AttributeReference = AttributeReference("rank", IntegerType, nullable = false)()
) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

/** Bounded per-key top-k heaps. Runs in two phases like a hash aggregate:
  * a `partial` instance on the un-shuffled input cuts every partition to at
  * most k rows per key (no required distribution, no rank output), then the
  * final instance — fed by the single hash exchange its ClusteredDistribution
  * requires — merges the survivors and emits ranks. The shuffle therefore
  * carries O(keys · k · partitions) rows instead of the full input, so a
  * small key domain (e.g. a handful of probe vectors in a k-NN join) no
  * longer funnels the whole scored set through #keys straggler tasks.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    partial: Boolean,
    child: SparkPlan
) extends UnaryExecNode {

  override def output: Seq[Attribute] = if (partial) child.output else child.output :+ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    val isPartial = partial
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // Per-key bounded heap: the heap's head is the WORST retained row
      // (max under ord, since ord ascending = best first), evicted when a
      // better row arrives.
      val heaps = scala.collection.mutable.HashMap
        .empty[InternalRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row).copy()
        val heap = heaps.getOrElseUpdate(key, scala.collection.mutable.PriorityQueue.empty[InternalRow](ord))
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      if (isPartial) {
        val passProj = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
        heaps.iterator.flatMap(_._2.iterator.map(passProj))
      } else {
        val joiner = new JoinedRow
        val outProj = UnsafeProjection.create((childOutput :+ rankAttr).map(_.dataType).toArray)
        heaps.iterator.flatMap { kv =>
          val ranked: Seq[InternalRow] = kv._2.dequeueAll.reverse
          ranked.iterator.zipWithIndex.map(t => outProj(joiner(t._1, InternalRow(t._2 + 1))))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {

  object TopKStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case p: TopKPerKeyPlan =>
        TopKPerKeyExec(
          p.keys,
          p.order,
          p.k,
          p.rankAttr,
          partial = false,
          TopKPerKeyExec(p.keys, p.order, p.k, p.rankAttr, partial = true, planLater(p.child))
        ) :: Nil
      case _ => Nil
    }
  }

  /** Register the strategy on an existing session (public experimental
    * hook; the `spark.sql.extensions` path does the same at build time).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy

  /** Top `k` rows per `keyNames` group ordered by `ordering`
    * ((column, ascending?) pairs), with a 1-based `rank` column — the
    * bounded-heap replacement for `row_number().over(window) <= k`.
    * Columns are resolved by name against the input's analyzed plan, so
    * the custom node is born fully resolved.
    */
  def perKey(df: DataFrame, keyNames: Seq[String], ordering: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val child = df.queryExecution.analyzed
    def attr(n: String) =
      child.output
        .find(_.name.equalsIgnoreCase(n))
        .getOrElse(throw new IllegalArgumentException(s"column $n not found in ${child.output.map(_.name)}"))
    val order = ordering.map { case (n, asc) =>
      SortOrder(
        attr(n),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending
      )
    }
    PlanBridge.ofRows(spark, TopKPerKeyPlan(keyNames.map(attr), order, k, child))
  }
}
