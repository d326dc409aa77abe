package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Per-key top-k as a first-class operator: logical node + planner
  * strategy + two-phase physical execution, the custom-operator path of
  * SURVEY §7.3 —
  * used where the declarative rendering (`row_number over (partition by
  * key order by o) <= k`) is structurally wasteful: the window form
  * shuffles EVERY row to its key's reducer and sorts whole partitions,
  * while this operator bounds each map-side partition to k rows per key
  * BEFORE the exchange (partial top-k), then merges — the same
  * partial-aggregation shape Spark applies to sums, applied to order
  * statistics. At 100 TB the shuffle shrinks from |rows| to
  * ~|keys|*k per input partition.
  *
  * Semantics match the window form exactly: rows ranked by `order`
  * within each key group; ties broken by the order expressions only, so
  * callers include a unique column for determinism (as with row_number).
  * Output = child columns + an integer rank column.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      rankAttr: AttributeReference, child: LogicalPlan) extends UnaryNode {
  // rankAttr is a constructor param (not a val) so tree copies keep its
  // exprId stable — regenerating it would orphan upstream references
  require(k >= 1)
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** DataFrame API. Registers the planner strategy on first use. */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
            rankName: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    GraftBridge.addStrategy(spark, TopKStrategy)
    val sortOrders = order.map(c => GraftBridge.resolvedExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    val raw = GraftBridge.ofRows(spark,
      TopKPerKey(keys.map(GraftBridge.resolvedExpression), sortOrders, k,
        AttributeReference(rankName, IntegerType, nullable = false)(),
        GraftBridge.logicalPlan(df)))
    // top-level alias Project: DeduplicateRelations cannot regenerate
    // attributes produced by a custom node, so a self-join over the raw
    // result fails to resolve; aliasing every output gives the analyzer
    // its standard Project handle for exprId renewal
    raw.select(raw.columns.map(n => org.apache.spark.sql.functions.col(n).as(n))
      .toIndexedSeq: _*)
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      FinalTopKExec(t.keys, t.order, t.k, t.rankAttr,
        PartialTopKExec(t.keys, t.order, t.k, planLater(t.child))) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key selection shared by both phases. */
private object BoundedTopK {
  def run(it: Iterator[InternalRow], keyExprs: Seq[Expression],
          order: Seq[SortOrder], k: Int, inputAttrs: Seq[Attribute])
      : Iterator[(UnsafeRow, mutable.ArrayBuffer[InternalRow])] = {
    val keyProj = UnsafeProjection.create(keyExprs, inputAttrs)
    val ord = GenerateOrdering.generate(order, inputAttrs)
    val groups = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
    it.foreach { row =>
      val key = keyProj(row)
      val buf = groups.get(key) match {
        case Some(b) => b
        case None =>
          val b = mutable.ArrayBuffer.empty[InternalRow]
          groups.put(key.copy(), b)
          b
      }
      if (buf.size < k || ord.compare(row, buf.last) < 0) {
        val copy = row.copy()
        var pos = buf.size
        if (buf.size == k) { buf.remove(k - 1); pos = k - 1 }
        while (pos > 0 && ord.compare(copy, buf(pos - 1)) < 0) pos -= 1
        buf.insert(pos, copy)
      }
    }
    groups.iterator
  }
}

/** Map-side phase: caps each input partition at k rows per key. */
case class PartialTopKExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                           child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    // bind fields to locals: the closure must not capture the plan node
    val (keyExprs, ord, kk, attrs) = (keys, order, k, child.output)
    child.execute().mapPartitions { it =>
      BoundedTopK.run(it, keyExprs, ord, kk, attrs).flatMap(_._2.iterator)
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKExec =
    copy(child = newChild)
}

/** Reduce-side phase: requires clustering on the keys (EnsureRequirements
  * inserts the exchange), merges the partial winners, emits ranks. */
case class FinalTopKExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                         rankAttr: AttributeReference, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) Seq(AllTuples) else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val (keyExprs, ord, kk, attrs) = (keys, order, k, child.output)
    val outAttrs = output
    val allAttrs = child.output :+ rankAttr
    child.execute().mapPartitions { it =>
      val proj = UnsafeProjection.create(outAttrs, allAttrs)
      val joined = new JoinedRow
      BoundedTopK.run(it, keyExprs, ord, kk, attrs).flatMap { case (_, buf) =>
        buf.iterator.zipWithIndex.map { case (row, i) =>
          val rank = new GenericInternalRow(1)
          rank.setInt(0, i + 1)
          proj(joined(row, rank)).copy(): InternalRow
        }
      }
    }
  }
  override protected def withNewChildInternal(newChild: SparkPlan): FinalTopKExec =
    copy(child = newChild)
}
