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
                      rankAttr: AttributeReference, child: LogicalPlan,
                      maxPartialGroups: Int) extends UnaryNode {
  // rankAttr is a constructor param (not a val) so tree copies keep its
  // exprId stable — regenerating it would orphan upstream references
  require(k >= 1 && maxPartialGroups >= 1)
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {
  /** DataFrame API. Registers the planner strategy on first use.
    * `maxPartialGroups` bounds the map-side group map (memory is
    * O(maxPartialGroups * k) rows per task): the partial cap is exact
    * only while a partition's distinct keys fit the bound — past it the
    * flush loop re-emits keys per flush window and the shuffle grows
    * back toward |rows|. Callers that know their per-batch key
    * cardinality (CDC upsert batches, say) raise it to keep the
    * exchange at ~|keys|*k; the default suits unbounded keyspaces. */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int,
            rankName: String = "rank",
            maxPartialGroups: Int = BoundedTopK.FlushGroups): DataFrame = {
    val spark = df.sparkSession
    GraftBridge.addStrategy(spark, TopKStrategy)
    val sortOrders = order.map(c => GraftBridge.resolvedExpression(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    val raw = GraftBridge.ofRows(spark,
      TopKPerKey(keys.map(GraftBridge.resolvedExpression), sortOrders, k,
        AttributeReference(rankName, IntegerType, nullable = false)(),
        GraftBridge.logicalPlan(df), maxPartialGroups))
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
        PartialTopKExec(t.keys, t.order, t.k, planLater(t.child),
          t.maxPartialGroups)) :: Nil
    case _ => Nil
  }
}

/** Bounded per-key selection shared by both phases. */
private object BoundedTopK {
  /** Map-side group-count bound: one input partition can contain the
    * ENTIRE keyspace (per-query ANN ranking = millions of keys), so the
    * partial phase flushes its group map whenever this many distinct
    * keys accumulate — memory stays O(maxGroups * k) however many keys
    * the partition holds, at the cost of emitting more than k rows for
    * keys that span flushes (the final phase re-selects, so correctness
    * is unaffected). The reduce side never needs this: it sees
    * |keys| / shufflePartitions keys and retains <= k rows per key. */
  val FlushGroups: Int = 1 << 15

  private def insert(buf: mutable.ArrayBuffer[InternalRow], row: InternalRow,
                     ord: Ordering[InternalRow], k: Int): Unit =
    if (buf.size < k || ord.compare(row, buf.last) < 0) {
      val copy = row.copy()
      var pos = buf.size
      if (buf.size == k) { buf.remove(k - 1); pos = k - 1 }
      while (pos > 0 && ord.compare(copy, buf(pos - 1)) < 0) pos -= 1
      buf.insert(pos, copy)
    }

  /** Reduce-side form: the whole partition's groups in one pass (every
    * row of a key is in this partition, ranks come off the buffers). */
  def run(it: Iterator[InternalRow], keyExprs: Seq[Expression],
          order: Seq[SortOrder], k: Int, inputAttrs: Seq[Attribute])
      : Iterator[(UnsafeRow, mutable.ArrayBuffer[InternalRow])] = {
    val keyProj = UnsafeProjection.create(keyExprs, inputAttrs)
    val ord = GenerateOrdering.generate(order, inputAttrs)
    val groups = mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
    it.foreach { row =>
      val key = keyProj(row)
      // look up with the reused projection row; copy only on first sight
      // of a key (the by-value getOrElseUpdate form would allocate an
      // UnsafeRow copy per input row)
      val buf = groups.get(key) match {
        case Some(b) => b
        case None =>
          val b = mutable.ArrayBuffer.empty[InternalRow]
          groups.put(key.copy(), b)
          b
      }
      insert(buf, row, ord, k)
    }
    groups.iterator
  }

  /** Map-side form: per-key winners with the [[FlushGroups]] memory
    * bound, streamed out flush by flush. */
  def runFlushing(it: Iterator[InternalRow], keyExprs: Seq[Expression],
                  order: Seq[SortOrder], k: Int, inputAttrs: Seq[Attribute],
                  maxGroups: Int = FlushGroups): Iterator[InternalRow] =
    new Iterator[InternalRow] {
      private val keyProj = UnsafeProjection.create(keyExprs, inputAttrs)
      private val ord = GenerateOrdering.generate(order, inputAttrs)
      private val groups =
        mutable.LinkedHashMap.empty[UnsafeRow, mutable.ArrayBuffer[InternalRow]]
      private var out: Iterator[InternalRow] = Iterator.empty
      private var drained = false

      private def drain(): Iterator[InternalRow] = {
        val bufs = groups.values.toArray
        groups.clear()
        bufs.iterator.flatMap(_.iterator)
      }

      override def hasNext: Boolean = {
        while (!out.hasNext && it.hasNext) {
          val row = it.next()
          val key = keyProj(row)
          groups.get(key) match {
            case Some(buf) => insert(buf, row, ord, k)
            case None =>
              if (groups.size >= maxGroups) out = drain()
              val buf = mutable.ArrayBuffer.empty[InternalRow]
              insert(buf, row, ord, k)
              groups.put(key.copy(), buf)
          }
        }
        if (!out.hasNext && !drained && !it.hasNext) {
          out = drain()
          drained = true
        }
        out.hasNext
      }

      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        out.next()
      }
    }
}

/** Map-side phase: caps each input partition at ~k rows per key (exactly
  * k within each flush window of [[BoundedTopK.FlushGroups]] distinct
  * keys — bounded memory even when one partition holds the whole
  * keyspace). */
case class PartialTopKExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                           child: SparkPlan,
                           maxPartialGroups: Int = BoundedTopK.FlushGroups)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    // bind fields to locals: the closure must not capture the plan node
    val (keyExprs, ord, kk, attrs) = (keys, order, k, child.output)
    val maxGroups = maxPartialGroups
    child.execute().mapPartitions { it =>
      BoundedTopK.runFlushing(it, keyExprs, ord, kk, attrs, maxGroups)
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
