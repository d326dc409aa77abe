package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.operators.FlowEventModel

/** Batch-granularity status accounting — the Spark rendering of the
  * reference's per-message status lifecycle and composite ack bubbling
  * (message.go:10-33 statuses; replicator.go:120-145 folds per-copy
  * outcomes Done < PartialSend < TimedOut < Failed; SURVEY §2.6.2 commits
  * to per-batch counts instead of per-row acks).
  *
  * `observed` attaches per-status row counters to any stage's DataFrame
  * via Dataset.observe — zero-cost in the plan (accumulator-backed,
  * no extra pass). `StatusCollector` is a StreamingQueryListener that
  * gathers those observations per (query, stage) as batches complete.
  */
object StatusMetrics {

  val AllStatuses: Seq[String] = Seq(
    FlowEventModel.StatusDone, FlowEventModel.StatusInvalid,
    FlowEventModel.StatusFailed, FlowEventModel.StatusUnroutable,
    FlowEventModel.StatusThrottled)

  /** Attach observation `name` counting total rows and rows per status
    * (requires a `status` column; stages without one observe total only).
    */
  def observed(df: DataFrame, name: String): DataFrame = {
    val hasStatus = df.columns.contains("status")
    val metrics =
      if (hasStatus)
        count(lit(1)).as("rows") +:
          AllStatuses.map(st =>
            sum(when(col("status") === st, 1L).otherwise(0L)).as(s"n_$st"))
      else Seq(count(lit(1)).as("rows"))
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Fold per-branch statuses into the composite the reference's
    * replicator reports (replicator.go:120-145): all Done -> Done, some
    * Done -> PartialSend, none Done -> Failed. */
  def compositeStatus(branchStatuses: Seq[String]): String = {
    val done = branchStatuses.count(_ == FlowEventModel.StatusDone)
    if (done == branchStatuses.size) FlowEventModel.StatusDone
    else if (done > 0) FlowEventModel.StatusPartialSend
    else FlowEventModel.StatusFailed
  }

  /** Collects observed metrics from streaming query progress events. */
  final class StatusCollector extends StreamingQueryListener {
    // (queryName, observationName) -> metric name -> value
    private val metrics =
      new ConcurrentHashMap[(String, String), Map[String, Long]]()

    def snapshot: Map[(String, String), Map[String, Long]] =
      metrics.asScala.toMap

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val qname = Option(e.progress.name).getOrElse(e.progress.id.toString)
      e.progress.observedMetrics.asScala.foreach { case (obsName, row) =>
        val vals = row.schema.fieldNames.map { f =>
          f -> (row.getAs[Any](f) match {
            case l: java.lang.Long => l.longValue()
            case i: java.lang.Integer => i.longValue()
            case other => Option(other).map(_.toString.toLong).getOrElse(0L)
          })
        }.toMap
        metrics.merge((qname, obsName), vals,
          (a, b) => (a.keySet ++ b.keySet).map(k =>
            k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap)
      }
    }
  }

  def register(spark: SparkSession): StatusCollector = {
    val c = new StatusCollector
    spark.streams.addListener(c)
    c
  }
}
