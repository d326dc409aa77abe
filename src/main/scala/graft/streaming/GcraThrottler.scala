package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{BooleanType, StructType}

/** Exact GCRA ("generic cell rate algorithm") rate limiter as a Spark
  * keyed-state operator — the streaming rendering of core.throttler
  * (reference: pkg/corev1alpha1/actor/throttler.go:126-148, the
  * "theoretical arrival time" CAS loop; params at :32-38: cost =
  * 1e9/rps ns per message, burst = 1s - cost).
  *
  * State per key: the TAT (theoretical arrival time, ns). On arrival at
  * event time t: admit iff TAT - t <= burst, then TAT = max(TAT, t) + cost;
  * over-limit events are emitted with admitted=false and do NOT advance TAT
  * (the reference completes them Throttled without queueing).
  *
  * Ordering: Spark gives no within-batch order, so each micro-batch's
  * events per key are processed in (eventTimeNs, id) order — deterministic
  * given deterministic batching. Cross-batch order follows watermark
  * discipline, as in any event-time streaming operator.
  *
  * Scale: state is 8 bytes per active key, partitioned by key hash —
  * the same shuffle the downstream keyed sink needs anyway. No skew issue:
  * a hot key is a single 8-byte register updated sequentially, which is
  * semantically unavoidable for per-key rate limiting.
  */
object GcraThrottler {

  case class Event(key: String, eventTimeNs: Long, id: Long)
  case class Result(key: String, eventTimeNs: Long, id: Long, admitted: Boolean)

  def throttle(events: Dataset[Event], rps: Double,
               timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[Result] = {
    val costNs = (1e9 / rps).toLong
    val burstNs = math.max(0L, 1000000000L - costNs) // throttler.go:37-38
    implicit val resEnc = Encoders.product[Result]
    implicit val keyEnc = Encoders.STRING
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (key: String, it: Iterator[Event], state: GroupState[Long]) =>
          var tat = state.getOption.getOrElse(Long.MinValue)
          val out = it.toSeq.sortBy(e => (e.eventTimeNs, e.id)).map { e =>
            val t = e.eventTimeNs
            val admitted = tat == Long.MinValue || tat - t <= burstNs
            if (admitted) tat = math.max(tat, t) + costNs
            Result(key, t, e.id, admitted)
          }
          state.update(tat)
          out.iterator
      }
  }

  /** [[throttle]] on Spark 4's `transformWithState` — same TAT algorithm
    * and results, state held in a RocksDB-backed ValueState (off-heap,
    * spillable: the modern home for keyed operator state at scale).
    * Without a TTL, TimeMode.None: GCRA is driven by EVENT time carried
    * in the data, not processing-time timers — no housekeeping batches,
    * and drain-based harnesses work unchanged. With a TTL the state runs
    * in TimeMode.ProcessingTime and the native TTL evicts idle keys —
    * the unbounded-key-cardinality case (per-client rate limiting over a
    * churning client population): an idle client's 8-byte TAT register
    * disappears for free instead of accumulating forever, and a client
    * returning after the TTL starts fresh — semantically sound, since a
    * TAT older than the TTL can only admit anyway once
    * ttl >= burst + cost. */
  class GcraProcessor(costNs: Long, burstNs: Long,
                      ttl: Option[java.time.Duration] = None)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, Event, Result] {
    @transient private var tatState:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      tatState = getHandle.getValueState[Long]("tat", Encoders.scalaLong,
        ttl.map(org.apache.spark.sql.streaming.TTLConfig(_))
          .getOrElse(org.apache.spark.sql.streaming.TTLConfig.NONE))

    override def handleInputRows(key: String, it: Iterator[Event],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[Result] = {
      var tat = if (tatState.exists()) tatState.get() else Long.MinValue
      val out = it.toSeq.sortBy(e => (e.eventTimeNs, e.id)).map { e =>
        val t = e.eventTimeNs
        val admitted = tat == Long.MinValue || tat - t <= burstNs
        if (admitted) tat = math.max(tat, t) + costNs
        Result(key, t, e.id, admitted)
      }
      tatState.update(tat)
      out.iterator
    }
  }

  def throttleTws(events: Dataset[Event], rps: Double,
                  ttl: Option[java.time.Duration] = None): Dataset[Result] = {
    val costNs = (1e9 / rps).toLong
    val burstNs = math.max(0L, 1000000000L - costNs)
    // TTL soundness: a TAT older than the TTL must only be able to
    // admit — otherwise eviction forgets live throttle debt and
    // over-admits. ttl >= burst + cost guarantees it (the TAT can lead
    // an event's time by at most burst + cost ns). ENFORCED, not just
    // documented. Caveat: the native TTL evicts on PROCESSING time
    // while the TAT advances on EVENT time — a replay/backfill whose
    // batches are spaced further apart on the wall clock than in event
    // time can still evict live state between batches; size the TTL to
    // wall-clock batch spacing for backfill workloads (or run the
    // backfill with ttl = None).
    ttl.foreach(t => require(t.toNanos >= burstNs + costNs,
      s"ttl must be >= burst + cost (${burstNs + costNs} ns) for sound " +
        s"eviction; got ${t.toNanos} ns"))
    implicit val resEnc = Encoders.product[Result]
    implicit val keyEnc = Encoders.STRING
    events.groupByKey(_.key)
      .transformWithState(new GcraProcessor(costNs, burstNs, ttl),
        // TTL requires processing-time tracking; without it stay in
        // TimeMode.None so no housekeeping batches run
        if (ttl.isDefined) org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
        else org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** Schema-generic GCRA: same admission algorithm over arbitrary rows —
    * the pipeline-actor form, where the message must flow through with
    * ALL its columns (reference: the throttler actor passes the message
    * along, it never reshapes it). Appends a boolean `admitted` column;
    * callers filter and drop it. Works identically over batch and
    * streaming inputs (flatMapGroupsWithState runs stateless-per-group on
    * batch, keyed-state across micro-batches on streams).
    *
    * Within-batch order is (event time ns, xxhash of the row's string
    * form) — deterministic for distinct-timestamp workloads and stable
    * under retries either way.
    */
  def throttleRows(df: DataFrame, keyCol: String, tsCol: String, rps: Double,
                   timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : DataFrame = {
    val costNs = (1e9 / rps).toLong
    val burstNs = math.max(0L, 1000000000L - costNs)
    val schema = df.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val tsIdx = schema.fieldIndex(tsCol)
    val outSchema = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("admitted", BooleanType, nullable = false))
    val outEnc = Encoders.row(outSchema)
    val stateEnc = Encoders.scalaLong
    def tsNs(r: Row): Long = {
      val i = r.getTimestamp(tsIdx).toInstant
      i.getEpochSecond * 1000000000L + i.getNano
    }
    df.groupByKey(r => String.valueOf(r.get(keyIdx)))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), timeout) {
        (_: String, it: Iterator[Row], state: GroupState[Long]) =>
          var tat = state.getOption.getOrElse(Long.MinValue)
          val out = it.toSeq
            .sortBy(r => (tsNs(r), r.mkString("").hashCode))
            .map { r =>
              val t = tsNs(r)
              val admitted = tat == Long.MinValue || tat - t <= burstNs
              if (admitted) tat = math.max(tat, t) + costNs
              Row.fromSeq(r.toSeq :+ admitted)
            }
          state.update(tat)
          out.iterator
      }(stateEnc, outEnc)
  }
}
