package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** TTL'd streaming exact dedup on the `transformWithState` API (the
  * arbitrary-state operator that succeeds flatMapGroupsWithState in
  * Spark 4): state is one boolean ValueState per content hash with a
  * NATIVE time-to-live — the state store evicts expired hashes itself,
  * no watermark bookkeeping in operator code.
  *
  * Contract: the first document bearing a given content hash inside the
  * TTL horizon is emitted, every later one is dropped; after `ttl` of
  * silence the hash is forgotten and the content admits again — i.e.
  * "dedup within a sliding recency horizon", the ingest-time policy most
  * training-data pipelines want (re-crawls re-admit, bursts dedup).
  *
  * Scale: state is hash-partitioned by the 128-bit content hash (never
  * skewed), ~1 bit + key per distinct doc in the horizon, backed by
  * RocksDB (transformWithState requires the RocksDB state store — set
  * spark.sql.streaming.stateStore.providerClass accordingly).
  */
object TtlDedup {

  case class Doc(contentHash: String, docId: Long)
  case class Admitted(docId: Long, contentHash: String)

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  class Processor(ttl: Option[Duration])
      extends StatefulProcessor[String, Doc, Admitted] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: String, rows: Iterator[Doc],
                                 tv: TimerValues): Iterator[Admitted] = {
      if (seen.exists()) Iterator.empty
      else {
        // deterministic pick inside a batch: smallest id wins, matching
        // the batch Dedup.exact keep-min-id contract
        val first = rows.minBy(_.docId)
        seen.update(true)
        Iterator.single(Admitted(first.docId, key))
      }
    }
  }

  /** docs: streaming frame with (idCol: long-castable, textCol: string).
    *
    * `ttl = Some(d)` runs in ProcessingTime mode with native state
    * eviction — note the engine then schedules housekeeping micro-batches
    * continuously, which is correct on a cluster but makes drain-and-stop
    * test harnesses (processAllAvailable) never settle; use
    * Trigger.AvailableNow there. `ttl = None` runs in TimeMode.None:
    * state never expires (unbounded-horizon dedup), batches fire only on
    * data.
    */
  def dedup(docs: DataFrame, textCol: String, idCol: String,
            ttl: Option[Duration]): Dataset[Admitted] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeMode =
      if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    docs.select(md5(col(textCol).cast("binary")).as("contentHash"),
        col(idCol).cast("long").as("docId"))
      .as[Doc]
      .groupByKey(_.contentHash)
      .transformWithState(new Processor(ttl), timeMode, OutputMode.Append())
  }
}
