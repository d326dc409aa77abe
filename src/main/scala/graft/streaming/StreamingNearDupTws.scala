package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues}

import graft.functions.{HashFunctions, TextFunctions}
import graft.streaming.StreamingNearDup.{BandHit, Pair}

/** [[StreamingNearDup]] on Spark 4's `transformWithState`: the inverted
  * index shard per band key lives in a RocksDB-backed `ListState`, and
  * — the reason this port exists — with `ttl = Some(d)` each ENTRY gets
  * a native per-element time-to-live, so the recency horizon is evicted
  * by the state store itself instead of the bounded-buffer cap the
  * flatMapGroupsWithState version uses. With `ttl = None` it runs in
  * TimeMode.None (state never expires; batches fire only on data),
  * producing exactly the pairs of the classic operator.
  *
  * Scale shape is unchanged: state sharded by uniformly-distributed
  * band keys, candidates compared only within their bucket, append-only
  * output.
  */
object StreamingNearDupTws {

  case class Entry(docId: Long, sig: Array[Long])

  class NearDupProcessor(k: Int, threshold: Double)
      extends StatefulProcessor[Long, BandHit, Pair] {
    @transient private var bucket: ListState[Entry] = _
    private var ttlConf: TTLConfig = TTLConfig.NONE

    def this(k: Int, threshold: Double, ttl: Option[Duration]) = {
      this(k, threshold)
      ttlConf = ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE)
    }

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bucket = getHandle.getListState[Entry]("bucket",
        Encoders.product[Entry], ttlConf)

    override def handleInputRows(key: Long, it: Iterator[BandHit],
                                 tv: TimerValues): Iterator[Pair] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Pair]
      val prior = bucket.get().toArray
      val fresh = scala.collection.mutable.ArrayBuffer.empty[Entry]
      it.toSeq.sortBy(_.docId).foreach { hit =>
        def compare(prevId: Long, prevSig: Array[Long]): Unit =
          if (prevId != hit.docId) {
            var agree = 0; var i = 0
            while (i < k) { if (prevSig(i) == hit.sig(i)) agree += 1; i += 1 }
            val est = agree.toDouble / k
            if (est >= threshold) {
              val (a, b) = if (prevId < hit.docId) (prevId, hit.docId)
                           else (hit.docId, prevId)
              out += Pair(a, b, math.rint(est * 1e6) / 1e6)
            }
          }
        prior.foreach(e => compare(e.docId, e.sig))
        fresh.foreach(e => compare(e.docId, e.sig))
        fresh += Entry(hit.docId, hit.sig)
      }
      if (fresh.nonEmpty) bucket.appendList(fresh.toArray)
      out.iterator
    }
  }

  def pairs(docs: DataFrame, textCol: String, idCol: String,
            shingleN: Int = 3, threshold: Double = 0.5,
            numBands: Int = 16, rowsPerBand: Int = 4,
            ttl: Option[Duration] = None): Dataset[Pair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = numBands * rowsPerBand
    val banded = docs
      .select(col(idCol).cast("long").as("docId"),
        HashFunctions.minhashSigLongs(k)(
          HashFunctions.shingleHashes(shingleN)(
            TextFunctions.tokens(col(textCol)))).as("sig"))
      .select(col("docId"), col("sig"),
        explode(HashFunctions.bandKeys(numBands, rowsPerBand)(col("sig"))).as("bandKey"))
      .as[BandHit]
    val timeMode =
      if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    banded.groupByKey(_.bandKey)
      .transformWithState(new NearDupProcessor(k, threshold, ttl),
        timeMode, OutputMode.Append())
  }
}
