package graft.streaming

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class TtlDedupSpec extends SparkSpec {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, TtlDedup.RocksDbProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("transformWithState dedup admits first id per content, across batches") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val q = TtlDedup.dedup(mem.toDF().toDF("doc_id", "text"),
          "text", "doc_id", ttl = None)
        .writeStream.format("memory").queryName("ttl_dedup_out")
        .outputMode("append")
        .option("checkpointLocation", Streams.newCheckpointDir())
        .start()
      // batch 1: two copies of A (min id wins) + one B
      mem.addData((5L, "doc A"), (2L, "doc A"), (3L, "doc B"))
      q.processAllAvailable()
      // batch 2: another A (dropped — state from batch 1) + new C
      mem.addData((9L, "doc A"), (4L, "doc C"))
      q.processAllAvailable()
      q.stop()
      val admitted = spark.table("ttl_dedup_out").as[TtlDedup.Admitted]
        .collect().map(_.docId).toSet
      assert(admitted == Set(2L, 3L, 4L))
    }
  }

  test("transformWithState GCRA matches the flatMapGroupsWithState GCRA") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val base = 1700000000000000000L
      val events = Seq(
        GcraThrottler.Event("k", base, 1),
        GcraThrottler.Event("k", base + 100000000L, 2), // +100ms: throttled at 1 rps
        GcraThrottler.Event("k", base + 5000000000L, 3), // +5s: admitted
        GcraThrottler.Event("other", base, 4))
      val mem = MemoryStream[GcraThrottler.Event]
      val q = GcraThrottler.throttleTws(mem.toDS(), rps = 1.0)
        .writeStream.format("memory").queryName("gcra_tws_out")
        .outputMode("append")
        .option("checkpointLocation", Streams.newCheckpointDir())
        .start()
      mem.addData(events.take(2): _*); q.processAllAvailable()
      mem.addData(events.drop(2): _*); q.processAllAvailable()
      q.stop()
      val tws = spark.table("gcra_tws_out").as[GcraThrottler.Result]
        .collect().map(r => r.id -> r.admitted).toMap
      assert(tws == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true))
      // exact parity with the classic operator on the same input
      val classic = GcraThrottler.throttle(events.toDS(), rps = 1.0)
        .collect().map(r => r.id -> r.admitted).toMap
      assert(tws == classic)
    }
  }

  test("GCRA TTL evicts idle keys: a post-TTL event is admitted afresh") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val base = 1700000000000000000L
      val mem = MemoryStream[GcraThrottler.Event]
      // ProcessingTime mode (needed for TTL) schedules housekeeping
      // batches, so drive the sink by polling row counts, not
      // processAllAvailable
      val q = GcraThrottler.throttleTws(mem.toDS(), rps = 1.0,
          ttl = Some(Duration.ofSeconds(2)))
        .writeStream.format("memory").queryName("gcra_ttl_out")
        .outputMode("append")
        .option("checkpointLocation", Streams.newCheckpointDir())
        .start()
      def awaitRows(n: Int): Unit = {
        var tries = 0
        while (spark.table("gcra_ttl_out").count() < n && tries < 600) {
          Thread.sleep(100); tries += 1
        }
        assert(spark.table("gcra_ttl_out").count() >= n,
          s"sink never reached $n rows")
      }
      // id 1 admits and sets TAT; id 2 arrives 100ms later in event time
      // WITHIN the TTL window -> throttled by the surviving state
      mem.addData(GcraThrottler.Event("k", base, 1))
      awaitRows(1)
      mem.addData(GcraThrottler.Event("k", base + 100000000L, 2))
      awaitRows(2)
      // let the 2s TTL lapse, then send an event only 200ms later in
      // EVENT time: with live state it would be throttled identically to
      // id 2; eviction makes it admit afresh
      Thread.sleep(3500)
      mem.addData(GcraThrottler.Event("k", base + 200000000L, 3))
      awaitRows(3)
      q.stop()
      val got = spark.table("gcra_ttl_out").as[GcraThrottler.Result]
        .collect().map(r => r.id -> r.admitted).toMap
      assert(got == Map(1L -> true, 2L -> false, 3L -> true))
    }
  }

  test("ttl variant analyzes and starts in ProcessingTime mode") {
    // the TTL path needs continuous housekeeping batches (unsuitable for
    // drain-and-stop harnesses) — assert it constructs, analyzes, and
    // starts cleanly, then stop without waiting for a drain
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val ds = TtlDedup.dedup(mem.toDF().toDF("doc_id", "text"),
        "text", "doc_id", ttl = Some(Duration.ofHours(1)))
      val q = ds.writeStream.format("memory").queryName("ttl_dedup_ttl_out")
        .outputMode("append")
        .option("checkpointLocation", Streams.newCheckpointDir())
        .start()
      mem.addData((1L, "doc A"))
      // one real micro-batch: wait until the sink sees the row
      var tries = 0
      while (spark.table("ttl_dedup_ttl_out").isEmpty && tries < 600) {
        Thread.sleep(100); tries += 1
      }
      q.stop()
      val admitted = spark.table("ttl_dedup_ttl_out").as[TtlDedup.Admitted]
        .collect().map(_.docId).toSet
      assert(admitted == Set(1L))
    }
  }
}
