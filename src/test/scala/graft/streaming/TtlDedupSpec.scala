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

  // ProcessingTime mode (needed for TTL) schedules housekeeping
  // batches, so these drive the sink by polling row counts, not
  // processAllAvailable. Survival and eviction are pinned by SEPARATE
  // queries whose assertions are each robust to scheduler delay in the
  // direction delay pushes them: a slow box can only make the long-TTL
  // state live longer and the short-TTL eviction more certain. (The
  // first combined version raced the full-suite load: the within-TTL
  // event's micro-batch could slip past a 2 s TTL.)
  private def runGcraTtl(name: String, ttl: Duration)
                        (drive: (MemoryStream[GcraThrottler.Event], Int => Unit) => Unit)
      : Map[Long, Boolean] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[GcraThrottler.Event]
    val q = GcraThrottler.throttleTws(mem.toDS(), rps = 1.0, ttl = Some(ttl))
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Streams.newCheckpointDir())
      .start()
    def awaitRows(n: Int): Unit = {
      var tries = 0
      while (spark.table(name).count() < n && tries < 600) {
        Thread.sleep(100); tries += 1
      }
      assert(spark.table(name).count() >= n, s"sink never reached $n rows")
    }
    drive(mem, awaitRows)
    q.stop()
    spark.table(name).as[GcraThrottler.Result]
      .collect().map(r => r.id -> r.admitted).toMap
  }

  test("GCRA TTL soundness guard: ttl < burst + cost is rejected") {
    // rps = 1 -> cost 1 s, burst 0: a 500 ms TTL could evict live
    // throttle debt and over-admit — the constructor must refuse it
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[GcraThrottler.Event]
    val e = intercept[IllegalArgumentException] {
      GcraThrottler.throttleTws(mem.toDS(), rps = 1.0,
        ttl = Some(Duration.ofMillis(500)))
    }
    assert(e.getMessage.contains("burst + cost"))
  }

  test("GCRA TTL: state survives within a generous TTL (event throttled)") {
    withRocksDb {
      val base = 1700000000000000000L
      val got = runGcraTtl("gcra_ttl_live", Duration.ofMinutes(5)) { (mem, await) =>
        mem.addData(GcraThrottler.Event("k", base, 1))
        await(1)
        mem.addData(GcraThrottler.Event("k", base + 100000000L, 2)) // +100ms
        await(2)
      }
      assert(got == Map(1L -> true, 2L -> false))
    }
  }

  test("GCRA TTL: an idle key is evicted and a post-TTL event admits afresh") {
    withRocksDb {
      val base = 1700000000000000000L
      val got = runGcraTtl("gcra_ttl_evict", Duration.ofSeconds(2)) { (mem, await) =>
        mem.addData(GcraThrottler.Event("k", base, 1))
        await(1)
        // let the 2 s TTL lapse, then send an event only 200 ms later in
        // EVENT time: live state would throttle it (see the survival
        // test); eviction makes it admit afresh
        Thread.sleep(3500)
        mem.addData(GcraThrottler.Event("k", base + 200000000L, 3))
        await(2)
      }
      assert(got == Map(1L -> true, 3L -> true))
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
