package graft.streaming

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The streaming interval join must be the batch overlap join drained
  * through micro-batches: same closed-interval predicate, pairs
  * complete across batch splits (generous watermark), and — the part
  * that makes it a STREAM — join state must stop growing once the
  * watermark passes old rows. */
class StreamingIntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000L // epoch seconds

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def brute(as: Seq[(Long, Long, Long)], bs: Seq[(Long, Long, Long)])
      : Set[(Long, Long)] =
    (for {
      (ia, sa, ea) <- as
      (ib, sb, eb) <- bs
      if sa <= eb && sb <= ea
    } yield (ia, ib)).toSet

  test("drained stream-stream overlap equals the batch quadratic join") {
    implicit val sqlCtx = spark.sqlContext
    val rng = new scala.util.Random(23)
    // intervals of length <= 80 s scattered over ~20 min; maxLen 100 s
    def gen(n: Int, idBase: Long): Seq[(Long, Long, Long)] =
      (0 until n).map { i =>
        val s = base + rng.nextInt(1200)
        (idBase + i, s, s + 1 + rng.nextInt(80))
      }
    val as = gen(60, 0L)
    val bs = gen(60, 10000L)

    val memL = MemoryStream[(Long, Timestamp, Timestamp)]
    val memR = MemoryStream[(Long, Timestamp, Timestamp)]
    val joined = StreamingIntervalJoin.overlaps(
        memL.toDF().toDF("id_a", "a_s", "a_e"),
        memR.toDF().toDF("id_b", "b_s", "b_e"),
        "a_s", "a_e", "b_s", "b_e",
        maxIntervalLen = Duration.ofSeconds(100),
        watermarkDelay = Duration.ofHours(1)) // generous: no late drops
      .select($"id_a", $"id_b")
    val q = joined.writeStream.format("memory").queryName("sij_parity")
      .outputMode("append")
      .option("checkpointLocation", Streams.newCheckpointDir())
      .start()
    // interleave both sides over three batches: pairs must form across
    // batch boundaries, not just within them
    Seq(as.grouped(20).toSeq, bs.grouped(20).toSeq).transpose.foreach {
      case Seq(ca, cb) =>
        memL.addData(ca.map { case (i, s, e) => (i, ts(s), ts(e)) }: _*)
        memR.addData(cb.map { case (i, s, e) => (i, ts(s), ts(e)) }: _*)
        q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("sij_parity").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "a pair was emitted twice")
    assert(got.toSet == brute(as, bs))
    assert(got.nonEmpty)
  }

  test("sub-second maxIntervalLen rounds UP: 1500 ms keeps a 1.5 s start delta") {
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp, Timestamp)]
    val memR = MemoryStream[(Long, Timestamp, Timestamp)]
    val joined = StreamingIntervalJoin.overlaps(
        memL.toDF().toDF("id_a", "a_s", "a_e"),
        memR.toDF().toDF("id_b", "b_s", "b_e"),
        "a_s", "a_e", "b_s", "b_e",
        maxIntervalLen = Duration.ofMillis(1500),
        watermarkDelay = Duration.ofHours(1))
      .select($"id_a", $"id_b")
    val q = joined.writeStream.format("memory").queryName("sij_subsec")
      .outputMode("append")
      .option("checkpointLocation", Streams.newCheckpointDir())
      .start()
    // left [0 ms, 1500 ms], right [1500 ms, 3000 ms]: closed-interval
    // overlap at the touching endpoint, start delta exactly 1.5 s —
    // a bound truncated to 1 s drops it; the rounded-up 2 s bound keeps it
    val t0 = base * 1000L
    memL.addData((1L, new Timestamp(t0), new Timestamp(t0 + 1500)))
    memR.addData((2L, new Timestamp(t0 + 1500), new Timestamp(t0 + 3000)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sij_subsec").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("watermark + range bound evicts join state (state is bounded)") {
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(Long, Timestamp, Timestamp)]
    val memR = MemoryStream[(Long, Timestamp, Timestamp)]
    val joined = StreamingIntervalJoin.overlaps(
        memL.toDF().toDF("id_a", "a_s", "a_e"),
        memR.toDF().toDF("id_b", "b_s", "b_e"),
        "a_s", "a_e", "b_s", "b_e",
        maxIntervalLen = Duration.ofSeconds(10),
        watermarkDelay = Duration.ofSeconds(0))
    val q = joined.writeStream.format("memory").queryName("sij_state")
      .outputMode("append")
      .option("checkpointLocation", Streams.newCheckpointDir())
      .start()
    // batch 1: 200 rows per side around `base`
    memL.addData((0 until 200).map(i =>
      (i.toLong, ts(base + i % 20), ts(base + i % 20 + 5))): _*)
    memR.addData((0 until 200).map(i =>
      (1000L + i, ts(base + i % 20), ts(base + i % 20 + 5))): _*)
    q.processAllAvailable()
    // batch 2: a few rows a DAY later — the watermark sweeps past
    // batch 1, whose state becomes evictable under the range bound
    memL.addData((0 until 4).map(i =>
      (5000L + i, ts(base + 86400 + i), ts(base + 86400 + i + 5))): _*)
    memR.addData((0 until 4).map(i =>
      (6000L + i, ts(base + 86400 + i), ts(base + 86400 + i + 5))): _*)
    q.processAllAvailable()
    // one more tick so eviction from the advanced watermark lands
    memL.addData((0 until 2).map(i =>
      (7000L + i, ts(base + 86410 + i), ts(base + 86410 + i + 5))): _*)
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    // 410 rows entered; retained state must be far smaller than the
    // full history (only the last day's tail can be live)
    assert(stateRows < 100, s"join state held $stateRows rows — not evicting")
  }
}
