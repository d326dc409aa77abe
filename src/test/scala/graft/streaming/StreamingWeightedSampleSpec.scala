package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.llm.Sampling

/** The streaming reservoir must be the SAME sample as the batch A-ES
  * sampler on the same data (the duality contract): the rank key is a
  * pure row function shared between them, so only top-k maintenance
  * differs — and a reservoir of the k largest keys is exactly the
  * batch top-k. */
class StreamingWeightedSampleSpec extends SparkSpec {
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

  /** Run rows through the streaming sampler in `batches` chunks and
    * return the FINAL snapshot per group: (group, id) -> rank. */
  private def drained(rows: Seq[(Long, String, Long)], k: Int,
                      batches: Int, name: String): Map[(String, Long), Int] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String, Long)]
      val q = StreamingWeightedSample.sample(
          mem.toDF().toDF("id", "g", "w"), "g", "id", "w", k)
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", Streams.newCheckpointDir())
        .start()
      rows.grouped(math.max(1, rows.size / batches)).foreach { chunk =>
        mem.addData(chunk: _*)
        q.processAllAvailable()
      }
      q.stop()
      val snap = spark.table(name).as[StreamingWeightedSample.Kept].collect()
      val lastGen = snap.groupBy(_.group).view.mapValues(_.map(_.gen).max).toMap
      snap.filter(r => r.gen == lastGen(r.group))
        .map(r => (r.group, r.id) -> r.sample_rank).toMap
    }

  test("string id columns are rejected loudly (numeric tie-break contract)") {
    // a silent cast("long") would null string ids and crash the tuple
    // encoder deep inside the stream; the schema check names the
    // contract (batch ties break by NUMERIC id order) up front
    val df = Seq(("a", "g", 1.0)).toDF("id", "g", "w")
    val ex = intercept[IllegalArgumentException] {
      StreamingWeightedSample.sample(df, "g", "id", "w", k = 2)
    }
    assert(ex.getMessage.contains("integral id column"), ex.getMessage)
  }

  test("drained stream == batch sample, across multiple micro-batches") {
    val rows = (0L until 400L).map(i => (i, s"g${i % 3}", 1L + i % 9))
    val streamed = drained(rows, k = 12, batches = 5, "wsample_parity")
    val batch = Sampling.weightedSample(rows.toDF("id", "g", "w"),
        Seq("g"), "id", "w", k = 12)
      .select($"g", $"id", $"sample_rank").as[(String, Long, Int)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("retried rows are harmless: duplicate ids dedup inside the reservoir") {
    val rows = (0L until 100L).map(i => (i, "g", 2L))
    val withRetries = rows ++ rows.take(30) // redeliver the first 30
    val streamed = drained(withRetries, k = 10, batches = 4, "wsample_retry")
    val batch = Sampling.weightedSample(rows.toDF("id", "g", "w"),
        Seq("g"), "id", "w", k = 10)
      .select($"g", $"id", $"sample_rank").as[(String, Long, Int)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed == batch)
  }

  test("state is bounded: snapshots never exceed k rows per stratum") {
    val rows = (0L until 600L).map(i => (i, s"g${i % 2}", 1L))
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String, Long)]
      val q = StreamingWeightedSample.sample(
          mem.toDF().toDF("id", "g", "w"), "g", "id", "w", k = 7)
        .writeStream.format("memory").queryName("wsample_bound")
        .outputMode("append")
        .option("checkpointLocation", Streams.newCheckpointDir())
        .start()
      rows.grouped(200).foreach { chunk =>
        mem.addData(chunk: _*); q.processAllAvailable()
      }
      q.stop()
      // every emitted generation (the state snapshot) holds <= k rows
      val perGen = spark.table("wsample_bound")
        .as[StreamingWeightedSample.Kept].collect()
        .groupBy(r => (r.group, r.gen)).view.mapValues(_.length)
      assert(perGen.values.forall(_ <= 7))
      assert(perGen.nonEmpty)
    }
  }

  test("non-positive weights are excluded, matching the batch filter") {
    val rows = (0L until 60L).map(i => (i, "g", if (i < 30) 0L else 4L))
    val streamed = drained(rows, k = 40, batches = 3, "wsample_nonpos")
    assert(streamed.keySet.map(_._2).forall(_ >= 30L))
    assert(streamed.size == 30)
  }
}
