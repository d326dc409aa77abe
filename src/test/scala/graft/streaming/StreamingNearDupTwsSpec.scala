package graft.streaming

import java.time.Duration

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingNearDupTwsSpec extends SparkSpec {
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

  private val base =
    "the quick brown fox jumps over the lazy dog and then runs far away home " +
    "while the moon rises slowly over the quiet hills beyond the winding river"
  private def variant(word: String): String = {
    val toks = base.split(" "); toks(5) = word; toks.mkString(" ")
  }
  private val unrelated =
    "completely different text with nothing shared at all among any token " +
    "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi pi rho"

  test("tws near-dup finds cross-batch pairs and matches the classic operator") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val q = StreamingNearDupTws.pairs(mem.toDF().toDF("doc_id", "text"),
          "text", "doc_id", shingleN = 3, threshold = 0.5)
        .writeStream.format("memory").queryName("neardup_tws_out")
        .outputMode("append")
        .option("checkpointLocation", Streams.newCheckpointDir())
        .start()
      // batch 1: the original + an unrelated doc — nothing pairs yet
      mem.addData((1L, base), (10L, unrelated))
      q.processAllAvailable()
      assert(spark.table("neardup_tws_out").isEmpty)
      // batch 2: a near-dup of doc 1 must pair with STATE from batch 1
      mem.addData((2L, variant("wolf")))
      q.processAllAvailable()
      // batch 3: pairs with both 1 and 2
      mem.addData((3L, variant("bear")))
      q.processAllAvailable()
      q.stop()
      val twsPairs = spark.table("neardup_tws_out").as[StreamingNearDup.Pair]
        .collect().map(p => (p.id_a, p.id_b, p.est_jaccard)).distinct.toSet
      assert(twsPairs.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 3L), (2L, 3L)))

      // exact parity — ids AND estimated jaccard — with the classic
      // flatMapGroupsWithState operator fed the same corpus in the same
      // batch order
      val mem2 = MemoryStream[(Long, String)]
      val q2 = StreamingNearDup.pairs(mem2.toDF().toDF("doc_id", "text"),
          "text", "doc_id", shingleN = 3, threshold = 0.5)
        .writeStream.format("memory").queryName("neardup_classic_ref")
        .outputMode("append")
        .option("checkpointLocation", Streams.newCheckpointDir())
        .start()
      mem2.addData((1L, base), (10L, unrelated)); q2.processAllAvailable()
      mem2.addData((2L, variant("wolf"))); q2.processAllAvailable()
      mem2.addData((3L, variant("bear"))); q2.processAllAvailable()
      q2.stop()
      val classicPairs = spark.table("neardup_classic_ref").as[StreamingNearDup.Pair]
        .collect().map(p => (p.id_a, p.id_b, p.est_jaccard)).distinct.toSet
      assert(twsPairs == classicPairs)
    }
  }

  test("within-batch pairs match the batch LSH operator") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val q = StreamingNearDupTws.pairs(mem.toDF().toDF("doc_id", "text"),
          "text", "doc_id", shingleN = 3, threshold = 0.5)
        .writeStream.format("memory").queryName("neardup_tws_batch1")
        .outputMode("append")
        .option("checkpointLocation", Streams.newCheckpointDir())
        .start()
      mem.addData((1L, base), (2L, variant("cat")), (10L, unrelated))
      q.processAllAvailable()
      q.stop()
      val streamPairs = spark.table("neardup_tws_batch1").as[StreamingNearDup.Pair]
        .collect().map(p => (p.id_a, p.id_b)).distinct.toSet
      val batchPairs = graft.llm.Dedup.minhashLshPairs(
          Seq((1L, base), (2L, variant("cat")), (10L, unrelated)).toDF("doc_id", "text"),
          "text", "doc_id", shingleN = 3, threshold = 0.5)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(streamPairs == batchPairs)
      assert(streamPairs == Set((1L, 2L)))
    }
  }

  test("ttl variant analyzes and starts in ProcessingTime mode") {
    // native per-entry TTL — ProcessingTime mode schedules housekeeping
    // batches continuously, so assert construct/start/first-batch only
    // (the drain-and-stop harness never settles), as in TtlDedupSpec
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val q = StreamingNearDupTws.pairs(mem.toDF().toDF("doc_id", "text"),
          "text", "doc_id", shingleN = 3, threshold = 0.5,
          ttl = Some(Duration.ofHours(1)))
        .writeStream.format("memory").queryName("neardup_tws_ttl")
        .outputMode("append")
        .option("checkpointLocation", Streams.newCheckpointDir())
        .start()
      mem.addData((1L, base), (2L, variant("wolf")))
      // one real micro-batch: wait until the sink sees the pair
      var tries = 0
      while (spark.table("neardup_tws_ttl").isEmpty && tries < 600) {
        Thread.sleep(100); tries += 1
      }
      q.stop()
      val pairs = spark.table("neardup_tws_ttl").as[StreamingNearDup.Pair]
        .collect().map(p => (p.id_a, p.id_b)).distinct.toSet
      assert(pairs == Set((1L, 2L)))
    }
  }
}
