package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and then runs far away home " +
    "while the moon rises slowly over the quiet hills beyond the winding river"
  private def variant(word: String): String = {
    val toks = base.split(" "); toks(5) = word; toks.mkString(" ")
  }
  private val unrelated =
    "completely different text with nothing shared at all among any token " +
    "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi pi rho"

  test("streaming near-dup finds cross-batch pairs, skips unrelated docs") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingNearDup.pairs(mem.toDF().toDF("doc_id", "text"),
        "text", "doc_id", shingleN = 3, threshold = 0.5)
      .writeStream.format("memory").queryName("neardup_out")
      .outputMode("append")
      .option("checkpointLocation", Streams.newCheckpointDir())
      .start()
    // batch 1: the original + an unrelated doc
    mem.addData((1L, base), (10L, unrelated))
    q.processAllAvailable()
    val afterB1 = spark.table("neardup_out").as[StreamingNearDup.Pair].collect()
    assert(afterB1.isEmpty) // nothing similar yet
    // batch 2: a near-dup of doc 1 must pair with STATE from batch 1
    mem.addData((2L, variant("wolf")))
    q.processAllAvailable()
    // batch 3: another near-dup — pairs with both 1 and 2
    mem.addData((3L, variant("bear")))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_out").as[StreamingNearDup.Pair]
      .collect().map(p => (p.id_a, p.id_b)).distinct.toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val sims = spark.table("neardup_out").as[StreamingNearDup.Pair].collect()
    assert(sims.forall(p => p.est_jaccard >= 0.5 && p.est_jaccard <= 1.0))
  }

  test("within-batch pairs are found too, and match the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = StreamingNearDup.pairs(mem.toDF().toDF("doc_id", "text"),
        "text", "doc_id", shingleN = 3, threshold = 0.5)
      .writeStream.format("memory").queryName("neardup_batch1")
      .outputMode("append")
      .option("checkpointLocation", Streams.newCheckpointDir())
      .start()
    mem.addData((1L, base), (2L, variant("cat")), (10L, unrelated))
    q.processAllAvailable()
    q.stop()
    val streamPairs = spark.table("neardup_batch1").as[StreamingNearDup.Pair]
      .collect().map(p => (p.id_a, p.id_b)).distinct.toSet
    val batchPairs = graft.llm.Dedup.minhashLshPairs(
        Seq((1L, base), (2L, variant("cat")), (10L, unrelated)).toDF("doc_id", "text"),
        "text", "doc_id", shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(streamPairs == batchPairs)
    assert(streamPairs == Set((1L, 2L)))
  }

  test("bucket state is bounded by maxBucket") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // maxBucket=2: after 3 identical docs, the oldest falls out of state,
    // so doc 4 pairs only with the 2 newest predecessors
    val q = StreamingNearDup.pairs(mem.toDF().toDF("doc_id", "text"),
        "text", "doc_id", shingleN = 3, threshold = 0.5, maxBucket = 2)
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode("append")
      .option("checkpointLocation", Streams.newCheckpointDir())
      .start()
    mem.addData((1L, base)); q.processAllAvailable()
    mem.addData((2L, base)); q.processAllAvailable()
    mem.addData((3L, base)); q.processAllAvailable()
    mem.addData((4L, base)); q.processAllAvailable()
    q.stop()
    val pairs = spark.table("neardup_cap").as[StreamingNearDup.Pair]
      .collect().map(p => (p.id_a, p.id_b)).distinct.toSet
    assert(pairs.contains((2L, 4L)) && pairs.contains((3L, 4L)))
    assert(!pairs.contains((1L, 4L))) // evicted before doc 4 arrived
  }
}
