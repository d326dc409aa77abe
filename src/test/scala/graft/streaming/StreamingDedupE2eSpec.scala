package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** End-to-end ingest-time dedup clustering: StreamingNearDup emits
  * candidate pairs per micro-batch and StreamingCC folds them into the
  * persisted cluster state — the streaming rendering of
  * `Dedup.resolveClusters`, with no batch re-scan anywhere in the loop.
  */
class StreamingDedupE2eSpec extends SparkSpec {
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
  private val unrelated2 =
    "unrelated second family of words entirely disjoint vocabulary here " +
    "lambda sigma tau upsilon phi chi psi omega aleph bet gimel dalet hey vav"

  test("near-dup pairs stream into incremental cluster state") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = Files.createTempDirectory("e2e_cc").toString
    val mem = MemoryStream[(Long, String)]
    val pairs = StreamingNearDup.pairs(mem.toDF().toDF("doc_id", "text"),
      "text", "doc_id", shingleN = 3, threshold = 0.5)
    val q = StreamingCC.sink(pairs.toDF(), "id_a", "id_b", stateDir)
      .option("checkpointLocation", Streams.newCheckpointDir())
      .start()
    // batch 1: two unrelated docs — no pairs, no clusters
    mem.addData((1L, base), (10L, unrelated))
    q.processAllAvailable()
    assert(StreamingCC.currentMapping(spark, stateDir).isEmpty)
    // batch 2: near-dups of doc 1 arrive -> cluster {1,2} forms
    mem.addData((2L, variant("wolf")))
    q.processAllAvailable()
    assert(StreamingCC.currentMapping(spark, stateDir)
      .as[(Long, Long)].collect().toMap == Map(2L -> 1L))
    // batch 3: one more near-dup of 1, plus a near-dup of 10 -> two clusters
    mem.addData((3L, variant("bear")),
      (11L, unrelated.replace("alpha", "omega")))
    q.processAllAvailable()
    q.stop()
    val clusters = StreamingCC.currentMapping(spark, stateDir)
      .as[(Long, Long)].collect().toMap
    assert(clusters == Map(2L -> 1L, 3L -> 1L, 11L -> 10L))
    // parity: the batch path over the same corpus resolves identically
    val batchClusters = graft.llm.Dedup.resolveClusters(
        Seq((1L, base), (2L, variant("wolf")), (3L, variant("bear")),
          (10L, unrelated), (11L, unrelated.replace("alpha", "omega")),
          (20L, unrelated2)).toDF("doc_id", "text"),
        "text", "doc_id", shingleN = 3, threshold = 0.5)
      .filter(!$"keep" || $"cluster_root" =!= $"doc_id")
      .select($"doc_id", $"cluster_root")
      .filter($"doc_id" =!= $"cluster_root")
      .as[(Long, Long)].collect().toMap
    assert(clusters == batchClusters)
  }
}
