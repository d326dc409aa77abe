package graft.streaming

import graft.SparkSpec
import graft.llm.Retrieval

/** Streaming ingest into the persisted positional phrase index:
  * micro-batches append position generations (first batch bootstraps),
  * and the drained index answers phrase queries — through BOTH the
  * plain and the rarest-term-pruned search — row-identically to the
  * ad-hoc phrase search over the union of every batch. */
class StreamingPhraseIngestSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat on the log"),
    (2L, "zebra zebra zebra runs"),
    (3L, "the the the the the"),
    (4L, "cat dog zebra"),
    (5L, "log mat runs"))

  private def queries = Seq((1L, "the cat"), (2L, "sat on"),
    (3L, "zebra zebra")).toDF("query_id", "qtext")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Int)] =
    df.select($"query_id", $"doc_id", $"phrase_tf", $"rnk")
      .as[(Long, Long, Long, Int)].collect().toSet

  private def runIngest(compactEvery: Int): String = {
    val idx = java.nio.file.Files.createTempDirectory("graft-spi-idx-").toString + "/index"
    val srcDir = java.nio.file.Files.createTempDirectory("graft-spi-src-").toString
    corpus.grouped(2).foreach(b =>
      b.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir))
    val schema = spark.read.parquet(srcDir).schema
    val src = Streams.fileSource(spark, srcDir, schema, maxFilesPerTrigger = Some(1))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    StreamingPhraseIngest.run(src, "text", "doc_id", idx,
      compactEvery = compactEvery, (_, n) => seen += n)
    assert(seen.sum == corpus.length, s"appended rows: $seen")
    assert(seen.size == 3) // one callback per non-empty micro-batch
    idx
  }

  test("drained ingest answers phrases like a one-shot batch build") {
    val idx = runIngest(compactEvery = 0)
    val adhoc = rows(Retrieval.phraseTopK(corpus.toDF("doc_id", "text"),
      queries, k = 10))
    assert(rows(Retrieval.phraseSearchIndex(queries, idx, k = 10)) == adhoc)
    // the stats slice accumulated across batches, so the selective
    // search works off the streamed index too
    assert(rows(Retrieval.phraseSearchIndexSelective(queries, idx, k = 10))
      == adhoc)
  }

  test("per-batch compaction cadence preserves phrase answers") {
    val idx = runIngest(compactEvery = 1)
    assert(rows(Retrieval.phraseSearchIndex(queries, idx, k = 10)) ==
      rows(Retrieval.phraseTopK(corpus.toDF("doc_id", "text"), queries, k = 10)))
  }

  test("exactly-once ingest: drained index matches ad-hoc; redeliveries skip") {
    val idx = java.nio.file.Files.createTempDirectory("graft-spi-xo-")
      .toString + "/index"
    val srcDir = java.nio.file.Files.createTempDirectory("graft-spi-xsrc-")
      .toString
    corpus.grouped(2).foreach(b =>
      b.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir))
    val schema = spark.read.parquet(srcDir).schema
    val src = Streams.fileSource(spark, srcDir, schema, maxFilesPerTrigger = Some(1))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    StreamingPhraseIngest.runExactlyOnce(src, "text", "doc_id", idx,
      compactEvery = 2, (id, _, applied) => seen += ((id, applied)))
    assert(seen.map(_._1).distinct.size == 3 && seen.forall(_._2))
    val adhoc = rows(Retrieval.phraseTopK(corpus.toDF("doc_id", "text"),
      queries, k = 10))
    assert(rows(Retrieval.phraseSearchIndex(queries, idx, k = 10)) == adhoc)
    assert(rows(Retrieval.phraseSearchIndexSelective(queries, idx, k = 10))
      == adhoc)
    // redeliver every admitted batch id: skipped, answers unchanged
    val all = corpus.toDF("doc_id", "text")
    seen.map(_._1).foreach { id =>
      assert(!Retrieval.phraseIndexAppendBatch(all, "text", "doc_id", idx, id))
    }
    assert(rows(Retrieval.phraseSearchIndex(queries, idx, k = 10)) == adhoc)
  }
}
