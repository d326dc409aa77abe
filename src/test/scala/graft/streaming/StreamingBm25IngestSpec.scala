package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Retrieval

/** Streaming corpus ingest into the persisted BM25 index: micro-batches
  * append postings (first batch bootstraps the index), searches between
  * and after batches see everything admitted so far, and the result is
  * row-identical to a one-shot batch build over the union. */
class StreamingBm25IngestSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog sat on the log"),
    (2L, "zebra zebra zebra runs"),
    (3L, "the the the the the"),
    (4L, "cat dog zebra"),
    (5L, "log mat runs"))

  private def queries = Seq((1L, "the cat zebra"), (2L, "dog log"))
    .toDF("query_id", "qtext")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Int)] =
    df.select($"query_id", $"doc_id", $"score_ppm", $"rnk")
      .as[(Long, Long, Long, Int)].collect().toSet

  private def runIngest(compactEvery: Int): String = {
    val idx = java.nio.file.Files.createTempDirectory("graft-sbi-idx-").toString + "/index"
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sbi-src-").toString
    corpus.grouped(2).foreach(b =>
      b.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir))
    val schema = spark.read.parquet(srcDir).schema
    val src = Streams.fileSource(spark, srcDir, schema, maxFilesPerTrigger = Some(1))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    StreamingBm25Ingest.run(src, "text", "doc_id", idx,
      compactEvery = compactEvery, (_, n) => seen += n)
    assert(seen.sum == corpus.length, s"appended rows: $seen")
    assert(seen.size == 3) // one callback per non-empty micro-batch
    idx
  }

  test("drained ingest equals a one-shot batch build (bootstrap + appends)") {
    val idx = runIngest(compactEvery = 0)
    assert(rows(Retrieval.bm25SearchIndex(queries, idx, k = 10)) ==
      rows(Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), queries, k = 10)))
    // idf reflects the full admitted corpus
    assert(spark.read.parquet(s"$idx/meta").head().getLong(0) == corpus.length)
  }

  test("per-batch compaction cadence preserves answers") {
    val idx = runIngest(compactEvery = 1)
    assert(rows(Retrieval.bm25SearchIndex(queries, idx, k = 10)) ==
      rows(Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), queries, k = 10)))
  }

  test("exactly-once ingest: drained index matches one-shot build; " +
      "redelivered batches are skipped") {
    val idx = java.nio.file.Files.createTempDirectory("graft-sbi-xo-")
      .toString + "/index"
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sbi-xsrc-")
      .toString
    corpus.grouped(2).foreach(b =>
      b.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir))
    val schema = spark.read.parquet(srcDir).schema
    val src = Streams.fileSource(spark, srcDir, schema, maxFilesPerTrigger = Some(1))
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    StreamingBm25Ingest.runExactlyOnce(src, "text", "doc_id", idx,
      compactEvery = 2, (id, _, applied) => seen += ((id, applied)))
    assert(seen.map(_._1).distinct.size == 3)
    assert(seen.forall(_._2), "a first-delivery batch reported skipped")
    def got() = rows(Retrieval.bm25SearchIndex(queries, idx, k = 10))
    val want = rows(Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
      queries, k = 10))
    assert(got() == want)
    assert(Retrieval.bm25IndexTotals(spark, idx) ==
      ((corpus.length.toLong, 27L))) // 6+6+4+5+3+3 admitted tokens
    // redeliver every admitted batch id: all skipped, index unchanged
    val all = corpus.toDF("doc_id", "text")
    seen.map(_._1).foreach { id =>
      assert(!Retrieval.bm25IndexAppendBatch(all, "text", "doc_id", idx, id))
    }
    assert(got() == want)
    assert(Retrieval.bm25IndexTotals(spark, idx) ==
      ((corpus.length.toLong, 27L)))
  }

  test("fresh-checkpoint restart under a fresh stream id keeps appending " +
      "(stream-scoped markers close the batchId collision trap)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-sbi-sid-")
      .toString + "/index"
    val (half1, half2) = corpus.splitAt(4)
    def drain(docs: Seq[(Long, String)], streamId: String): Unit = {
      // each runForeachBatch call takes a FRESH checkpoint, so every
      // lineage here restarts batchId at 0 — exactly the restart shape
      // the stream id exists to disambiguate
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft-sbi-sid-src-").toString
      docs.grouped(2).foreach(b => b.toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(srcDir))
      val schema = spark.read.parquet(srcDir).schema
      val src = Streams.fileSource(spark, srcDir, schema,
        maxFilesPerTrigger = Some(1))
      StreamingBm25Ingest.runExactlyOnce(src, "text", "doc_id", idx,
        streamId = streamId)
    }
    drain(half1, "lineage-a") // bootstraps; batch ids 0, 1
    drain(half2, "lineage-b") // fresh lineage, batch id 0 again — applies
    assert(rows(Retrieval.bm25SearchIndex(queries, idx, k = 10)) ==
      rows(Retrieval.bm25TopK(corpus.toDF("doc_id", "text"), queries,
        k = 10)))
    assert(Retrieval.bm25IndexTotals(spark, idx) ==
      ((corpus.length.toLong, 27L)))
    // the trap itself, pinned: replaying a lineage REUSES its stream id
    // (the checkpoint-kept restart), and every batch is skipped
    drain(half2, "lineage-b")
    assert(Retrieval.bm25IndexTotals(spark, idx) ==
      ((corpus.length.toLong, 27L)))
  }
}
