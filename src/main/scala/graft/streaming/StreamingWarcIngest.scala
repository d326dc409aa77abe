package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.Warc

/** Streaming crawl front door: drain a drop zone of WARC/WET
  * containers into the curation surface as they land. MANIFEST-driven
  * — the stream tails a directory of manifest files (one container
  * path per line, the shape crawl fetchers emit per segment) and each
  * micro-batch runs the [[Warc]] per-file streaming kernel over just
  * that batch's containers. Tailing manifests instead of the (binary,
  * gzip) containers themselves keeps Structured Streaming's file
  * tracking on tiny text files while container bytes flow through
  * `binaryFiles` untouched — a 1 GB segment never materializes as a
  * row.
  *
  * Delivery is at-least-once per container (foreachBatch redelivery
  * re-appends a batch's documents): dedup downstream by `doc_id`
  * (WARC record ids are unique by spec — `Dedup.exact` collapses
  * redelivered copies), or feed an exactly-once index ingest keyed by
  * (streamId, batchId) instead of a raw parquet sink. */
object StreamingWarcIngest {

  /** Tail `manifestDir` with Trigger.AvailableNow, appending each
    * batch's extracted documents (the [[Warc.documents]] schema) to
    * `outDir`; blocks until drained. `onBatch` receives (batchId,
    * containers processed). */
  def run(spark: SparkSession, manifestDir: String, outDir: String,
          maxBodyBytes: Int = 16 << 20,
          onBatch: (Long, Int) => Unit = (_, _) => ()): StreamingQuery = {
    val manifests = spark.readStream.format("text").load(manifestDir)
    Streams.runForeachBatch(manifests.toDF(), (batch, batchId) => {
      // bounded driver collect: rows are container PATHS (~100 bytes
      // each), one manifest line per fetched segment — a batch holds a
      // fetcher cycle's worth of paths, not corpus data; a billion-
      // container backlog is ~100 MB of paths and would be split
      // across triggers by maxFilesPerTrigger on the manifest stream
      val files = batch.collect().map(_.getString(0))
        .map(_.trim).filter(_.nonEmpty)
      if (files.nonEmpty) {
        Warc.documents(spark, files.mkString(","), maxBodyBytes)
          // committer v1: a crashed batch append leaves outDir
          // row-identical, so the redelivered batch appends ONCE (v2
          // task commits would leave partial rows the redelivery then
          // duplicates — see [[graft.llm.GenDir.V1AppendCommitter]])
          .write.options(graft.llm.GenDir.V1AppendCommitter)
          .mode("append").parquet(outDir)
        onBatch(batchId, files.length)
      }
    })
  }
}
