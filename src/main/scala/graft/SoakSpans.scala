package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Scale soak for duplicated-span extraction
  * ([[graft.llm.Dedup.dupSpans]]): a corpus far past the oracle SFs with
  * PLANTED shared runs is swept for cross-document duplicated spans, and
  * the answer is checked against the planted expectation by
  * construction (every 100th doc carries the same 20-token run at
  * positions 40-59; all other tokens are globally unique, so the exact
  * expected output is one (40, 59, 20) span per planted doc and nothing
  * else). Runs BOTH window encodings to measure the hashed-window
  * shuffle dividend: `hash` ships 8-byte WindowHashes through the two
  * shuffles, `string` ships the literal W-token window strings (the
  * collision-free cross-check). Shuffle-write bytes are tallied by a
  * SparkListener — the claim is a measured ratio, not an estimate.
  * Results recorded in BASELINE.md; this main keeps them reproducible.
  *
  * {{{ runMain graft.SoakSpans [nDocs] [tokensPerDoc] [modes] }}}
  *
  * `modes` = `hash`, `string`, or `both` (default both).
  */
object SoakSpans {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val tokens = if (args.length > 1) args(1).toInt else 100
    val modes = if (args.length > 2) args(2) else "both"
    require(Set("hash", "string", "both")(modes),
      s"modes must be hash|string|both, got '$modes'")
    require(tokens >= 61, "planted run sits at positions 40-59; need >= 61 tokens")
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-spans-").toString

    // every 100th doc carries the shared run; everything else is unique
    // per (doc, position) so no accidental duplicate window can exist
    spark.range(n)
      .selectExpr("id AS doc_id",
        s"""concat_ws(' ', transform(sequence(1, $tokens), i ->
           |  CASE WHEN id % 100 = 0 AND i BETWEEN 41 AND 60
           |       THEN concat('s', i)
           |       ELSE concat('u', id, '_', i) END)) AS text""".stripMargin)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/corpus")
    val corpus = spark.read.parquet(s"$dir/corpus")

    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleBytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val expectedDocs = (n + 99) / 100
    def run(name: String, hashWindows: Boolean): String = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val out = graft.llm.Dedup.dupSpans(corpus, w = 8, hashWindows = hashWindows)
      out.write.mode("overwrite").parquet(s"$dir/$name")
      val sec = (System.nanoTime() - t0) / 1e9
      val sb = shuffleBytes.get()
      val got = spark.read.parquet(s"$dir/$name")
      val rows = got.count()
      val exact = got.filter(
        "span_start = 40 AND span_end = 59 AND span_tokens = 20").count()
      f""""$name":{"sec":$sec%.1f,"rows":$rows,"exact_planted":$exact,""" +
        s""""expected":$expectedDocs,"shuffle_bytes":$sb}"""
    }

    /** The cut APPLICATION at the same scale: every planted doc except
      * the keeper (doc 0, the min id carrying the shared run) loses
      * exactly the 20 run positions; everything else keeps its full
      * text. Checks the per-doc reassembly agg holds up at corpus size
      * and that token conservation is exact. */
    def runCut(): String = {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val out = graft.llm.Dedup.cutDupSpans(corpus, w = 8)
      out.write.mode("overwrite").parquet(s"$dir/cut")
      val sec = (System.nanoTime() - t0) / 1e9
      val sb = shuffleBytes.get()
      val got = spark.read.parquet(s"$dir/cut")
      val rows = got.count()
      val cut80 = got.filter(s"n_tok = $tokens AND n_kept = ${tokens - 20}").count()
      val intact = got.filter(s"n_kept = $tokens").count()
      f""""cut":{"sec":$sec%.1f,"rows":$rows,"docs_cut_20":$cut80,""" +
        s""""docs_intact":$intact,"expected_cut":${expectedDocs - 1},""" +
        s""""expected_intact":${n - expectedDocs + 1},"shuffle_bytes":$sb}"""
    }

    val parts = Seq(
      (modes != "string") -> (() => run("hash", hashWindows = true)),
      (modes != "hash") -> (() => run("string", hashWindows = false)),
      (modes != "string") -> (() => runCut())
    ).collect { case (true, r) => r() }

    println(s"""{"soak":"spans","n_docs":$n,"tokens_per_doc":$tokens,""" +
      s""""w":8,""" + parts.mkString(",") + "}")
    spark.stop()
  }
}
