package graft

import org.apache.spark.sql.functions._

/** Scale soak for the dedup path: a synthetic dup-heavy corpus far past
  * the oracle SFs, driven end-to-end through
  * [[graft.llm.Dedup.resolveClusters]] (distributed=true) and
  * [[graft.streaming.StreamingNearDup]], reporting the observables the
  * 100-TB story rests on: LSH pair yield, large-star/small-star round
  * count (expected O(log^2 component-size) — single digits for bounded
  * families), end-to-end wall, and peak streaming state rows. Results
  * recorded in BASELINE.md; this main keeps them reproducible.
  *
  * {{{ runMain graft.SoakDedup [nDocs] [groupSize] [nStreamDocs] }}}
  *
  * Corpus shape (all Column-generated, no driver loop): `nDocs/groupSize`
  * families; within a family the first `groupSize-5` docs are EXACT
  * copies (exercising the exact-dup collapse) and the last 5 are
  * near-variants differing in one of 30 tokens (3-gram shingle jaccard
  * ~0.81 — above the 0.7 threshold), so each family resolves to one
  * cluster with 6 LSH-visible representatives.
  */
object SoakDedup {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 5000000L
    val group = if (args.length > 1) args(1).toInt else 100
    val nStream = if (args.length > 2) args(2).toLong else 100000L
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-").toString

    def text(groupSize: Int, exact: Int): String =
      s"""concat_ws(' ',
         |  transform(sequence(1, 29),
         |    i -> concat('w', pmod(hash((id DIV $groupSize) * 131 + i), 50000))),
         |  CASE WHEN id % $groupSize < $exact THEN 'wend'
         |       ELSE concat('v', CAST(id % $groupSize AS STRING)) END
         |) AS text""".stripMargin

    spark.range(n).selectExpr("id AS doc_id", text(group, group - 5))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")

    // 1) pair yield + CC rounds over the collapsed representative graph
    var t0 = System.nanoTime()
    val pairs = graft.llm.Dedup.minhashLshPairs(docs, "text", "doc_id",
      shingleN = 3, threshold = 0.7, collapseExact = true)
    val nPairs = pairs.count()
    val pairSec = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val (rootsDf, rounds) =
      graft.llm.ConnectedComponents.runWithStats(pairs, "id_a", "id_b")
    val rootRows = rootsDf.count()
    val ccSec = (System.nanoTime() - t0) / 1e9

    // 2) the full operator end-to-end (its own pair gen + CC + keep-best)
    t0 = System.nanoTime()
    val resolved = graft.llm.Dedup.resolveClusters(docs, "text", "doc_id",
      shingleN = 3, threshold = 0.7, distributed = true)
    val kept = resolved.filter(col("keep")).count()
    val resolveSec = (System.nanoTime() - t0) / 1e9

    // 3) streaming near-dup: every family striped one-doc-per-micro-batch
    //    (id % 5 = batch), so pairing happens against cross-batch state
    (0 until 5).foreach { b =>
      spark.range(nStream).filter(pmod(col("id"), lit(5)) === b)
        .selectExpr("id AS doc_id", text(5, 0))
        .coalesce(1).write.mode("append").parquet(s"$dir/stream")
    }
    val schema = spark.read.parquet(s"$dir/stream").schema
    val src = graft.streaming.Streams.fileSource(
      spark, s"$dir/stream", schema, maxFilesPerTrigger = Some(1))
    val pairStream = graft.streaming.StreamingNearDup
      .pairs(src, "text", "doc_id", shingleN = 3, threshold = 0.5)
    var emitted = 0L
    t0 = System.nanoTime()
    val q = graft.streaming.Streams.runForeachBatch(pairStream.toDF(),
      (batch, _) => { emitted += batch.dropDuplicates("id_a", "id_b").count(); () })
    val streamSec = (System.nanoTime() - t0) / 1e9
    val peakState = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatten)
      .map(_.numRowsTotal).foldLeft(0L)(math.max)

    println(s"""{"soak":"dedup","n_docs":$n,"group":$group,""" +
      s""""lsh_pairs":$nPairs,"pair_sec":${f"$pairSec%.1f"},""" +
      s""""cc_rounds":$rounds,"cc_root_rows":$rootRows,"cc_sec":${f"$ccSec%.1f"},""" +
      s""""resolve_keep":$kept,"resolve_sec":${f"$resolveSec%.1f"},""" +
      s""""stream_docs":$nStream,"stream_pairs":$emitted,""" +
      s""""stream_peak_state_rows":$peakState,"stream_sec":${f"$streamSec%.1f"}}""")
    spark.stop()
  }
}
