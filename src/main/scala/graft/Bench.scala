package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...}. Each query is forced end-to-end
  * with a noop sink (full computation, no collect/IO skew); a warmup pass
  * of the first query absorbs JIT/codegen/session startup.
  */
object Bench {
  // Representative of every subsystem: scan+agg, star join, range join,
  // window, time windows, dedup (LSH), ANN, and the operator pipeline.
  val Headline: Seq[String] = Seq(
    "q01_pricing_summary", "q03_shipping_priority", "q05_local_supplier_volume",
    "q11_range_join", "q18_window_running_sum", "q29_tumbling_window",
    "q31_session_window", "llm_dedup_minhash", "llm_ann_topk",
    "op_throttler")

  // round-2/3 operators, measured and reported alongside but NOT in the
  // headline total (the total stays comparable across rounds)
  val Extended: Seq[String] = Seq(
    "llm_dedup_levenshtein", "llm_chunking", "llm_shard_pack",
    "llm_sample_deterministic", "llm_embedding_centroids",
    "llm_dedup_clusters_mr", "q40_exists_subquery", "q45_window_distribution",
    "llm_repetition", "q47_recursive_cte", "q48_lateral_topk",
    "llm_mix_weights", "llm_zipf_spectrum", "llm_decontaminate", "llm_novelty",
    // round 3: the reworked ANN paths + the KMV estimator
    "llm_ann_lsh", "llm_ann_ivf", "q28_kmv_distinct",
    // round 8: persisted-index ANN and dedup (build + search, end-to-end)
    "llm_ann_ivf_index", "llm_dedup_index",
    "llm_classifier_score", "llm_dup_spans", "llm_dup_spans_cut",
    "llm_span_index", "llm_semdedup", "llm_decontaminate_cut",
    "mm_image_phash_pairs",
    // round 8: product-quantization compressed ANN
    "llm_ann_pq", "llm_ann_pq_rerank", "llm_ann_ivfpq", "llm_ann_ivfpq_index",
    // round 9: persisted BM25 inverted index (build + search end-to-end),
    // BPE train+encode (8 merges over the corpus histogram), and the
    // banded interval join
    "llm_bm25_index", "llm_bpe_encode", "q53_interval_join",
    // round 10: the df/N-capped index search, the lossless max-score
    // search, the positional phrase family, and the hybrid
    // long-interval join
    "llm_bm25_capped", "llm_bm25_maxscore", "llm_phrase_topk",
    "llm_phrase_index", "llm_bpe_encode_fast", "q54_interval_join_hybrid",
    // the CCNet-style LM quality scorer and its persisted-model twin,
    // plus the trigram order, plus the candidate-pruned phrase search
    "llm_lm_score", "llm_lm_index", "llm_lm3_score", "llm_lm3_index",
    "llm_phrase_selective", "llm_decontaminate_bloom",
    // round 11: the order-general LM at CCNet's production order, the
    // GPT-2-style pre-tokenized BPE, the exactly-once ingest lifecycles
    // (both families), and the CCNet head/middle/tail buckets
    "llm_lm5_score", "llm_lm5_index", "llm_bpe_encode_pre",
    "llm_lm_index_xo", "llm_bm25_index_xo", "llm_lm_buckets",
    "llm_dedup_clusters_best",
    // round 13: the raw-crawl front door (HTML extraction), in-pipeline
    // classifier training, and per-language LM scoring + tiers
    "llm_extract_text", "llm_classifier_train", "llm_lm_per_lang",
    "llm_url_normalize", "llm_dedup_paragraph", "llm_gopher_rules",
    "llm_c4_rules",
    // round 14: charset-aware front door, CJK-aware quality signals,
    // trained language ID, and the unigram tokenizer lifecycle
    "llm_extract_charset", "llm_gopher_rules_cjk", "llm_langid_clf",
    "llm_unigram_encode", "llm_unigram_encode_fast",
    "llm_curation_scorecard",
    // round 14: the pre-fetch URL gates and block-granular boilerplate
    "llm_url_filter", "llm_badwords", "llm_main_content",
    "llm_meta_robots",
    // round 15: the two queries the interrupted round-15 build added
    // (char-n-gram langid double lifecycle, persisted digest-dedup
    // index) — measured from this round on
    "llm_langid_ngram", "llm_digest_index")

  /** The two skew answers measured head-to-head on the SAME deliberately
    * skewed shuffled join (~90% of lineitem on one hot key, broadcast
    * disabled, merge-join hinted so the skew actually lands on sort-merge
    * reducers): AQE runtime skew-split vs. no mitigation vs. the manual
    * salted join ([[operators.SkewTools.saltedEquiJoin]]). Reported as a
    * JSON object; the headline total is unaffected. */
  private def skewComparison(spark: SparkSession, sfDir: String): String = {
    val (aqe, none, salt) = skewTriple(spark, sfDir, repeats = 2)
    f"""{"aqe_skew_join":$aqe%.3f,"no_mitigation":$none%.3f,"salted_32":$salt%.3f}"""
  }

  /** The raw triple at a configurable best-of-N ([[SkewProfile]] runs it
    * at N=5 on a quiet box to settle the recommendation). */
  private[graft] def skewTriple(spark: SparkSession, sfDir: String,
                                repeats: Int): (Double, Double, Double) = {
    import org.apache.spark.sql.functions._
    // amplify x8 so the hot key is several million rows — at bench SFs
    // the raw table joins in well under a second and every strategy ties
    val li = Tables.load(spark, sfDir, "lineitem")
      .crossJoin(spark.range(8))
      .select(when(col("l_orderkey") % 100 < 90, 0L)
        .otherwise(col("l_orderkey") % 1000).as("k"),
        col("l_quantity"))
      // spread the amplified map side over all cores so the measured
      // difference is the REDUCER-side hot partition, not the scan
      .repartition(64)
    val dim = spark.range(1000).select(col("id").as("dk"),
      (col("id") * 7 % 13).as("w"))
    def measure(skewJoinOn: Boolean, salted: Boolean): Double = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoinOn.toString)
      try {
        val joined =
          if (salted) operators.SkewTools.saltedEquiJoin(
            li, dim.hint("merge"), col("k"), col("dk"), saltBuckets = 32)
          else li.join(dim.hint("merge"), col("k") === col("dk"))
        val agg = joined.groupBy().agg(count(lit(1)), sum(col("l_quantity") * col("w")))
        val t0 = System.nanoTime()
        agg.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.enabled")
      }
    }
    measure(skewJoinOn = true, salted = false) // warmup
    def best(f: => Double): Double = Seq.fill(repeats)(f).min
    val aqe = best(measure(true, false))
    val none = best(measure(false, false))
    val salt = best(measure(false, true))
    (aqe, none, salt)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val queries = SparkEntry.queries

    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup pass over EVERY headline query: each query pays its own
    // whole-stage-codegen compile + JIT on first execution, so a q01-only
    // warmup leaves that cost inside the first timed run of the others
    Headline.foreach(runOne)

    // best-of-3: single-shot numbers swing ~20% from GC/JIT noise in
    // local mode; min over three runs is the stable cross-round
    // comparator (two left residual swings of ~1.5x between full runs)
    val passA = Headline.map(n =>
      n -> Seq(runOne(n), runOne(n), runOne(n)).min)
    Extended.foreach(runOne) // warmup
    // best-of-3 like the headline: BENCH_r01 recorded a 6.5x outlier on a
    // warmed query (driver-box contention) that min-of-2 failed to absorb
    val ext = Extended.map(n => n -> Seq(runOne(n), runOne(n), runOne(n)).min)
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // SECOND full headline pass, minutes of wall-clock after the first
    // (the extended section sits between): consecutive best-of-3 runs
    // all land inside the same busy-box window, which is exactly how
    // BENCH_r13 recorded a uniform +22% — min across two time-separated
    // passes is the protection a single end-of-round driver run lacks
    val passB = Headline.map(n =>
      n -> Seq(runOne(n), runOne(n), runOne(n)).min)
    val results = passA.zip(passB).map { case ((n, a), (_, b)) =>
      n -> math.min(a, b) }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val skew = skewComparison(spark, sfDir)
    // live-socket ingest throughput (tcp + http through the YAML bind
    // pipeline) — SF-independent, bounded row counts keep it a few
    // seconds; see BenchStream for a standalone run at larger N
    val stream = "{" + BenchStream.section(spark, nTcp = 100000, nHttp = 2000) + "}"
    val line = f"""{"metric":"total_sec","value":$total%.3f,"unit":"sec","queries":$qs,"extended":$ext,"skew":$skew,"stream":$stream,"sf":"$sfDir"}"""
    // the FULL metric object (headline + extended + skew + stream) lands
    // in a file the driver can lift verbatim — it is several KB and does
    // NOT fit a bounded stdout-tail capture (BENCH_r11's 2000-char tail
    // started MID-line, which is why `parsed` stayed null despite the
    // r11 StdoutOutput fix: the line survived sbt unprefixed but was
    // truncated at the front)
    val out = java.nio.file.Paths.get("target/bench.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, line.getBytes("UTF-8"))
    println(line)
    spark.stop()
    // the parseable line of record is SHORT (headline-only, ~400 bytes —
    // fits any tail window whole) and is the process's LAST output on
    // both channels, printed after spark.stop() so no logger writes
    // after it
    val short = f"""{"metric":"total_sec","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(short)
    Console.out.flush()
    System.err.println(short)
    System.err.flush()
  }
}
