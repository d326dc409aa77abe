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

  // round-2 operators, measured and reported alongside but NOT in the
  // headline total (the total stays comparable across rounds)
  val Extended: Seq[String] = Seq(
    "llm_dedup_levenshtein", "llm_chunking", "llm_shard_pack",
    "llm_sample_deterministic", "llm_embedding_centroids",
    "llm_dedup_clusters_mr", "q40_exists_subquery", "q45_window_distribution")

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

    // best-of-2: single-shot numbers swing ~20% from GC/JIT noise in
    // local mode; min is the stable cross-round comparator
    val results = Headline.map(n => n -> math.min(runOne(n), runOne(n)))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    Extended.foreach(runOne) // warmup
    val ext = Extended.map(n => n -> math.min(runOne(n), runOne(n)))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"total_sec","value":$total%.3f,"unit":"sec","queries":$qs,"extended":$ext,"sf":"$sfDir"}""")
    spark.stop()
  }
}
