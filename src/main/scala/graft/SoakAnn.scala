package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale soak for the ANN paths — the similarity-search counterpart of
  * [[SoakDedup]]: a synthetic clustered corpus far past the oracle SFs is
  * pushed through [[graft.llm.Similarity.lshKnn]] and
  * [[graft.llm.Similarity.ivfKnn]] end-to-end (full self-join top-k over
  * the whole corpus), and their recall is measured against
  * [[graft.llm.Similarity.bruteKnnFor]] ground truth on a sampled query
  * set (brute force over the FULL corpus is O(n^2) and exists only as the
  * oracle — the sampled-query harness is how recall is audited at any
  * scale). Results recorded in BASELINE.md; this main keeps them
  * reproducible.
  *
  * {{{ runMain graft.SoakAnn [nVecs] [k] [nQueries] [lshProbeBits] [ivfNprobe] [paths] }}}
  *
  * `paths` selects which ANN paths run (`lsh`, `ivf`, or `both`,
  * default both) — dense-probe frontier runs need not re-pay the other
  * path's wall time.
  *
  * The probe knobs trade recall for scored candidates — run once at the
  * bounded defaults and once denser to record the recall/wall frontier.
  *
  * Corpus shape (Column-generated, no driver loop): `nVecs/50` clusters of
  * 50 members in 64 dims; a member is its cluster center (hash-derived,
  * components in [-1,1]) plus 0.15-scaled per-member noise, so a vector's
  * true nearest neighbors are its 49 cluster siblings.
  */
object SoakAnn {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val k = if (args.length > 1) args(1).toInt else 10
    val nQ = if (args.length > 2) args(2).toInt else 1000
    val lshProbeBits = if (args.length > 3) args(3).toInt else 1
    val ivfNprobe = if (args.length > 4) args(4).toInt else 2
    val paths = if (args.length > 5) args(5) else "both"
    // ivfpq = the production rerank leg alone (the r8 configuration);
    // ivfpq_adc = the pure-ADC residual-vs-raw pair alone — separate
    // values so the 1M legs run in their own JVMs (three full
    // self-joins in one 8g heap OOM at 1M)
    require(Set("lsh", "ivf", "both", "pq", "ivfpq", "ivfpq_adc")(paths),
      s"paths must be lsh|ivf|both|pq|ivfpq|ivfpq_adc, got '$paths'")
    // noise scale (arg 7, default 0.15): 0.15 makes clusters tight —
    // within-cluster ranks are tie-dominated and pure-ADC recall
    // measures little; larger noise makes QUANTIZATION RESOLUTION the
    // binding constraint, the regime residual encoding exists for
    val noise = if (args.length > 6) args(6).toDouble else 0.15
    val d = 64
    val group = 50
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-ann-").toString

    spark.range(n).selectExpr("id AS vec_id",
      s"""transform(sequence(0, ${d - 1}), i -> CAST(
         |  (hash(id DIV $group, i) % 1000) / 1000.0 +
         |  $noise * ((hash(id, i) % 1000) / 1000.0) AS FLOAT)) AS embedding"""
        .stripMargin)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/emb")
    val emb = spark.read.parquet(s"$dir/emb")

    // sampled query set: every (n/nQ)-th vector
    val stride = math.max(n / nQ, 1L)
    val queries = emb.filter(pmod(col("vec_id"), lit(stride)) === 0L)
    val nQueries = queries.count()

    // ground truth: sampled queries against the FULL corpus, block path
    var t0 = System.nanoTime()
    graft.llm.Similarity.bruteKnnFor(queries, emb, k)
      .write.mode("overwrite").parquet(s"$dir/truth")
    val bruteSec = (System.nanoTime() - t0) / 1e9
    val truth = spark.read.parquet(s"$dir/truth")

    /** Time a full-corpus ANN run, then measure its recall on the sampled
      * queries: recall@k = |ANN top-k ∩ true top-k| / |true top-k|;
      * recall@1 = fraction of queries whose true nearest neighbor appears
      * anywhere in the ANN top-k. */
    def audit(name: String, ann: => DataFrame): String = {
      val t = System.nanoTime()
      ann.write.mode("overwrite").parquet(s"$dir/$name")
      val sec = (System.nanoTime() - t) / 1e9
      val got = spark.read.parquet(s"$dir/$name")
      val gotQ = got.join(queries.select("vec_id"), "vec_id")
        .select(col("vec_id"), col("neighbor_id"))
      val hits = truth.select(col("vec_id"), col("neighbor_id"))
        .join(gotQ, Seq("vec_id", "neighbor_id")).count()
      val truthRows = truth.count()
      val top1Hits = truth.filter(col("rank") === 1)
        .select(col("vec_id"), col("neighbor_id"))
        .join(gotQ, Seq("vec_id", "neighbor_id")).count()
      val rows = got.count()
      f""""$name":{"sec":$sec%.1f,"rows":$rows,""" +
        f""""recall_at_$k":${hits.toDouble / truthRows}%.4f,""" +
        f""""recall_at_1":${top1Hits.toDouble / nQueries}%.4f}"""
    }

    // LSH: 18 bits ≈ 262k buckets, so a bucket ≈ one cluster; multi-probe
    // recovers members split across a borderline hyperplane
    val parts = Seq(
      (paths == "lsh" || paths == "both") -> (() => audit("lsh",
        graft.llm.Similarity.lshKnn(emb, k, bits = 18, probeBits = lshProbeBits))),
      // IVF: bounded driver training (16k sample, 3 Lloyd iterations);
      // 4096 cells ≈ 244 members each
      (paths == "ivf" || paths == "both") -> (() => audit("ivf",
        graft.llm.Similarity.ivfKnn(emb, k, nlist = 4096, nprobe = ivfNprobe,
          iters = 3, maxTrain = 16384))),
      // PQ: the compressed-scan path — full self-join brute ADC over the
      // broadcast code table (n × n × m lookups; no candidate pruning,
      // the soak measures what pure compression costs and recalls) …
      (paths == "pq") -> (() => audit("pq_adc",
        graft.llm.Similarity.pqKnn(emb, k, m = 8, ksub = 16,
          iters = 3, maxTrain = 16384))),
      // … and the production ADC-then-refine shape: same compressed
      // scan cuts 4k candidates, exact cosine re-ranks only those
      (paths == "pq") -> (() => audit("pq_rerank",
        graft.llm.Similarity.pqKnnRerank(emb, emb, k, rerankFactor = 4,
          m = 8, ksub = 16, iters = 3, maxTrain = 16384))),
      // IVFADC: coarse cells prune to ~nprobe/nlist of the corpus, PQ
      // codes compress the scoring, exact refine on the ADC cut — the
      // production configuration; nprobe rides the ivfNprobe arg
      (paths == "ivfpq") -> (() => audit("ivfpq_rerank",
        graft.llm.Similarity.ivfPqKnn(emb, emb, k, nlist = 4096,
          nprobe = ivfNprobe, m = 8, ksub = 16, iters = 3,
          maxTrain = 16384, rerankFactor = 4))),
      // pure-ADC residual-vs-raw at scale (no refine — rerank would
      // mask PQ resolution): both forms at identical knobs
      (paths == "ivfpq_adc") -> (() => audit("ivfpq_adc_residual",
        graft.llm.Similarity.ivfPqKnn(emb, emb, k, nlist = 4096,
          nprobe = ivfNprobe, m = 8, ksub = 16, iters = 3,
          maxTrain = 16384))),
      (paths == "ivfpq_adc") -> (() => audit("ivfpq_adc_raw",
        graft.llm.Similarity.ivfPqKnn(emb, emb, k, nlist = 4096,
          nprobe = ivfNprobe, m = 8, ksub = 16, iters = 3,
          maxTrain = 16384, residual = false)))
    ).collect { case (true, run) => run() }

    println(s"""{"soak":"ann","n_vecs":$n,"d":$d,"k":$k,""" +
      s""""n_queries":$nQueries,"lsh_probe_bits":$lshProbeBits,""" +
      s""""ivf_nprobe":$ivfNprobe,"brute_truth_sec":${f"$bruteSec%.1f"},""" +
      parts.mkString(",") + "}")
    spark.stop()
  }
}
