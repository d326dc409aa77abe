package graft

/** Scale soak for [[graft.llm.Unigram]]: training cost must be bounded
  * by the word HISTOGRAM (Zipf-bounded vocabulary), never the corpus —
  * each hard-EM pass segments the histogram, not the occurrence
  * stream — and bulk encoding must ride the compiled kernel at
  * corpus-linear cost with the model as a broadcast. Reports histogram
  * size, per-EM-pass wall, expression-vs-kernel encode throughput, and
  * a kernel==expression parity count. Results recorded in BASELINE.md.
  *
  * {{{ runMain graft.SoakUnigram [nDocs] [emIters] }}}
  *
  * Corpus: 30 tokens per doc from a 50k-word vocabulary of
  * letter-serialized numbers (the SoakBpe fixture — skewed substring
  * structure for the seed counts to learn from).
  */
object SoakUnigram {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val iters = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-ug-").toString

    val toks =
      s"""transform(sequence(1, 30), i ->
         |  translate(CAST(pmod(hash(id * 131 + i), 50000) AS STRING),
         |            '0123456789', 'etaoinshrd'))""".stripMargin
    spark.range(n)
      .selectExpr("id AS doc_id", s"concat_ws(' ', $toks) AS text")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/corpus")
    val corpus = spark.read.parquet(s"$dir/corpus")

    var t0 = System.nanoTime()
    val hist = graft.llm.Unigram.histogram(corpus, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nWords = hist.count()
    val histSec = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    var vocab = graft.llm.Unigram.seedVocab(hist)
    val seedSec = (System.nanoTime() - t0) / 1e9
    val emSecs = (1 to iters).map { _ =>
      val t = System.nanoTime()
      vocab = graft.llm.Unigram.emStep(hist, vocab)
      (System.nanoTime() - t) / 1e9
    }

    // kernel encode (the bulk path) vs the expression rendering, on
    // the same trained vocabulary; a sampled parity check pins equality
    t0 = System.nanoTime()
    val nEnc = graft.llm.Unigram
      .encodeFast(corpus, "doc_id", "text", vocab).count()
    val kernelSec = (System.nanoTime() - t0) / 1e9
    val exprSample = corpus.filter(org.apache.spark.sql.functions
      .pmod(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lit(997L)) === 0)
    t0 = System.nanoTime()
    import spark.implicits._
    val viaExpr = graft.llm.Unigram
      .encode(exprSample, "doc_id", "text", vocab)
      .as[(Long, Long, Long, String)].collect().toSet
    val exprSec = (System.nanoTime() - t0) / 1e9
    val viaKernel = graft.llm.Unigram
      .encodeFast(exprSample, "doc_id", "text", vocab)
      .as[(Long, Long, Long, String)].collect().toSet
    val mismatches = (viaExpr diff viaKernel).size + (viaKernel diff viaExpr).size
    require(mismatches == 0, s"kernel/expression divergence: $mismatches")
    require(nEnc == n, s"encoded $nEnc of $n docs")

    println(f"""{"soak":"unigram","docs":$n,"distinct_words":$nWords,""" +
      f""""vocab_pieces":${vocab.size},"hist_sec":$histSec%.1f,""" +
      f""""seed_sec":$seedSec%.1f,"em_secs":[${emSecs.map(s => f"$s%.1f").mkString(",")}],""" +
      f""""kernel_encode_sec":$kernelSec%.1f,""" +
      f""""kernel_docs_per_sec":${(n / kernelSec).toLong},""" +
      f""""expr_sample_docs":${viaExpr.size},"expr_sample_sec":$exprSec%.1f,""" +
      f""""parity_mismatches":$mismatches}""")
    hist.unpersist()
    spark.stop()
  }
}
