package graft

/** Scale soak for [[graft.llm.Bpe]]: training cost must be bounded by
  * the word-frequency HISTOGRAM (vocabulary), not the corpus — one
  * corpus pass builds the histogram, then each merge is a small
  * aggregation over it — and encoding is a replace-expression chain
  * whose depth equals the merge count (this soak deliberately drives
  * a deep chain through codegen). Reports histogram build wall,
  * total/mean per-merge training wall, and encode throughput.
  * Results recorded in BASELINE.md.
  *
  * {{{ runMain graft.SoakBpe [nDocs] [numMerges] }}}
  *
  * Corpus: 30 tokens per doc drawn hash-pseudo-randomly from a
  * 50k-word vocabulary of letter-serialized numbers ("wzqxk"-style),
  * so character pairs have a real skewed distribution to learn from.
  */
object SoakBpe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val numMerges = if (args.length > 1) args(1).toInt else 64
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-bpe-").toString

    // words spelled with letters (translate digits to letters) so BPE
    // has letter-pair structure to learn
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
    val merges = graft.llm.Bpe.trainMerges(corpus, "text", numMerges)
    val trainSec = (System.nanoTime() - t0) / 1e9

    // the r9 weak item head-on: the DRIVER-LOCAL incremental trainer at
    // production merge depth (one histogram pass + zero Spark jobs in
    // the merge loop) vs the distributed fallback's ~2 jobs per merge.
    // deep = 1000 merges; the distributed loop is timed at `numMerges`
    // only (its per-merge cost is what the driver path retires)
    t0 = System.nanoTime()
    val deepMerges = graft.llm.Bpe.trainMerges(corpus, "text", numMerges = 1000)
    val deepSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val distMerges = graft.llm.Bpe.trainMerges(corpus, "text", numMerges,
      driverBudget = 1) // force the distributed fallback
    val distSec = (System.nanoTime() - t0) / 1e9
    require(distMerges == merges,
      "driver and distributed trainers diverged at soak scale")

    t0 = System.nanoTime()
    val encoded = graft.llm.Bpe.encode(corpus, "doc_id", "text", merges)
    encoded.write.format("noop").mode("overwrite").save()
    val encodeSec = (System.nanoTime() - t0) / 1e9

    // the rank-lookup kernel (production path for big merge tables)
    t0 = System.nanoTime()
    graft.llm.Bpe.encodeFast(corpus, "doc_id", "text", merges)
      .write.format("noop").mode("overwrite").save()
    val fastSec = (System.nanoTime() - t0) / 1e9

    // piece compression: mean pieces per word after the learned merges
    val stats = encoded.selectExpr(
      "CAST(SUM(n_pieces) AS DOUBLE) / SUM(n_words) AS ppw").head()
    println(s"""{"soak":"bpe","n_docs":$n,"num_merges":${merges.size},""" +
      s""""train_sec":${f"$trainSec%.1f"},""" +
      s""""train_sec_per_merge":${f"${trainSec / merges.size}%.2f"},""" +
      s""""train_deep_merges":${deepMerges.size},""" +
      s""""train_deep_sec":${f"$deepSec%.1f"},""" +
      s""""train_distributed_sec":${f"$distSec%.1f"},""" +
      s""""train_distributed_sec_per_merge":${f"${distSec / distMerges.size}%.2f"},""" +
      s""""encode_sec":${f"$encodeSec%.1f"},""" +
      s""""encode_docs_per_sec":${(n / encodeSec).toLong},""" +
      s""""encode_fast_sec":${f"$fastSec%.1f"},""" +
      s""""encode_fast_docs_per_sec":${(n / fastSec).toLong},""" +
      s""""pieces_per_word":${f"${stats.getDouble(0)}%.2f"}}""")
    spark.stop()
  }
}
