package graft

/** Scale soak for benchmark decontamination: the plain sweep (exact
  * eval shingle set BROADCAST) head-to-head against
  * [[graft.llm.Dedup.contaminationBloomSweep]] (eval condensed to a
  * Bloom filter, survivors exact-verified) on the same corpus, with the
  * contaminated-doc set planted so both answers are checkable.
  *
  * {{{ runMain graft.SoakDecon [nTrain] [nEval] }}}
  *
  * Corpus: train docs draw 30 tokens from the 'w' 50k vocabulary; eval
  * docs from a disjoint 'e' vocabulary (zero accidental overlap). Every
  * 1000th train doc is planted with the first 10 tokens of an eval doc
  * — 3 shared 8-gram windows, so minShared = 2 must flag exactly
  * nTrain/1000 docs on BOTH paths. The observable: the plain sweep
  * broadcasts |eval shingles| exact strings (23 × nEval ≈ 180 MB of
  * strings at the default sizes — at real benchmark-suite scale this is
  * fine, at held-out-split scale it is not), the bloom sweep broadcasts
  * `numBits` bits and pays one extra verify join on the survivors. */
object SoakDecon {
  def main(args: Array[String]): Unit = {
    val nTrain = if (args.length > 0) args(0).toLong else 2000000L
    val nEval = if (args.length > 1) args(1).toLong else 100000L
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-decon-").toString

    def toks(idExpr: String, count: Int, pfx: String): String =
      s"transform(sequence(1, $count), i -> concat('$pfx', pmod(hash(($idExpr) * 131 + i), 50000)))"

    spark.range(nTrain)
      .selectExpr("id AS doc_id", "'train' AS source",
        s"""CASE WHEN id % 1000 = 0
           |  THEN concat_ws(' ',
           |    concat_ws(' ', slice(${toks(s"(id div 1000) % $nEval", 10, "e")}, 1, 10)),
           |    concat_ws(' ', ${toks("id", 20, "w")}))
           |  ELSE concat_ws(' ', ${toks("id", 30, "w")})
           |END AS text""".stripMargin)
      .union(spark.range(nEval)
        .selectExpr(s"id + $nTrain AS doc_id", "'eval' AS source",
          s"concat_ws(' ', ${toks("id", 30, "e")}) AS text"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")

    // plain sweep: the llm_decontaminate shape (exact eval broadcast)
    import org.apache.spark.sql.functions._
    var t0 = System.nanoTime()
    val sh = docs
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("source"),
        explode(expr("array_distinct(transform(" +
          "sequence(0, greatest(size(toks)-8, 0))," +
          " i -> concat_ws(' ', slice(toks, i+1, 8))))")).as("s"))
    val evalSh = sh.filter(col("source") === "eval").select(col("s")).distinct()
    val plainHits = sh.filter(col("source") =!= "eval")
      .join(broadcast(evalSh), "s")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("s")).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= 2).count()
    val plainSec = (System.nanoTime() - t0) / 1e9

    t0 = System.nanoTime()
    val bloomHits = graft.llm.Dedup.contaminationBloomSweep(docs,
        "doc_id", "text", "source", "eval", n = 8, minShared = 2L,
        estimatedEvalItems = nEval * 23, numBits = 64L * 1024 * 1024)
      .filter(col("contaminated")).count()
    val bloomSec = (System.nanoTime() - t0) / 1e9

    val want = nTrain / 1000
    println(s"""{"soak":"decon","n_train":$nTrain,"n_eval":$nEval,""" +
      s""""planted":$want,"plain_hits":$plainHits,"bloom_hits":$bloomHits,""" +
      s""""match":${plainHits == want && bloomHits == want},""" +
      s""""plain_sec":${f"$plainSec%.1f"},"bloom_sec":${f"$bloomSec%.1f"},""" +
      s""""bloom_bits_mb":8}""")
    spark.stop()
  }
}
