package graft

import org.apache.spark.sql.functions._

/** Scale soak for [[graft.llm.Classifier.trainMulti]]: the one-pass
  * one-vs-rest trainer must keep its corpus-scan count INDEPENDENT of
  * the number of labels — the CCNet langid shape is 176 languages, so
  * a per-label training loop (the r14 form) pays 176× sequential
  * corpus passes while this one pays the same 1 feature build +
  * 2 persisted-feature scans per iteration regardless of label count,
  * with only the broadcast weight table and the aggregate width
  * growing by L. The soak trains the SAME corpus under a small and a
  * large label set and reports both walls — the acceptance bar is
  * large-label wall within ~2× of the small-label wall (vs ~L/8× for
  * the per-label loop). Also verifies the models actually separate
  * (argmax accuracy 100% on the planted corpus). Results recorded in
  * BASELINE.md.
  *
  * {{{ runMain graft.SoakClassifier [nDocs] [smallL] [largeL] }}}
  *
  * Corpus: 12 tokens per doc — 4 language-cue tokens from the doc's
  * planted language plus 8 shared-vocabulary fillers, the
  * linearly-separable shape the ClassifierSpec fixture uses, scaled.
  */
object SoakClassifier {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val smallL = if (args.length > 1) args(1).toInt else 8
    val largeL = if (args.length > 2) args(2).toInt else 32
    val buckets = 4096
    val iters = 2
    val spark = GraftSession.get()
    val dir = java.nio.file.Files.createTempDirectory("graft-soak-clf-").toString

    def corpus(labels: Int) = {
      val cues = (1 to 4).map(j =>
        s"concat('lang', pmod(id, $labels), 'cue$j')").mkString(", ")
      val fill = (1 to 8).map(j =>
        s"concat('w', pmod(hash(id * 37 + $j), 5000))").mkString(", ")
      spark.range(n).selectExpr(
        "id AS doc_id",
        s"concat('l', pmod(id, $labels)) AS lang",
        s"concat_ws(' ', $cues, $fill) AS text")
    }

    def run(labels: Int): (Double, Long) = {
      val path = s"$dir/corpus_$labels"
      corpus(labels).repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(path)
      val docs = spark.read.parquet(path)
      val t0 = System.nanoTime()
      val models = graft.llm.Classifier.trainMulti(
        docs, "text", "lang", "doc_id", buckets, iters)
      val sec = (System.nanoTime() - t0) / 1e9
      require(models.size == labels, s"trained ${models.size} of $labels")
      // argmax accuracy on a deterministic sample — the planted corpus
      // is separable, so anything below 100% is a regression
      val sample = docs.filter(pmod(col("doc_id"), lit(499L)) === 0)
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val wrong = sample
        .withColumn("pred", graft.llm.Classifier.predict(toks, models))
        .filter(col("pred") =!= col("lang")).count()
      (sec, wrong)
    }

    val (smallSec, smallWrong) = run(smallL)
    val (largeSec, largeWrong) = run(largeL)
    require(smallWrong == 0 && largeWrong == 0,
      s"mispredictions: small=$smallWrong large=$largeWrong")

    println(f"""{"soak":"classifier_multi","docs":$n,"buckets":$buckets,""" +
      f""""iters":$iters,"small_labels":$smallL,"small_sec":$smallSec%.1f,""" +
      f""""large_labels":$largeL,"large_sec":$largeSec%.1f,""" +
      f""""large_over_small":${f"${largeSec / smallSec}%.2f"},""" +
      f""""mispredictions":0}""")
    spark.stop()
  }
}
