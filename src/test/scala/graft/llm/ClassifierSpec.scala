package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{HashedBowScore, TextFunctions}

/** Hashed-BoW classifier training (llm.Classifier): deterministic
  * fixed-point gradient descent separates planted linearly-separable
  * labels, composes with HashedBowScore inference into a perfect gate,
  * and is invariant to partitioning/row order (exact integer sums). */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** 40 docs of filler with a class cue token pair: y=1 docs carry
    * "goodsig", y=0 docs carry "badsig" — linearly separable in the
    * hashed-BoW space unless the two cues collide in a bucket (they
    * do not at 512 buckets). */
  private lazy val planted = (0L until 40L).map { i =>
    val y = (i % 2).toInt
    val filler = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      .drop((i % 3).toInt).mkString(" ")
    val cue = if (y == 1) "goodsig goodsig" else "badsig badsig"
    (i, y, s"$filler $cue word${i % 7}")
  }.toDF("doc_id", "y", "text")

  test("trained weights separate planted labels through HashedBowScore") {
    val w = Classifier.train(planted, "text", "y", "doc_id",
      buckets = 512, iters = 3)
    assert(w.length == 512)
    val scored = planted.withColumn("score",
      HashedBowScore(TextFunctions.tokens(col("text")),
        Classifier.weightsColumn(w)))
      .select($"y", $"score").as[(Int, Long)].collect()
    // a perfect linear separator: every positive above every negative
    val posMin = scored.filter(_._1 == 1).map(_._2).min
    val negMax = scored.filter(_._1 == 0).map(_._2).max
    assert(posMin > negMax,
      s"not separated: min(pos)=$posMin <= max(neg)=$negMax")
    assert(posMin > 0 && negMax < 0, "hard-sigmoid midpoint is 0 margin")
  }

  test("training is deterministic across partitionings and row orders") {
    val a = Classifier.train(planted, "text", "y", "doc_id", 256, 3)
    val b = Classifier.train(planted.repartition(7).sortWithinPartitions(
      $"text"), "text", "y", "doc_id", 256, 3)
    val c = Classifier.train(planted.coalesce(1).orderBy($"doc_id".desc),
      "text", "y", "doc_id", 256, 3)
    assert(a.toSeq == b.toSeq && a.toSeq == c.toSeq)
  }

  test("zero iterations yield zero weights; empty corpus trains zeros") {
    assert(Classifier.train(planted, "text", "y", "doc_id", 64, 0)
      .forall(_ == 0L))
    val empty = Seq.empty[(Long, Int, String)].toDF("doc_id", "y", "text")
    assert(Classifier.train(empty, "text", "y", "doc_id", 64, 3)
      .forall(_ == 0L))
  }

  test("weights persist and reload bit-identically; a model_path-only " +
      "actor scores from the trained artifact") {
    val w = Classifier.train(planted, "text", "y", "doc_id", 256, 3)
    val model = java.nio.file.Files
      .createTempDirectory("graft-clf-model-").toString + "/weights"
    Classifier.saveWeights(spark, w, model)
    assert(Classifier.loadWeights(spark, model).toSeq == w.toSeq)
    val in = java.nio.file.Files
      .createTempDirectory("graft-clf-mp-").toString + "/in"
    planted.write.parquet(in)
    // train+persist in one run, then score unlabeled input from the model
    val trainYaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  clf: {module: llm.classifier, params: {column: text, label_column: y,
        |        buckets: "256", model_path: "$model"}}
        |  clf_tp_out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [clf]}
        |  clf: {connect: [clf_tp_out]}
        |""".stripMargin
    new graft.pipeline.PipelineCompiler(spark,
      graft.pipeline.PipelineConfig.parse(trainYaml)).runBatch()
    val scoreYaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  clf: {module: llm.classifier, params: {column: text, model_path: "$model",
        |        min_score: "1"}}
        |  clf_mp_out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [clf]}
        |  clf: {connect: [clf_mp_out]}
        |""".stripMargin
    new graft.pipeline.PipelineCompiler(spark,
      graft.pipeline.PipelineConfig.parse(scoreYaml)).runBatch()
    val kept = spark.table("clf_mp_out")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == (0L until 40L).filter(_ % 2 == 1).toSet)
  }

  test("llm.classifier actor trains in-pipeline and gates perfectly " +
      "(train -> HashedBowScore -> gate composition)") {
    val in = java.nio.file.Files
      .createTempDirectory("graft-clf-train-").toString + "/in"
    planted.write.parquet(in)
    val yaml =
      s"""actors:
        |  src: {module: core.receiver, params: {path: "$in"}}
        |  clf: {module: llm.classifier, params: {column: text, label_column: y,
        |        buckets: "512", min_score: "1"}}
        |  clf_train_out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [clf]}
        |  clf: {connect: [clf_train_out]}
        |""".stripMargin
    new graft.pipeline.PipelineCompiler(spark,
      graft.pipeline.PipelineConfig.parse(yaml)).runBatch()
    val kept = spark.table("clf_train_out")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == (0L until 40L).filter(_ % 2 == 1).toSet,
      s"trained gate kept $kept")
  }
}
