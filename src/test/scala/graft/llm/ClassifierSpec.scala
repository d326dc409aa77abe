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

  test("extreme learning rates update exactly (the BigInt step): a " +
      "Long product would wrap and flip the weight's sign") {
    val one = Seq((1L, 1, "zzcue zzcue zzcue")).toDF("doc_id", "y", "text")
    // n=1, one bucket with cnt=3: err = -5e5, g = -1.5e6;
    // lrPpm*g = -7.5e23 overflows int64 (would wrap positive) — the
    // exact update is w -= lrPpm*g/(n*1e6) = +7.5e17
    val w = Classifier.train(one, "text", "y", "doc_id",
      buckets = 8, iters = 1, lrPpm = 500000000000000000L)
    val b = HashedBowScore.bucket("zzcue".getBytes("UTF-8"), 8)
    assert(w(b) == 750000000000000000L, s"got ${w(b)}")
    assert(w.zipWithIndex.filter(_._2 != b).forall(_._1 == 0L))
  }

  test("trainMulti one-vs-rest + predict: argmax recovers every " +
      "planted label; label order is deterministic and ties break to " +
      "the first sorted label") {
    val langs = Seq("aa", "bb", "cc", "dd")
    val docs = (0L until 40L).map { i =>
      val l = langs((i % 4).toInt)
      (i, l, s"${l}tok1 ${l}tok2 ${l}tok1 shared${i % 3}")
    }.toDF("doc_id", "lang", "text")
    val models = Classifier.trainMulti(docs, "text", "lang", "doc_id",
      buckets = 512, iters = 2)
    assert(models.map(_._1) == langs) // sorted label order
    val preds = docs.withColumn("pred", Classifier.predict(
        TextFunctions.tokens($"text"), models))
      .select($"lang", $"pred").as[(String, String)].collect()
    assert(preds.forall { case (l, p) => l == p },
      s"mispredictions: ${preds.filter(x => x._1 != x._2).toSeq}")
    // all-zero models tie every margin at 0 -> first sorted label wins
    val zeros = langs.map(_ -> Array.fill(8)(0L))
    val tied = docs.limit(1).select(Classifier.predict(
      TextFunctions.tokens($"text"), zeros).as("p")).as[String].head()
    assert(tied == "aa")
  }

  test("one-pass trainMulti is BIT-IDENTICAL to the per-label train " +
      "loop (same margins, errors, gradients, BigInt steps — only the " +
      "pass structure differs)") {
    val langs = Seq("aa", "bb", "cc")
    val docs = (0L until 30L).map { i =>
      val l = langs((i % 3).toInt)
      (i, l, s"${l}cue ${l}cue shared${i % 5} filler${i % 7}")
    }.toDF("doc_id", "lang", "text")
    val onePass = Classifier.trainMulti(docs, "text", "lang", "doc_id",
      buckets = 256, iters = 3)
    val perLabel = langs.sorted.map { l =>
      l -> Classifier.train(
        docs.withColumn("__y", (col("lang") === l).cast("int")),
        "text", "__y", "doc_id", buckets = 256, iters = 3)
    }
    assert(onePass.map(_._1) == perLabel.map(_._1))
    onePass.zip(perLabel).foreach { case ((l, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b), s"weights diverge for '$l'")
    }
    // degenerate shapes hold: zero labels, zero iterations
    assert(Classifier.trainMulti(docs.filter(lit(false)), "text", "lang",
      "doc_id", 16, 2).isEmpty)
    val z = Classifier.trainMulti(docs, "text", "lang", "doc_id", 16, 0)
    assert(z.map(_._1) == langs.sorted &&
      z.forall(_._2.forall(_ == 0L)))
  }

  test("char-n-gram features rescue short unseen-word language ID " +
      "where the word model ties out to the first sorted label") {
    val train = (0L until 60L).map { i =>
      val (lang, phrase) = (i % 3) match {
        case 0 => ("de", "schule achtung zeitung schreiben")
        case 1 => ("fi", "kaupunki kukka kakku silakka")
        case _ => ("pt", "coracao educacao nacao atencao")
      }
      (i, lang, s"$phrase tag${i % 7}")
    }.toDF("doc_id", "lang", "text")
    val word = Classifier.trainMulti(train, "text", "lang", "doc_id",
      buckets = 512, iters = 2)
    val ngram = Classifier.trainMulti(train, "text", "lang", "doc_id",
      buckets = 512, iters = 2,
      tokensOf = TextFunctions.charNgrams(_))
    // SHORT test docs: single words NEVER seen in training, but whose
    // char 2-5-grams overlap the training morphology
    val tests = Seq((100L, "de", "schreibung"), (101L, "fi", "kukkakakku"),
      (102L, "pt", "aviacao")).toDF("doc_id", "lang", "text")
    val out = tests.select($"lang",
        Classifier.predict(TextFunctions.tokens($"text"), word)
          .as("pred_word"),
        Classifier.predict(TextFunctions.charNgrams($"text"), ngram)
          .as("pred_ngram"))
      .as[(String, String, String)].collect()
    // the n-gram model recovers every language
    assert(out.forall { case (l, _, pn) => l == pn },
      s"ngram mispredictions: ${out.toSeq}")
    // the word model misroutes at least the non-first labels (unseen
    // word -> all margins 0 -> argmax ties to the first sorted label)
    assert(out.count { case (l, pw, _) => l != pw } >= 2,
      s"word model unexpectedly right: ${out.toSeq}")
  }

  test("llm.langid actor with labeled_path trains the classifier and " +
      "gates on predicted languages") {
    val labeled = (0L until 24L).map { i =>
      val l = Seq("en", "ru", "zh")((i % 3).toInt)
      val phr = Map("en" -> "hello world friend",
        "ru" -> "привет мир друг", "zh" -> "天气很好")(l)
      (i, l, s"$phr $phr")
    }.toDF("doc_id", "lang", "text")
    val lp = java.nio.file.Files
      .createTempDirectory("graft-langid-clf-").toString + "/labeled"
    labeled.write.parquet(lp)
    val in = java.nio.file.Files
      .createTempDirectory("graft-langid-clf-").toString + "/in"
    Seq((100L, "hello friend of the world"),
        (101L, "мир и привет другу"),
        (102L, "天气很好")) // no spaces: Unicode tokenizer territory
      .toDF("doc_id", "text").write.parquet(in)
    val mp = java.nio.file.Files
      .createTempDirectory("graft-langid-clf-").toString + "/model"
    val yaml =
      s"""actors:
        |  src:  {module: core.receiver, params: {path: "$in"}}
        |  lid:  {module: llm.langid, params: {column: text,
        |         labeled_path: "$lp", model_path: "$mp",
        |         buckets: "512", train_iters: "2", keep: "ru,zh"}}
        |  langid_clf_out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [lid]}
        |  lid: {connect: [langid_clf_out]}
        |""".stripMargin
    new graft.pipeline.PipelineCompiler(spark,
      graft.pipeline.PipelineConfig.parse(yaml)).runBatch()
    val out = spark.table("langid_clf_out")
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    assert(out == Map(101L -> "ru", 102L -> "zh"), s"got $out")
    // train-once/score-many: a label-LESS run predicts from the
    // persisted model family identically (no labeled data in reach)
    val yaml2 =
      s"""actors:
        |  src:  {module: core.receiver, params: {path: "$in"}}
        |  lid:  {module: llm.langid, params: {column: text,
        |         model_path: "$mp"}}
        |  langid_model_out: {module: core.sink, params: {format: memory}}
        |pipeline:
        |  src: {connect: [lid]}
        |  lid: {connect: [langid_model_out]}
        |""".stripMargin
    new graft.pipeline.PipelineCompiler(spark,
      graft.pipeline.PipelineConfig.parse(yaml2)).runBatch()
    val out2 = spark.table("langid_model_out")
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    assert(out2 == Map(100L -> "en", 101L -> "ru", 102L -> "zh"),
      s"got $out2")
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
