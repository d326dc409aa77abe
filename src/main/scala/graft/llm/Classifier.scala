package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed bag-of-words linear classifier TRAINING — the in-pipeline
  * counterpart of [[graft.functions.HashedBowScore]] inference
  * (CCNet-style pipelines train their quality filter on the corpus
  * they curate; scoring a supplied weight vector is only half the
  * loop).
  *
  * The trainer is deterministic full-batch gradient descent over the
  * SAME md5-bucket features the inference expression reads (first two
  * MD5 bytes mod `buckets` — the hashing trick, SQL-reproducible from
  * md5 hex digits), in EXACT INTEGER ppm/micro fixed point like the
  * n-gram LM: weights live in micro units (1e6 = 1.0), the logistic
  * link is the hard sigmoid σ(m) = clamp(½ + m/4, 0, 1) evaluated in
  * ppm, and every division TRUNCATES toward zero (Spark `div`, DuckDB
  * `//`, Scala `Long./` — the one integer-division semantics all
  * three share) — every quantity an integer at every step, so a
  * DuckDB oracle unrolling the same iterations reproduces the weights
  * HASH-EXACT (`llm_classifier_train`), the same discipline that
  * makes the LM and BPE lifecycles checkable.
  *
  * Distribution shape (100-TB posture): the feature frame (doc,
  * bucket, count) is built once and persisted DISK_ONLY; each
  * iteration is two narrow-key shuffles — margins by doc (the weight
  * table is `buckets` rows, broadcast), gradients by bucket — and a
  * driver collect of at most `buckets` partial gradients (the model
  * itself, KBs at 4096 buckets, the only driver state). Corpus size
  * never lands on the driver; iterations stream the persisted
  * features. Gradient partials accumulate in ≤ n·1e6·maxTf long
  * units — within int64 to ~10¹² token occurrences per bucket; past
  * that, shard the corpus and average models (the standard full-batch
  * scale-out), or lower lr and subsample.
  */
object Classifier {

  /** Bucket column of a token column — the [[graft.functions
    * .HashedBowScore.bucket]] contract as a codegen Column (first 4
    * md5 hex digits = first two digest bytes, mod `buckets`). */
  def bucketCol(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 4), 16, 10).cast("long") % buckets

  /** Train weights (micro units, one per bucket) by `iters` full-batch
    * iterations from w = 0. `labelCol` is 0/1. Deterministic: same
    * corpus → bit-identical weights, any partitioning, any row order
    * (gradients are exact integer sums). */
  def train(docs: DataFrame, textCol: String, labelCol: String,
            idCol: String, buckets: Int, iters: Int,
            lrPpm: Long = 1000000L): Array[Long] = {
    require(buckets > 0 && iters >= 0 && lrPpm > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    // (doc, y, bucket, cnt): built once, streamed per iteration
    val feats = docs
      .select(col(idCol).as("doc_id"), col(labelCol).cast("long").as("y"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), col("y"), bucketCol(col("tok"), buckets).as("b"))
      .groupBy(col("doc_id"), col("y"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val n = docs.count()
    val w = new Array[Long](buckets)
    try {
      if (n == 0) return w
      for (_ <- 0 until iters) {
        val wDf = broadcast(
          w.toIndexedSeq.zipWithIndex.map { case (wt, b) => (b.toLong, wt) }
            .toDF("b", "w"))
        // margins by doc (micro), then hard-sigmoid error in ppm
        val err = feats.join(wDf, Seq("b"))
          .groupBy(col("doc_id"), col("y"))
          .agg(sum(col("w") * col("cnt")).as("marg"))
          .select(col("doc_id"),
            (greatest(lit(0L), least(lit(1000000L),
              lit(500000L) + expr("marg div 4"))) -
              col("y") * 1000000L).as("err"))
        // bucket gradients: exact integer Σ err·cnt — ≤ buckets rows
        val grads = feats.join(err, Seq("doc_id"))
          .groupBy(col("b")).agg(sum(col("err") * col("cnt")).as("g"))
          .as[(Long, Long)].collect()
        grads.foreach { case (b, g) =>
          w(b.toInt) -= lrPpm * g / (n * 1000000L) // truncating, like div///
        }
      }
      w
    } finally feats.unpersist()
  }

  /** Trained weights as a (bucket, w_micro) frame — the
    * llm_classifier_train output shape, and the literal-array source
    * for a [[graft.functions.HashedBowScore]] scoring pass. */
  def trainDf(docs: DataFrame, textCol: String, labelCol: String,
              idCol: String, buckets: Int, iters: Int,
              lrPpm: Long = 1000000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, textCol, labelCol, idCol, buckets, iters, lrPpm)
      .toIndexedSeq.zipWithIndex.map { case (wt, b) => (b.toLong, wt) }
      .toDF("b", "w_micro")
  }

  /** Trained weights as a literal array Column for HashedBowScore —
    * constant-folded into the scoring scan (map-only inference). */
  def weightsColumn(w: Array[Long]): Column =
    array(w.toIndexedSeq.map(lit): _*)

  /** Persist trained weights as the model artifact (one (b, w_micro)
    * parquet, KBs) — the train-once/score-many form every other model
    * family here has ([[Lm.lmBuildIndex]], [[Bpe.saveMerges]]). */
  def saveWeights(spark: org.apache.spark.sql.SparkSession, w: Array[Long],
                  path: String): Unit = {
    import spark.implicits._
    w.toIndexedSeq.zipWithIndex.map { case (wt, b) => (b.toLong, wt) }
      .toDF("b", "w_micro").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted weight vector — a buckets-sized collect by
    * construction. Missing buckets (never written) read as 0. */
  def loadWeights(spark: org.apache.spark.sql.SparkSession,
                  path: String): Array[Long] = {
    val rows = spark.read.parquet(path)
      .select(col("b"), col("w_micro")).collect()
    require(rows.nonEmpty, s"empty classifier model at $path")
    val buckets = rows.map(_.getLong(0)).max.toInt + 1
    val w = new Array[Long](buckets)
    rows.foreach(r => w(r.getLong(0).toInt) = r.getLong(1))
    w
  }
}
