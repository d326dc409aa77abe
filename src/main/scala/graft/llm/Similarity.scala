package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CosineSimFloat, HashFunctions}

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * - bruteKnn: exact cosine top-k — the baseline and correctness oracle.
  *   O(n*m) pairs; at scale you broadcast the (smaller) query side and
  *   rely on codegen'd dot products; usable up to ~1e5 x 1e7 pairs/node.
  * - lshKnn: the scale path. Random-hyperplane signatures bucket vectors;
  *   only same-bucket (or near-bucket, via multi-probe `probeBits`) pairs
  *   are scored. Recall tunes with `bits` (fewer bits = bigger buckets =
  *   higher recall, more compute).
  * - nearDupPairs: all pairs with cosine >= threshold, exact.
  */
object Similarity {

  /** Exact cosine top-k neighbors per query vector (self-join variant:
    * queries = corpus, excluding self-pairs).
    * Output: vec_id, neighbor_id, cos_sim (rounded 6 dp), rank. */
  def bruteKnn(emb: DataFrame, k: Int): DataFrame = {
    val a = emb.select(col("vec_id"), col("embedding"))
    val b = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("emb_b"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    a.crossJoin(broadcast(b))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("cos_sim",
        round(CosineSimFloat(col("embedding"), col("emb_b")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** All pairs (id_a < id_b) with cosine >= threshold, exact. */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(CosineSimFloat(col("emb_a"), col("emb_b")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** LSH-bucketed approximate top-k: score only pairs sharing a hyperplane
    * bucket (plus multi-probe neighbors within `probeBits` bit flips).
    * Returns the same shape as bruteKnn; rows may be missing when no
    * candidate shared a bucket (approximate recall). */
  def lshKnn(emb: DataFrame, k: Int, bits: Int = 8, probeBits: Int = 1): DataFrame = {
    val sig = emb.select(col("vec_id"), col("embedding"),
      HashFunctions.hyperplaneSig(bits)(col("embedding")).as("sig"))
    // multi-probe: each vector also lands in buckets within `probeBits`
    // Hamming distance of its own (query-side only, to bound blowup)
    val probes = (0 until bits).map(b => 1L << b)
    val probeExpr = if (probeBits >= 1) {
      array((lit(0L) +: probes.map(lit)): _*)
    } else array(lit(0L))
    val q = sig.withColumn("probe", explode(probeExpr))
      .withColumn("bucket", col("sig").bitwiseXOR(col("probe")))
      .select(col("vec_id"), col("embedding"), col("bucket"))
    val c = sig.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("emb_b"), col("sig").as("bucket"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    q.join(c, Seq("bucket"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .select(col("vec_id"), col("embedding"), col("neighbor_id"), col("emb_b"))
      .distinct()
      .withColumn("cos_sim",
        round(CosineSimFloat(col("embedding"), col("emb_b")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }
}
