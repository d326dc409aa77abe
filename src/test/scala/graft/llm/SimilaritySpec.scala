package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{CosineSimFloat, VectorFunctions}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(11)
  /** clustered vectors: 10 centers, 10 members each with small noise —
    * nearest neighbors are overwhelmingly within-cluster. */
  private lazy val emb = {
    val centers = Array.fill(10)(Array.fill(16)(rng.nextGaussian().toFloat))
    (0L until 100L).map { i =>
      val c = centers((i % 10).toInt)
      val v = c.map(x => x + 0.05f * rng.nextGaussian().toFloat)
      (i, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("codegen cosine expression agrees with the column-function fold") {
    val pairs = emb.as("a").crossJoin(emb.as("b")).limit(500)
      .select(
        CosineSimFloat(col("a.embedding"), col("b.embedding")).as("fast"),
        VectorFunctions.cosine(col("a.embedding"), col("b.embedding")).as("slow"))
    assert(pairs.filter(abs($"fast" - $"slow") > 1e-12).count() == 0)
  }

  test("cosine of a vector with itself is 1, zero vector yields null") {
    val df = Seq((1L, Seq(1f, 2f, 3f)), (2L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val self = df.select(CosineSimFloat($"embedding", $"embedding").as("c"))
      .collect()
    assert(math.abs(self(0).getDouble(0) - 1.0) < 1e-12)
    assert(self(1).isNullAt(0))
  }

  test("bruteKnn returns exactly k neighbors per vector, self excluded, ranked") {
    val out = Similarity.bruteKnn(emb, 3).cache()
    assert(out.count() == 100 * 3)
    assert(out.filter($"vec_id" === $"neighbor_id").count() == 0)
    assert(out.groupBy($"vec_id").agg(countDistinct($"rank").as("r"))
      .filter($"r" =!= 3).count() == 0)
    // ranks ordered by similarity
    val bad = out.as("x").join(out.as("y"),
      col("x.vec_id") === col("y.vec_id") && col("x.rank") < col("y.rank") &&
        col("x.cos_sim") < col("y.cos_sim"))
    assert(bad.count() == 0)
  }

  test("bruteKnn top-1 stays within the planted cluster") {
    val top1 = Similarity.bruteKnn(emb, 1)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect()
    val inCluster = top1.count { case (v, n) => v % 10 == n % 10 }
    assert(inCluster >= 98, s"only $inCluster/100 top-1 in-cluster")
  }

  test("lshKnn achieves high recall@1 vs brute force on clustered data") {
    val brute = Similarity.bruteKnn(emb, 1)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val lsh = Similarity.lshKnn(emb, 1, bits = 8, probeBits = 1)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val hits = brute.count { case (v, n) => lsh.get(v).contains(n) }
    assert(hits >= 85, s"recall@1 $hits/100")
  }

  test("ivfKnn achieves high recall@1 vs brute force on clustered data") {
    val brute = Similarity.bruteKnn(emb, 1)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val ivf = Similarity.ivfKnn(emb, 1, nlist = 8, nprobe = 3)
      .select($"vec_id", $"neighbor_id").as[(Long, Long)].collect().toMap
    val hits = brute.count { case (v, n) => ivf.get(v).contains(n) }
    assert(hits >= 90, s"recall@1 $hits/100")
  }

  test("ivfKnn is deterministic across runs") {
    val a = Similarity.ivfKnn(emb, 2, nlist = 8, nprobe = 2)
      .orderBy($"vec_id", $"rank").collect().toSeq
    val b = Similarity.ivfKnn(emb, 2, nlist = 8, nprobe = 2)
      .orderBy($"vec_id", $"rank").collect().toSeq
    assert(a == b)
  }

  test("nearDupPairs is symmetric-free (id_a < id_b) and thresholded") {
    val out = Similarity.nearDupPairs(emb, 0.9)
    assert(out.filter($"id_a" >= $"id_b").count() == 0)
    assert(out.filter($"cos_sim" < 0.9).count() == 0)
    assert(out.count() > 0) // clusters guarantee some close pairs
  }
}
