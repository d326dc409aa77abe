package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic: identical sample across runs and partitionings") {
    val df = (0L until 500L).map(i => (i, "g", 1L + i % 7)).toDF("id", "g", "w")
    def run(parts: Int): Seq[(Long, Int)] =
      Sampling.weightedSample(df.repartition(parts), Seq("g"), "id", "w", k = 25)
        .select($"id", $"sample_rank").as[(Long, Int)].collect().sortBy(_._2).toSeq
    assert(run(1) == run(13) && run(13) == run(32))
  }

  test("weights drive inclusion: heavy items win far more often") {
    // 200 independent groups, each with one weight-20 item among 19
    // weight-1 items; k=1. Expected P(heavy wins) well above uniform
    // 1/20 — A-ES gives 20/39 ≈ 0.51 for 20-vs-19x1.
    val rows = for {
      g <- 0L until 200L
      i <- 0L until 20L
    } yield (g * 100 + i, s"g$g", if (i == 0) 20L else 1L)
    val winners = Sampling.weightedSample(rows.toDF("id", "g", "w"),
        Seq("g"), "id", "w", k = 1)
      .select($"w").as[Long].collect()
    val heavyWins = winners.count(_ == 20L)
    assert(heavyWins > 60 && heavyWins < 160, // uniform would be ~10
      s"heavy item won $heavyWins of 200 groups")
  }

  test("equal weights degrade to an unbiased hash order; k caps per group") {
    val rows = (0L until 300L).map(i => (i, s"g${i % 3}", 5L))
    val got = Sampling.weightedSample(rows.toDF("id", "g", "w"),
      Seq("g"), "id", "w", k = 10)
    val byG = got.groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(byG.values.toSet == Set(10L))
    assert(got.filter($"sample_rank" > 10).count() == 0)
  }

  test("non-positive weights are excluded; a fresh seed is a fresh sample") {
    val df = (0L until 100L).map(i =>
      (i, "g", if (i < 50) 0L else 3L)).toDF("id", "g", "w")
    val got = Sampling.weightedSample(df, Seq("g"), "id", "w", k = 40)
      .select($"id").as[Long].collect().toSet
    assert(got.forall(_ >= 50L) && got.size == 40)

    val all = (0L until 400L).map(i => (i, "g", 2L)).toDF("id", "g", "w")
    val s1 = Sampling.weightedSample(all, Seq("g"), "id", "w", 50, seed = "a")
      .select($"id").as[Long].collect().toSet
    val s2 = Sampling.weightedSample(all, Seq("g"), "id", "w", 50, seed = "b")
      .select($"id").as[Long].collect().toSet
    assert(s1 != s2 && s1.size == 50 && s2.size == 50)
  }
}
