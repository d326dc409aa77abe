package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rng = new scala.util.Random(3)
    (1 to 5000).map(i => (i.toLong, s"g${i % 17}", rng.nextInt(10000)))
      .toDF("id", "grp", "score").repartition(7)
  }

  test("custom top-k operator matches the window row_number form exactly") {
    val want = df.withColumn("rank",
        row_number().over(Window.partitionBy($"grp").orderBy($"score".desc, $"id")))
      .filter($"rank" <= 3)
      .select($"id", $"grp", $"score", $"rank")
      .as[(Long, String, Int, Int)].collect().toSet
    val got = TopKPerKey(df, Seq($"grp"), Seq($"score".desc, $"id".asc), 3)
      .select($"id", $"grp", $"score", $"rank")
      .as[(Long, String, Int, Int)].collect().toSet
    assert(got == want)
    assert(got.size == 17 * 3)
  }

  test("physical plan is two-phase with an exchange between partial and final") {
    val plan = TopKPerKey(df, Seq($"grp"), Seq($"score".desc, $"id".asc), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopK"), plan)
    assert(plan.contains("PartialTopK"), plan)
    assert(plan.contains("Exchange"), plan)
    // partial must come after (below) the exchange: map-side capping
    val finalIdx = plan.indexOf("FinalTopK")
    val exIdx = plan.indexOf("Exchange")
    val partIdx = plan.indexOf("PartialTopK")
    assert(finalIdx < exIdx && exIdx < partIdx, plan)
  }

  test("k larger than group size yields whole groups, ranked") {
    val small = Seq((1L, "a", 5), (2L, "a", 3), (3L, "b", 9)).toDF("id", "grp", "score")
    val got = TopKPerKey(small, Seq($"grp"), Seq($"score".asc, $"id".asc), 10)
      .select($"id", $"rank").as[(Long, Int)].collect().toSet
    assert(got == Set((2L, 1), (1L, 2), (3L, 1)))
  }

  test("global top-k (no keys) works") {
    val got = TopKPerKey(df, Nil, Seq($"score".desc, $"id".asc), 5)
      .select($"rank").as[Int].collect().sorted.toSeq
    assert(got == Seq(1, 2, 3, 4, 5))
  }
}
