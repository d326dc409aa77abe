package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RoutingSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "click"), (2L, "view"), (3L, "click"), (4L, "bogus"), (5L, "purchase"),
    (6L, "view"), (7L, ""), (8L, "click")).toDF("id", "kind")

  test("router branches are disjoint and complete; unknown keys are unroutable") {
    val routes = Seq("click", "view", "purchase")
    val bs = Routing.branches(df, routes, col("kind"))
    val total = bs.values.map(_.count()).sum
    assert(total == df.count(), "branches must partition the input")
    assert(bs("click").count() == 3)
    assert(bs("view").count() == 2)
    assert(bs("purchase").count() == 1)
    assert(bs("__unroutable__").count() == 2)
    // disjoint: every id lands in exactly one branch
    val ids = bs.values.map(_.select($"id").as[Long].collect().toSet).toSeq
    assert(ids.flatten.size == ids.map(_.size).sum)
    // unroutable rows carry the status (router.go:67-76 -> Unroutable)
    assert(bs("__unroutable__").filter($"status" === FlowEventModel.StatusUnroutable)
      .count() == 2)
  }

  test("mux unions all inputs preserving multiset") {
    val a = Seq(1, 2, 3).toDF("v")
    val b = Seq(3, 4).toDF("v")
    val got = Routing.mux(Seq(a, b)).as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 2, 3, 3, 4))
  }

  test("replicator `each` emits k copies of every row") {
    val out = Routing.replicateEach(df, 3)
    assert(out.count() == df.count() * 3)
    assert(out.groupBy($"copy_id").count().collect().forall(_.getLong(1) == df.count()))
    // every row present in every copy
    assert(out.filter($"copy_id" === 2).select($"id").as[Long].collect().toSet ==
      (1L to 8L).toSet)
  }

  test("replicator `fanout` sends each row to exactly one peer, balanced per partition") {
    val n = 900
    val input = spark.range(n).repartition(3)
    val out = Routing.replicateFanout(input.toDF(), 3)
    assert(out.count() == n)
    val counts = out.groupBy($"copy_id").count().as[(Int, Long)].collect().toMap
    // per-partition round-robin => near-perfect balance
    assert(counts.keySet == Set(0, 1, 2))
    counts.values.foreach(c => assert(math.abs(c - n / 3) <= 3, s"imbalance: $counts"))
  }

  test("replicator `rand` routes every row to a valid peer") {
    val out = Routing.replicateRand(df, 4)
    assert(out.count() == df.count())
    assert(out.select($"copy_id").as[Int].collect().forall(c => c >= 0 && c < 4))
  }

  test("replicator `ncopy` places n distinct jump-hash replicas per row") {
    val input = spark.range(100).toDF("id")
    val out = Routing.replicateNcopy(input, col("id"), 2, 8)
    assert(out.count() == 200)
    val perRow = out.groupBy($"id").agg(
      countDistinct($"copy_id").as("nd"), count(lit(1)).as("n"))
    assert(perRow.filter($"nd" =!= 2 || $"n" =!= 2).count() == 0)
    // deterministic across runs
    val again = Routing.replicateNcopy(input, col("id"), 2, 8)
      .orderBy($"id", $"copy_id").collect().toSeq
    assert(out.orderBy($"id", $"copy_id").collect().toSeq == again)
  }
}
