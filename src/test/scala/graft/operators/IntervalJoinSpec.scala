package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(as: Seq[(Long, Long, Long)], bs: Seq[(Long, Long, Long)])
      : Set[(Long, Long)] =
    (for {
      (ia, sa, ea) <- as
      (ib, sb, eb) <- bs
      if sa <= eb && sb <= ea
    } yield (ia, ib)).toSet

  private val rng = new scala.util.Random(17)
  private def randomIntervals(n: Int, idBase: Long): Seq[(Long, Long, Long)] =
    (0 until n).map { i =>
      val s = rng.nextInt(100000).toLong
      (idBase + i, s, s + 1 + rng.nextInt(3000))
    }

  test("banded join equals the quadratic overlap join, each pair once") {
    val as = randomIntervals(200, 0L)
    val bs = randomIntervals(200, 10000L)
    val got = IntervalJoin.overlaps(
        as.toDF("id_a", "a_s", "a_e"), bs.toDF("id_b", "b_s", "b_e"),
        "a_s", "a_e", "b_s", "b_e", bucketWidth = 2048L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    // exactly once per pair: no canonical-bucket duplicates
    assert(got.length == got.toSet.size)
    assert(got.toSet == brute(as, bs))
    assert(got.nonEmpty)
  }

  test("intervals spanning many buckets dedup to one emission") {
    val as = Seq((1L, 0L, 100000L)) // covers ~50 buckets at width 2048
    val bs = Seq((2L, 500L, 600L), (3L, 99000L, 120000L), (4L, 200000L, 200010L))
    val got = IntervalJoin.overlaps(
        as.toDF("id_a", "a_s", "a_e"), bs.toDF("id_b", "b_s", "b_e"),
        "a_s", "a_e", "b_s", "b_e", bucketWidth = 2048L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 2L), (1L, 3L)))
  }

  test("plan is an equi-join: no cartesian or broadcast nested loop") {
    val df = IntervalJoin.overlaps(
      randomIntervals(50, 0L).toDF("id_a", "a_s", "a_e"),
      randomIntervals(50, 1000L).toDF("id_b", "b_s", "b_e"),
      "a_s", "a_e", "b_s", "b_e", bucketWidth = 1024L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"expected a bucket equi-join, got:\n$plan")
  }

  test("touching endpoints overlap (closed intervals); disjoint do not") {
    val as = Seq((1L, 0L, 10L)).toDF("id_a", "a_s", "a_e")
    val bs = Seq((2L, 10L, 20L), (3L, 11L, 20L)).toDF("id_b", "b_s", "b_e")
    val got = IntervalJoin.overlaps(as, bs, "a_s", "a_e", "b_s", "b_e", 4L)
      .select($"id_b").as[Long].collect().toSet
    assert(got == Set(2L))
  }

  test("overlapping column names are rejected loudly") {
    val a = Seq((1L, 0L, 1L)).toDF("id", "s", "e")
    intercept[IllegalArgumentException] {
      IntervalJoin.overlaps(a, a, "s", "e", "s", "e", 10L)
    }
  }

  // ---- hybrid long-interval handling ----------------------------------

  test("hybrid equals brute on a mixed-length corpus (auto width)") {
    // short mass + planted corpus-spanning outliers on BOTH sides —
    // the shape that makes pure banding explode
    val as = randomIntervals(150, 0L) ++ Seq(
      (9000L, 0L, 10000000L), (9001L, 50000L, 9000000L))
    val bs = randomIntervals(150, 10000L) ++ Seq(
      (9100L, 100L, 20000000L))
    val got = IntervalJoin.overlapsHybrid(
        as.toDF("id_a", "a_s", "a_e"), bs.toDF("id_b", "b_s", "b_e"),
        "a_s", "a_e", "b_s", "b_e") // bucketWidth auto-picked
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size, "a pair was emitted twice")
    assert(got.toSet == brute(as, bs))
    // the outliers matched everything alive in their span
    assert(got.count(_._1 == 9000L) == bs.size)
  }

  test("hybrid equals the pure banded join when no interval is long") {
    val as = randomIntervals(120, 0L)
    val bs = randomIntervals(120, 10000L)
    val banded = IntervalJoin.overlaps(
        as.toDF("id_a", "a_s", "a_e"), bs.toDF("id_b", "b_s", "b_e"),
        "a_s", "a_e", "b_s", "b_e", bucketWidth = 2048L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val hybrid = IntervalJoin.overlapsHybrid(
        as.toDF("id_a", "a_s", "a_e"), bs.toDF("id_b", "b_s", "b_e"),
        "a_s", "a_e", "b_s", "b_e", bucketWidth = 2048L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(hybrid == banded)
  }

  test("hybrid plan: banded equi-join for the short mass, broadcast NL for outliers") {
    val as = randomIntervals(80, 0L) ++ Seq((9000L, 0L, 10000000L))
    val bs = randomIntervals(80, 10000L)
    val df = IntervalJoin.overlapsHybrid(
      as.toDF("id_a", "a_s", "a_e"), bs.toDF("id_b", "b_s", "b_e"),
      "a_s", "a_e", "b_s", "b_e", bucketWidth = 2048L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // no cartesian anywhere; the outlier legs are broadcast nested
    // loops (bounded by the few-long assumption), the short mass stays
    // a bucket equi-join
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan)
  }

  test("hybrid on empty inputs returns empty (auto width has no median)") {
    val e = Seq.empty[(Long, Long, Long)].toDF("id_a", "a_s", "a_e")
    val f = Seq.empty[(Long, Long, Long)].toDF("id_b", "b_s", "b_e")
    // approx_percentile over zero rows is null — must not NPE
    assert(IntervalJoin.overlapsHybrid(e, f, "a_s", "a_e", "b_s", "b_e")
      .count() == 0L)
  }

  test("long-heavy corpus: broadcast gate engages, shuffled theta stays exact") {
    val as = randomIntervals(40, 0L) ++
      (0 until 30).map(i => (8000L + i, i * 10L, 5000000L + i))
    val bs = randomIntervals(40, 10000L)
    // suppress Spark's own size-based auto-broadcast so the plan shows
    // the gate's choice, not the optimizer's small-input shortcut
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = IntervalJoin.overlapsHybrid(
        as.toDF("id_a", "a_s", "a_e"), bs.toDF("id_b", "b_s", "b_e"),
        "a_s", "a_e", "b_s", "b_e", bucketWidth = 2048L,
        maxLongBroadcast = 0L) // gate always engages
      val got = df.select($"id_a", $"id_b").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size)
      assert(got.toSet == brute(as, bs))
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // past the budget the outlier legs run shuffled (cartesian), never
      // a driver-fed broadcast of a long-heavy side
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(4000))
      assert(plan.contains("CartesianProduct"), plan.take(4000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hybrid legs partition the space: long x long pairs appear exactly once") {
    val as = Seq((1L, 0L, 1000000L), (2L, 5L, 10L))
    val bs = Seq((3L, 0L, 2000000L), (4L, 7L, 12L))
    val got = IntervalJoin.overlapsHybrid(
        as.toDF("id_a", "a_s", "a_e"), bs.toDF("id_b", "b_s", "b_e"),
        "a_s", "a_e", "b_s", "b_e", bucketWidth = 4L, longFactor = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size)
    assert(got.toSet == brute(as, bs))
  }
}
