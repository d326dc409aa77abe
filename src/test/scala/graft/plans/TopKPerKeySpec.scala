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

  test("partial-phase flushing keeps the answer exact past the group bound") {
    // ONE input partition holding 100k distinct keys — far past
    // FlushGroups (32,768), so the map side flushes repeatedly (the
    // per-query-ANN shape that OOM'd an unbounded group map at 1M keys).
    // Rows per key are interleaved so keys span flush windows.
    val wide = spark.range(300000)
      .select(($"id" % 100000).as("key"), ($"id" * 2654435761L % 997).as("score"),
        $"id")
      .coalesce(1)
    val got = TopKPerKey(wide, Seq($"key"), Seq($"score".desc, $"id".asc), 2)
    val want = wide.withColumn("rank",
        row_number().over(Window.partitionBy($"key").orderBy($"score".desc, $"id")))
      .filter($"rank" <= 2)
    assert(got.count() == 200000) // 100k keys x top-2 of 3
    assert(got.select($"key", $"id", $"rank").except(
      want.select($"key", $"id", $"rank")).count() == 0)
    assert(want.select($"key", $"id", $"rank").except(
      got.select($"key", $"id", $"rank")).count() == 0)
  }

  test("runFlushing emits every buffered winner across flush boundaries") {
    // direct kernel check at a tiny bound: 10 keys, maxGroups=3 -> many
    // flushes; union of emitted rows must still contain each key's true
    // top-1 (partial phase may emit extras; it must never LOSE a winner)
    import org.apache.spark.sql.catalyst.expressions.SortOrder
    val rows = (0 until 200).map(i =>
      org.apache.spark.sql.catalyst.InternalRow(
        (i % 10).toLong, (i * 37 % 101).toLong))
    val attrs = Seq(
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "key", org.apache.spark.sql.types.LongType)(),
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "v", org.apache.spark.sql.types.LongType)())
    val order = Seq(SortOrder(attrs(1), org.apache.spark.sql.catalyst.expressions.Descending))
    val emitted = BoundedTopK.runFlushing(rows.iterator, Seq(attrs.head), order,
      k = 1, attrs, maxGroups = 3).map(r => (r.getLong(0), r.getLong(1))).toSeq
    val trueTop = (0 until 200).map(i => ((i % 10).toLong, (i * 37 % 101).toLong))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).max) }.toSet
    assert(trueTop.subsetOf(emitted.toSet), s"missing winners: ${trueTop -- emitted.toSet}")
    // and the emitted stream is a subset of the input (no fabricated rows)
    assert(emitted.toSet.subsetOf((0 until 200).map(i =>
      ((i % 10).toLong, (i * 37 % 101).toLong)).toSet))
  }
}
