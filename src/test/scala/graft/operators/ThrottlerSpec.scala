package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ThrottlerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("per-key per-window quota marks overflow THROTTLED, earliest rows pass") {
    // key a: 4 events in minute 0 (quota 2 -> 2 throttled), 1 in minute 1
    // key b: 2 events in minute 0 -> all pass
    val rows = Seq(
      ("a", ts(0, 1), 1L), ("a", ts(0, 2), 2L), ("a", ts(0, 3), 3L), ("a", ts(0, 4), 4L),
      ("a", ts(1, 0), 5L),
      ("b", ts(0, 5), 6L), ("b", ts(0, 6), 7L))
      .toDF("key", "ts", "id")
    val out = Throttler.throttleByWindow(rows, col("key"), col("ts"), "1 minute", 2,
      Seq(col("ts"), col("id")))
    val status = out.select($"id", $"status").as[(Long, String)].collect().toMap
    assert(status(1L) == FlowEventModel.StatusDone)
    assert(status(2L) == FlowEventModel.StatusDone)
    assert(status(3L) == FlowEventModel.StatusThrottled)
    assert(status(4L) == FlowEventModel.StatusThrottled)
    assert(status(5L) == FlowEventModel.StatusDone) // fresh window
    assert(status(6L) == FlowEventModel.StatusDone)
    assert(status(7L) == FlowEventModel.StatusDone)
  }

  test("throttling is per key: one hot key does not starve others") {
    val rows = (1L to 20L).map(i => ("hot", ts(0, i.toInt), i)) :+ (("cold", ts(0, 30), 99L))
    val out = Throttler.throttleByWindow(rows.toDF("key", "ts", "id"),
      col("key"), col("ts"), "1 minute", 5, Seq(col("ts"), col("id")))
    assert(out.filter($"key" === "cold" && $"status" === FlowEventModel.StatusDone).count() == 1)
    assert(out.filter($"key" === "hot" && $"status" === FlowEventModel.StatusDone).count() == 5)
    assert(out.filter($"status" === FlowEventModel.StatusThrottled).count() == 15)
  }
}
