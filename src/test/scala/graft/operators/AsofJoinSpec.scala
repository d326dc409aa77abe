package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join carries the latest right payload at or before each left row") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 00:00:10")),
      (2L, "u1", ts("2024-01-01 00:01:00")),
      (3L, "u1", ts("2024-01-01 00:02:00")),
      (4L, "u2", ts("2024-01-01 00:00:30")),
      (5L, "u3", ts("2024-01-01 00:09:00")))
      .toDF("id", "user", "ts")
    val right = Seq(
      ("u1", ts("2024-01-01 00:00:10"), 100L, 1.5), // same instant as left id=1
      ("u1", ts("2024-01-01 00:01:30"), 101L, 2.5),
      ("u2", ts("2024-01-01 00:00:00"), 200L, 9.0))
      .toDF("user", "rts", "rid", "rv")
    val rows = AsofJoin.asofJoin(left, right, "user", "ts", "rts",
        Map("rid" -> "match_id", "rv" -> "match_v"), rightOrder = "rid")
      .select($"id", $"match_id", $"match_v")
      .as[(Long, Option[Long], Option[Double])].collect()
    val matches = rows.map(r => r._1 -> r._2).toMap
    assert(matches(1L) == Some(100L)) // inclusive same-instant match
    assert(matches(2L) == Some(100L)) // latest at or before 00:01:00
    assert(matches(3L) == Some(101L))
    assert(matches(4L) == Some(200L))
    assert(matches(5L) == None) // no right rows for u3 -> left outer null
  }

  test("left columns and row count are preserved exactly") {
    val left = Seq((1L, "a", ts("2024-01-01 00:00:01")), (2L, "a", ts("2024-01-01 00:00:02")))
      .toDF("id", "k", "ts")
    val right = Seq(("a", ts("2024-01-01 00:00:00"), 7L)).toDF("k", "rts", "rid")
    val out = AsofJoin.asofJoin(left, right, "k", "ts", "rts",
      Map("rid" -> "m"), rightOrder = "rid")
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("id", "k", "ts", "m"))
  }
}
