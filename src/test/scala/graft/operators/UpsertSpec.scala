package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 0L), (2L, "b", 0L), (3L, "c", 0L), (4L, "d", 5L)
  ).toDF("k", "payload", "version")

  test("last writer wins; untouched keys pass through") {
    val changes = Seq((2L, "b2", 1L), (3L, "c0", -1L))
      .toDF("k", "payload", "version")
    val out = Upsert(base, changes, Seq("k"), "version")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // key 3's change carries a LOWER version than base -> base row wins
    assert(out.toSeq == Seq((1L, "a", 0L), (2L, "b2", 1L), (3L, "c", 0L), (4L, "d", 5L)))
  }

  test("a change beats base at an equal version") {
    val changes = Seq((4L, "d5", 5L)).toDF("k", "payload", "version")
    val out = Upsert(base, changes, Seq("k"), "version")
      .filter($"k" === 4L).as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((4L, "d5", 5L)))
  }

  test("tombstones drop the key; several versions per key fold to the max") {
    val changes = Seq(
      (1L, "a1", 1L, false), (1L, "a2", 2L, false), // both updates: v2 wins
      (2L, "x", 3L, true),                          // delete
      (3L, "c1", 1L, false), (3L, "x", 2L, true)    // update then delete: gone
    ).toDF("k", "payload", "version", "deleted")
    val out = Upsert(base, changes, Seq("k"), "version", Some("deleted"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a2", 2L), (4L, "d", 5L)))
  }

  test("plan shape: one exchange — the merge is a single key shuffle") {
    val changes = Seq((2L, "b2", 1L)).toDF("k", "payload", "version")
    val merged = Upsert(base, changes, Seq("k"), "version")
    merged.collect()
    // AQE's toString renders final AND initial plans — count the final only
    val plan = merged.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one shuffle, plan:\n$plan")
  }

  test("a NULL tombstone flag means NOT deleted") {
    val changes = Seq(
      (2L, "b2", 1L, Some(false)),
      (3L, "c2", 1L, None: Option[Boolean]), // null flag: must survive
      (4L, "x", 6L, Some(true)))
      .toDF("k", "payload", "version", "deleted")
    val out = Upsert(base, changes, Seq("k"), "version", Some("deleted"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 0L), (2L, "b2", 1L), (3L, "c2", 1L)))
  }

  test("equal key+version duplicate changes pick a deterministic winner") {
    val changes = Seq((2L, "left", 7L), (2L, "right", 7L))
      .toDF("k", "payload", "version")
    val runs = (1 to 3).map { _ =>
      Upsert(base, changes.repartition(4), Seq("k"), "version")
        .filter($"k" === 2L).as[(Long, String, Long)].collect().toSeq
    }
    assert(runs.distinct.size == 1, s"nondeterministic winners: $runs")
  }

  test("empty change batch is the identity") {
    val changes = Seq.empty[(Long, String, Long)].toDF("k", "payload", "version")
    val out = Upsert(base, changes, Seq("k"), "version")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.length == 4)
  }
}
