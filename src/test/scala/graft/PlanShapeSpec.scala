package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the operators whose scale story depends
  * on plan shape: blocked similarity joins must be equi-joins (never a
  * cartesian/BNLJ), and SQL subqueries must decorrelate into joins
  * rather than per-row re-execution. Uses the sf0.001 tables — plan
  * shape, not data volume, is what's under test.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("levenshtein blocking compiles to an equi-join, not a cross product") {
    val plan = planOf("llm_dedup_levenshtein")
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(2000))
  }

  test("EXISTS subquery decorrelates to a semi join") {
    val plan = planOf("q40_exists_subquery")
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }

  test("NOT EXISTS subquery decorrelates to an anti join") {
    val plan = planOf("q41_not_exists_subquery")
    assert(plan.contains("LeftAnti"), plan.take(2000))
  }

  test("IN subquery becomes a semi join with the dimension side broadcast") {
    val plan = planOf("q42_in_subquery")
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("shard_pack has no single-partition global window") {
    // the window must be partitioned by shard — a global (empty
    // partition-by) window would serialize the corpus through one task
    val df = SparkEntry.queries("llm_shard_pack")(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.matches("(?s).*windowspecdefinition\\(md5.*"), plan.take(2000))
    assert(plan.contains("windowspecdefinition(shard"), plan.take(2000))
  }

  test("chunking plan is shuffle-free (narrow generate over the scan)") {
    val df = SparkEntry.queries("llm_chunking")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("Generate"), plan.take(2000))
  }
}
