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

  test("classifier scoring is map-only: no shuffle, weights constant-folded") {
    val df = SparkEntry.queries("llm_classifier_score")(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"), physical.take(2000))
    // the weight-vector transform(sequence(...)) must fold to a literal
    // at optimization time, not re-evaluate per row
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("transform(sequence"), optimized.take(2000))
  }

  test("HTML extraction is map-only: the whole regexp chain fuses into " +
      "one WholeStageCodegen scan stage") {
    val df = SparkEntry.queries("llm_extract_text")(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    // no shuffle anywhere: extraction must scan-project at input speed
    assert(!physical.contains("Exchange"), physical.take(2000))
    // WholeStageCodegen renders as the *(n) prefix; the regexp chain's
    // Project must carry it (the outer mainContent HOF projection is
    // interpreted by design — lambdas don't codegen)
    assert(physical.contains("*(1) Project") &&
      physical.contains("regexp_replace"), physical.take(2000))
  }

  test("per-lang LM scoring broadcasts the per-language totals") {
    val df = SparkEntry.queries("llm_lm_per_lang")(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    // the totals join must be broadcast (one row per language), and no
    // cartesian may appear anywhere in the lang-keyed join chain
    assert(physical.contains("BroadcastHashJoin"), physical.take(2000))
    assert(!physical.contains("CartesianProduct") &&
      !physical.contains("BroadcastNestedLoopJoin"), physical.take(2000))
  }

  test("span dedup plans: per-doc windows, no cartesian anywhere") {
    for (name <- Seq("llm_dup_spans", "llm_dup_spans_cut")) {
      val df = SparkEntry.queries(name)(spark, dir)
      val optimized = df.queryExecution.optimizedPlan.toString
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct"), s"$name: ${physical.take(1500)}")
      assert(!physical.contains("BroadcastNestedLoopJoin"), s"$name")
      // the island merge must stay partitioned by doc, never a global
      // single-partition window
      if (optimized.contains("windowspecdefinition"))
        assert(optimized.contains("windowspecdefinition(doc_id"), s"$name")
    }
  }

  test("span-index match joins broadcast the batch; the index never sort-merges") {
    val idx = java.nio.file.Files.createTempDirectory("graft-psi-").toString
    val docs = Tables.load(spark, dir, "documents")
    graft.llm.Dedup.spanBuildIndex(docs, "doc_id", "text", idx, w = 8)
    val plan = graft.llm.Dedup
      .spanIndexMatches(docs, "doc_id", "text", idx, materialize = false)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  test("chunking plan is shuffle-free (narrow generate over the scan)") {
    val df = SparkEntry.queries("llm_chunking")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(plan.contains("Generate"), plan.take(2000))
  }

  test("recursive CTE plans a union-loop, and the join side pre-aggregates") {
    val df = SparkEntry.queries("q47_recursive_cte")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the recursion executes as a dedicated physical loop operator, and
    // orders is aggregated BEFORE joining the 84-row calendar (the
    // recursion must never re-scan the fact table)
    assert(plan.contains("UnionLoop"), plan.take(3000))
    assert(plan.contains("HashAggregate"), plan.take(3000))
  }

  test("lateral LIMIT subquery decorrelates to a join + per-group top-k") {
    val df = SparkEntry.queries("q48_lateral_topk")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("Join"), plan.take(3000))
    // the per-nation LIMIT becomes a rank-style window/top-k, evaluated
    // distributed — not a per-outer-row re-execution
    assert(plan.contains("Window") || plan.contains("TopKPerKey"),
      plan.take(3000))
  }

  test("decontamination broadcasts the eval shingle set") {
    val df = SparkEntry.queries("llm_decontaminate")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the benchmark side must be the broadcast build side; the corpus
    // side must stream through the join (no shuffle of the eval set,
    // no cartesian anything)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("mix weights reduce to one partial agg plus a broadcast global min") {
    val df = SparkEntry.queries("llm_mix_weights")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the cross join against the single-row global min must be a
    // broadcast nested loop over ONE row, never a shuffled cartesian
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
  }

  test("lshKnn scores structurally-unique candidate pairs with no dedup shuffle") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = SparkEntry.queries("llm_ann_lsh")(spark, dir)
    val plan = df.queryExecution.optimizedPlan
    // the ranking node is a logical Window, or TopKPerKey when the
    // session has the window->top-k rewrite rule registered (any earlier
    // query through GraftExtensions registers it session-wide)
    val ranking = plan.collect {
      case w: LWindow => w.child
      case t: graft.plans.TopKPerKey => t.child
    }
    assert(ranking.nonEmpty, plan.toString.take(3000))
    // candidate pairs out of the bucket join are structurally unique
    // (query-side-only multi-probe, distinct XOR masks, one bucket per
    // candidate), so NO Aggregate — in particular no global pair-dedup
    // shuffle, the round-4 76 GB spill site — exists anywhere in the plan
    val aggs = plan.collect { case a: Aggregate => a }
    assert(aggs.isEmpty, plan.toString.take(3000))
    // and the uniqueness claim holds in the data: each (vec_id,
    // neighbor_id) pair is ranked at most once
    val dupPairs = df.groupBy("vec_id", "neighbor_id").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count()
    assert(dupPairs === 0L)
  }

  test("repetition kernel spreads across partitions and reuses one exchange") {
    val df = SparkEntry.queries("llm_repetition")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the tokenize-once projection feeds both consumers through the SAME
    // round-robin exchange (base stats + top-gram agg), so the heavy
    // interpreted lambda runs once per row on a spread partitioning
    assert(plan.contains("ReusedExchange") || plan.contains("Exchange"),
      plan.take(3000))
    assert(plan.contains("RoundRobinPartitioning"), plan.take(3000))
  }

  test("pqKnn fast path is a joinless broadcast scan") {
    // the corpus rides as a BROADCAST code table into the query-side
    // kernel: no join operator and no key shuffle may appear — the only
    // exchange is the query spread (round-robin repartition)
    val plan = planOf("llm_ann_pq")
    assert(!plan.contains("Join"), plan.take(3000))
    assert(!plan.contains("hashpartitioning"), plan.take(3000))
    assert(plan.contains("RoundRobinPartitioning"), plan.take(3000))
  }

  test("ivfPqKnn scores through one cell equi-join, never a cross product") {
    val plan = planOf("llm_ann_ivfpq")
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(3000))
  }

  test("bucket assignment is pure map-side: no window, no exchange") {
    // lmAssignBuckets must stay a when() chain over broadcast constants
    // — an ntile re-implementation would surface as a single-partition
    // Window + Exchange and serialize the corpus through one task
    val scored = spark.range(100).selectExpr("id AS doc_id", "10L AS ntok",
      "(id * 37) % 1000 AS lm_score_ppm")
    val plan = graft.llm.Lm.lmAssignBuckets(scored,
      Seq((700L, 10L, 1L), (300L, 10L, 2L)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("xo search prunes term buckets on live AND increment scans") {
    // the increment-folding read is a union of parquet scans; the
    // query's bucket filter must push through the union into EVERY
    // side — an unpruned increment scan would read whole increments
    // per query at 100-TB scale
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-plan-xo-")
      .toString + "/idx"
    graft.llm.Retrieval.bm25BuildIndexBatch(
      Seq((0L, "alpha beta"), (1L, "gamma delta")).toDF("doc_id", "text"),
      "text", "doc_id", idx, batchId = 0L)
    assert(graft.llm.Retrieval.bm25IndexAppendBatch(
      Seq((2L, "alpha epsilon")).toDF("doc_id", "text"),
      "text", "doc_id", idx, batchId = 1L))
    val df = graft.llm.Retrieval.bm25SearchIndex(
      Seq((9L, "alpha")).toDF("query_id", "qtext"), idx, k = 10)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val postingsScans = plan.split("FileScan parquet")
      .filter(s => s.contains("postings"))
    assert(postingsScans.length >= 2, // the live generation + the increment
      s"expected live+increment scans, got ${postingsScans.length}:\n" +
        plan.take(3000))
    postingsScans.foreach { s =>
      val pf = s.indexOf("PartitionFilters: [")
      assert(pf >= 0 && !s.startsWith("]", pf + "PartitionFilters: [".length),
        "a postings scan lost the term_pt partition filter:\n" + s.take(800))
    }
  }

  test("URL gates are map-only: host/domain/keyword/badwords all " +
      "evaluate without a shuffle") {
    Seq("llm_url_filter", "llm_badwords", "llm_meta_robots").foreach { q =>
      val plan = planOf(q)
      // these run before a byte of content is parsed at 100 TB — any
      // exchange here would shuffle the whole crawl for a row filter
      assert(!plan.contains("Exchange"), s"$q:\n" + plan.take(2000))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"$q:\n" + plan.take(2000))
    }
  }

  test("mainContentBlocks explodes blocks to rows: per-block regexps " +
      "ride a Generate+Project, never an array-lambda over raw HTML") {
    val df = SparkEntry.queries("llm_main_content")(spark, dir)
    df.collect() // settle AQE to the final plan
    val plan = df.queryExecution.executedPlan.toString
    // the block stage is a posexplode Generate; the ONLY lambda in the
    // plan is the tiny sorted-reassembly transform over already-
    // classified blocks (the interpreted-HOF-over-raw-HTML shape this
    // operator exists to avoid would show block regexps inside a
    // lambda instead)
    assert(plan.contains("Generate posexplode"), plan.take(2000))
    val lambdaIdx = plan.indexOf("lambdafunction")
    if (lambdaIdx >= 0) {
      val window = plan.substring(lambdaIdx,
        math.min(plan.length, lambdaIdx + 400))
      assert(!window.contains("regexp_replace"),
        "block regexps leaked into an interpreted lambda:\n" + window)
    }
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("tokens() compiles to the UnicodeTokens scanner, not a regexp " +
      "alternation, in the classifier scoring plan") {
    val df = SparkEntry.queries("llm_classifier_score")(spark, dir)
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("unicodetokens"), plan.take(2000))
    assert(!plan.contains("regexp_extract_all"), plan.take(2000))
  }
}
