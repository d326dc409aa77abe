package graft

import org.apache.spark.sql.functions._

/** Scale soak for the pre-fetch URL gate (`llm.url_filter`): a
  * UT1-sized registrable-domain blocklist against a crawl-sized URL
  * column, through the YAML actor itself. Two legs: a blocklist under
  * the counted broadcast budget (the production UT1 shape, ~2M
  * domains) and one past it (the shuffle-join fallback must produce
  * the same answer). Hit counts are derived independently from the id
  * arithmetic, so the run self-checks host extraction, registrable-
  * domain derivation and the join, not just throughput. Results
  * recorded in BASELINE.md.
  *
  * {{{ runMain graft.SoakUrlFilter [nDocs] [nBlock] }}}
  */
object SoakUrlFilter {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 5000000L
    val nBlock = if (args.length > 1) args(1).toLong else 2000000L
    val spark = GraftSession.get()
    val dir = java.nio.file.Files
      .createTempDirectory("graft-soak-urlf-").toString

    // urls spread over 3x the blocklist's domain space -> about a
    // third of the docs land on a blocked registrable domain, every
    // one behind a subdomain (the extraction + last-2-labels path
    // must fire)
    val space = nBlock * 3
    val k = pmod(xxhash64(col("id")), lit(space))
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        concat(lit("http://sub"), pmod(col("id"), lit(1000L)),
          lit(".dom"), k, lit(".com/p/"), col("id")).as("url"),
        k.as("k"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$dir/docs")
    val docs = spark.read.parquet(s"$dir/docs")

    def leg(name: String, blockRows: Long): Unit = {
      spark.range(blockRows)
        .select(concat(lit("dom"), col("id"), lit(".com")).as("domain"))
        .write.mode("overwrite").parquet(s"$dir/bl_$name")
      val yaml =
        s"""actors:
          |  src:  {module: core.receiver, params: {path: "$dir/docs"}}
          |  urlf: {module: llm.url_filter, params: {
          |         blocklist_path: "$dir/bl_$name"}}
          |  soak_urlf_out_$name: {module: core.sink, params: {format: noop}}
          |pipeline:
          |  src:  {connect: [urlf]}
          |  urlf: {connect: [soak_urlf_out_$name]}
          |""".stripMargin
      val t0 = System.nanoTime()
      val counts = new graft.pipeline.PipelineCompiler(spark,
        graft.pipeline.PipelineConfig.parse(yaml)).runBatch()
      val sec = (System.nanoTime() - t0) / 1e9
      val kept = counts(s"soak_urlf_out_$name")
      // blocked domains are dom0..dom{blockRows-1}: the independent
      // expectation comes straight from the id arithmetic
      val expKept = docs
        .filter(col("k") >= lit(math.min(blockRows, space))).count()
      require(kept == expKept, s"$name: kept $kept, want $expKept")
      println(f"[soak-urlf] $name: $nDocs%d urls vs $blockRows%d-domain " +
        f"blocklist -> kept $kept%d in $sec%.1f s = " +
        f"${nDocs / sec}%.0f urls/s")
    }

    // under the 4M counted broadcast budget: the UT1 production shape
    leg("bcast", nBlock)
    // past the budget: the shuffle-join fallback, same exactness
    // (blocklist > 4M rows but < the domain space, so the kept set is
    // non-trivial on both sides of the gate)
    leg("shuffle", math.max(4000001L, nBlock * 21 / 10))
    println("[soak-urlf] OK")
    spark.stop()
  }
}
