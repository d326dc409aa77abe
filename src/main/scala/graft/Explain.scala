package graft

/** Prints formatted physical plans for the named queries (all headline
  * queries by default) — the plan-hygiene review loop: check PushedFilters
  * / ReadSchema pruning, broadcast joins on dimension sides, and
  * WholeStageCodegen coverage.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else Bench.Headline
    val spark = GraftSession.get()
    val queries = SparkEntry.queries
    names.foreach { n =>
      println(s"\n========== $n ==========")
      queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
