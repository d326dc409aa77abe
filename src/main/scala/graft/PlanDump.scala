package graft

import java.nio.file.{Files, Paths}

/** Dev utility: write each named query's `.explain("formatted")` output
  * to `<outDir>/<name>_<tag>.txt` — the before/after plan evidence the
  * optimization rounds commit under `plans/`.
  * {{{ runMain graft.PlanDump <sfDir> <outDir> <tag> <name>[,<name>...] }}} */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4,
      "usage: PlanDump <sfDir> <outDir> <tag> <name>[,<name>...]")
    val Array(sfDir, outDir, tag, nameCsv) = args
    val names = nameCsv.split(',').toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = GraftSession.get()
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
