package graft

import java.nio.file.{Files, Paths}

/** Dev utility: [[Verify]] for a subset of queries — dumps each named
  * query's result parquet plus the matching `oracle_sql.json` subset so
  * `tools/check.py` can gate a single operator without re-running all
  * of `SparkEntry.queries`.
  * {{{ runMain graft.VerifySubset <sfDir> <outDir> <name>[,<name>...] }}} */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: VerifySubset <sfDir> <outDir> <name>[,<name>...]")
    val Array(sfDir, outDir, nameCsv) = args
    val names = nameCsv.split(',').toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.view.filterKeys(names.contains)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
