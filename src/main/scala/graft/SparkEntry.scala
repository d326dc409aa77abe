package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented capability from SURVEY §2 is a named entry in
  * `queries`; SQL-expressible ones carry a DuckDB oracle in `oracleSql`.
  */
object SparkEntry {

  val all: Seq[QueryDef] =
    QueriesRelational.defs ++ QueriesOps.defs ++ QueriesLlm.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the five-way star join (q05 shape). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    all.find(_.name == "q05_local_supplier_volume").get.fn(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx/LSH/jump-hash), which get the weaker rows-only check. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
