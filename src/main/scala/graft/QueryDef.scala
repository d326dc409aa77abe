package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable capability: a Spark implementation plus (when
  * SQL-expressible) an equivalent DuckDB oracle query over the same
  * parquet tables. Column names/aliases MUST match between the two — the
  * driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Decimal-exact sum of a 2-dp double column, returned as double:
    * deterministic across engines and row orders (double summation is
    * order-dependent; decimal is not). SQL twin:
    * CAST(SUM(CAST(c AS DECIMAL(18,2))) AS DOUBLE). */
  def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.sum(c.cast("decimal(18,2)")).cast("double")

  val DSum: String => String = c => s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
}
