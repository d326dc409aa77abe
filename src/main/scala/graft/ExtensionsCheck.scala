package graft

import org.apache.spark.sql.SparkSession

/** Drives the official spark.sql.extensions wiring in a fresh JVM: the
  * session is built with GraftExtensions configured (not post-hoc
  * installed), then a SQL window-top-k must plan through the custom
  * operator and the registered functions must resolve.
  */
object ExtensionsCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-check")
      .config("spark.sql.extensions", classOf[graft.plans.GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    (1 to 100).map(i => (i, s"g${i % 5}", i * 7 % 97)).toDF("id", "grp", "score")
      .createOrReplaceTempView("ext_t")
    val q = spark.sql(
      """SELECT id, grp, score, rn FROM (
         SELECT *, row_number() OVER (PARTITION BY grp ORDER BY score DESC, id) AS rn
         FROM ext_t) x WHERE rn <= 2""")
    val plan = q.queryExecution.executedPlan.toString
    val rewritten = plan.contains("FinalTopK") && plan.contains("PartialTopK")
    val rows = q.count()
    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c").head().getDouble(0)
    println(s"""{"extensions_rule_applied":$rewritten,"topk_rows":$rows,"cos":$cos}""")
    require(rewritten, "optimizer rule not applied via spark.sql.extensions")
    require(rows == 10, s"expected 10 rows, got $rows")
    require(math.abs(cos - 1.0) < 1e-12, s"injected function wrong: $cos")
    spark.stop()
  }
}
