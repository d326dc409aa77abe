package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RewriteWindowTopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = {
    val rng = new scala.util.Random(5)
    (1 to 3000).map(i => (i.toLong, s"g${i % 11}", rng.nextInt(1000)))
      .toDF("id", "grp", "score")
  }

  private def installed[T](f: => T): T = { GraftExtensions.install(spark); f }

  test("row_number <= k window filter is rewritten to the TopK operator") {
    installed {
      val q = df.withColumn("rn",
          row_number().over(Window.partitionBy($"grp").orderBy($"score".desc, $"id")))
        .filter($"rn" <= 2)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("FinalTopK") && plan.contains("PartialTopK"), plan)
      // and the results are the window results
      val want = df.select($"id", $"grp", $"score")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"grp").orderBy($"score".desc, $"id")))
        .collect() // window computed without the rewrite path below
      val got = q.select($"id", $"grp", $"score", $"rn")
        .as[(Long, String, Int, Int)].collect().toSet
      val expect = want.map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
        .filter(_._4 <= 2).toSet
      assert(got == expect)
      assert(got.size == 11 * 2)
    }
  }

  test("SQL row_number queries also get the rewrite") {
    installed {
      df.createOrReplaceTempView("rw_t")
      val q = spark.sql(
        """SELECT id, grp, score, rn FROM (
           SELECT *, row_number() OVER (PARTITION BY grp ORDER BY score, id) AS rn
           FROM rw_t) x WHERE rn <= 1""")
      assert(q.queryExecution.executedPlan.toString.contains("FinalTopK"))
      assert(q.count() == 11)
    }
  }

  test("residual conjuncts survive as a filter above the rewrite") {
    installed {
      val q = df.withColumn("rn",
          row_number().over(Window.partitionBy($"grp").orderBy($"score".desc, $"id")))
        .filter($"rn" <= 3 && $"score" > 100)
      assert(q.queryExecution.executedPlan.toString.contains("FinalTopK"))
      val manual = df.withColumn("rn",
          row_number().over(Window.partitionBy($"grp").orderBy($"score".desc, $"id")))
        .collect().filter(r => r.getInt(3) <= 3 && r.getInt(2) > 100).length
      assert(q.count() == manual)
    }
  }

  test("non-top-k window filters are NOT rewritten") {
    installed {
      val lower = df.withColumn("rn",
          row_number().over(Window.partitionBy($"grp").orderBy($"score", $"id")))
        .filter($"rn" > 2) // lower bound: not a top-k
      assert(!lower.queryExecution.executedPlan.toString.contains("FinalTopK"))
      val rankFn = df.withColumn("r",
          rank().over(Window.partitionBy($"grp").orderBy($"score")))
        .filter($"r" <= 2) // rank(), not row_number(): ties differ
      assert(!rankFn.queryExecution.executedPlan.toString.contains("FinalTopK"))
    }
  }
}
