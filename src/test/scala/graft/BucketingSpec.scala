package graft

import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val facts = (1L to 5000L).map(i => (i, i % 400, i * 2.0)).toDF("fk", "key", "v1")
    val dims = (0L until 400L).map(i => (i, s"d$i")).toDF("key", "label")

    Tables.writeBucketed(facts, "b_facts", 8, Seq("key"))
    Tables.writeBucketed(dims, "b_dims", 8, Seq("key"))

    // disable broadcast so the join strategy must rely on bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_facts").join(spark.table("b_dims"), "key")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 5000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
