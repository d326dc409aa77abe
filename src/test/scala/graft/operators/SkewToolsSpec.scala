package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewToolsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key distribution") {
    // 90% of rows share one hot key
    val big = spark.range(2000).toDF("id")
      .withColumn("k", when($"id" % 10 === 0, $"id" % 5).otherwise(lit(99L)))
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"), (99L, "hot"))
      .toDF("dk", "label")
    val plain = big.join(dim, $"k" === $"dk").select($"id", $"label")
      .as[(Long, String)].collect().toSet
    val salted = SkewTools.saltedEquiJoin(big, dim, col("k"), col("dk"), 8)
      .select($"id", $"label").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.size == 2000)
  }

  test("salted left join keeps unmatched big-side rows exactly once") {
    val big = Seq((1L, 10L), (2L, 20L), (3L, 999L)).toDF("id", "k")
    val dim = Seq((10L, "x"), (20L, "y")).toDF("dk", "v")
    val out = SkewTools.saltedEquiJoin(big, dim, col("k"), col("dk"), 4, "left")
      .select($"id", $"v").as[(Long, Option[String])].collect()
    // left join with replicated dim: unmatched rows must not fan out
    assert(out.count(_._1 == 3L) == 1)
    assert(out.toSet == Set((1L, Some("x")), (2L, Some("y")), (3L, None)))
  }

  test("AQE splits the skewed partition of a shuffled join at runtime") {
    // one hot key carries ~99% of the left side; with thresholds scaled
    // to test size, the final adaptive plan must mark the sort-merge
    // join partition as skew-split (the engine's default skew answer —
    // SkewTools.saltedEquiJoin is the manual fallback for the cases AQE
    // declines)
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20000")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10000")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val hot = (1 to 50000).map(i => (1L, s"payload-$i"))
      val rest = (1 to 500).map(i => (i.toLong + 1, s"p-$i"))
      val left = (hot ++ rest).toDF("k", "v").repartition(8)
      val right = (1 to 600).map(i => (i.toLong, s"dim-$i")).toDF("k", "d")
        .repartition(8)
      val joined = left.join(right, "k")
      // collect() runs through THIS QueryExecution (count()/write would
      // build a new one and leave this plan isFinalPlan=false)
      assert(joined.collect().length == 50000 + 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
