package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry over the driver's parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All reads go through here so that scans stay pruned: callers `select`
  * immediately and Catalyst pushes projection/predicates into the parquet
  * scan. At cluster scale the same API points at a warehouse path.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark has no native
      // type for: read it as a long and truncate to micros — the same
      // truncation DuckDB applies when casting to its micro timestamps.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view named after itself (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Persist a table bucketed (and sorted) by join keys: co-locates both
    * sides of repeated equi-joins so they plan without a shuffle — the
    * pre-partitioning story for fact-fact joins at warehouse scale.
    * Buckets land in the session warehouse under `tableName`. */
  def writeBucketed(df: org.apache.spark.sql.DataFrame, tableName: String,
                    buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
}
