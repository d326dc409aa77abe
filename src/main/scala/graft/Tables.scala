package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Normalize a timestamp column to session-zoned TimestampType (micros)
    * regardless of which parquet encoding the fixture generation used:
    *  - LongType: the file stored TIMESTAMP(NANOS), which Spark has no
    *    native type for — under `spark.sql.legacy.parquet.nanosAsLong` it
    *    surfaces as a nanosecond long; truncate to micros (the same
    *    truncation DuckDB applies casting to its micro timestamps).
    *  - TimestampNTZType: standard parquet TIMESTAMP(MICROS, adj=false);
    *    reinterpret the wall clock in the session zone (sessions here pin
    *    UTC), matching both the old behavior and the DuckDB oracle.
    *  - TimestampType (or anything else): already what we want.
    * Schema-adaptive so the loader survives fixture regeneration. */
  def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case LongType         => df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      case TimestampNTZType => df.withColumn(c, col(c).cast(TimestampType))
      case _                => df
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // harmless when ts is a real timestamp; required for the NANOS encoding
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeTs(spark.read.parquet(s"$dir/$name.parquet"), "ts")
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
