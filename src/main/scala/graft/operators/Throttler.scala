package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throttling — Spark analog of core.throttler (throttler.go:31-148), a
  * GCRA rate limiter with optional per-key buckets that completes
  * over-limit messages as Throttled instead of queueing them.
  *
  * Batch form: admission quota per (key, time-bucket). Rows are ranked
  * inside each bucket by a deterministic order and rows ranked past the
  * quota get status THROTTLED. This is the relational rendering of "at
  * most `rps x window` admitted per key per window".
  *
  * Scale: one shuffle on (key, bucket) — the same partitioning the
  * downstream keyed aggregation would need anyway. Skewed keys are handled
  * by AQE skew-join/partition splitting since the rank window is per
  * composite key.
  *
  * Streaming form (exact GCRA, 1:1 with the reference's TAT algorithm,
  * throttler.go:126-148) lives in graft.streaming.GcraThrottler.
  */
object Throttler {

  def throttleByWindow(df: DataFrame,
                       key: Column,
                       ts: Column,
                       windowDuration: String,
                       quota: Int,
                       orderBy: Seq[Column]): DataFrame = {
    val bucket = window(ts, windowDuration).getField("start")
    val w = Window.partitionBy(key, bucket).orderBy(orderBy: _*)
    df.withColumn("throttle_rank", row_number().over(w))
      .withColumn("status",
        when(col("throttle_rank") <= quota, FlowEventModel.StatusDone)
          .otherwise(FlowEventModel.StatusThrottled))
      .drop("throttle_rank")
  }
}
