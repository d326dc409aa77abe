package graft.streaming

import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval overlap join over two UNBOUNDED streams — the streaming
  * twin of [[graft.operators.IntervalJoin]], composed entirely from
  * Spark's native stream-stream inner join: both sides carry event-time
  * watermarks on their interval START timestamps, and the join
  * condition pairs the overlap predicate with a time-range bound
  * derived from the caller's maximum interval length, which is what
  * lets the state store evict rows once the other side's watermark has
  * passed them (without the bound, a stream-stream join keeps every row
  * forever — the condition IS the state-retention contract; see the
  * Structured Streaming guide's inner-join-with-watermark semantics).
  *
  * Semantics: closed-interval overlap `[s,e] x [s',e']  iff  s <= e'
  * and s' <= e` — row-identical to the batch operator on the same data
  * (spec-pinned by draining a split stream). If either side can carry
  * an interval LONGER than `maxIntervalLen`, those rows must be routed
  * to a batch reconciliation instead (the same long-outlier split as
  * `overlapsHybrid` — a stream cannot hold unbounded state for an
  * unbounded interval and stay a stream).
  *
  * Scale shape: the join keys on the time-range condition, so state is
  * partitioned by time and bounded by (arrival rate x (maxIntervalLen
  * + watermark delay)); no corpus-sized state, no driver involvement.
  *
  * Reference analog: none (flow has no join surface); this extends the
  * relational layer's interval join to the streaming half of the
  * batch/stream duality contract the window aggregations already keep.
  */
object StreamingIntervalJoin {

  /** @param left / right    streaming frames with TIMESTAMP start/end
    *                        columns (disjoint column names)
    * @param maxIntervalLen  upper bound on BOTH sides' interval
    *                        lengths — drives state eviction; rows with
    *                        longer intervals would silently miss late
    *                        partners, so bound them upstream
    * @param watermarkDelay  how late events may arrive, in event time */
  def overlaps(left: DataFrame, right: DataFrame,
               lStart: String, lEnd: String,
               rStart: String, rEnd: String,
               maxIntervalLen: Duration,
               watermarkDelay: Duration = Duration.ofSeconds(0)): DataFrame = {
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint, both have: $dup")
    val delay = s"${watermarkDelay.getSeconds} seconds"
    // round the bound UP to whole seconds: getSeconds truncates toward
    // zero, and an under-sized bound (e.g. 1500 ms -> 1 s) silently
    // drops overlapping pairs whose start delta falls in the gap
    val maxLen = math.max(1L, (maxIntervalLen.toMillis + 999) / 1000)
    // Spark requires an EQUALITY key on stream-stream joins, so the
    // batch operator's banding reappears here: bucket starts at width
    // maxLen — overlap with lengths <= maxLen implies the two starts
    // lie within maxLen, i.e. their buckets differ by at most 1 — and
    // explode ONE side into {b-1, b, b+1}. The right side keeps a
    // single bucket, so every qualifying pair meets exactly once (no
    // canonical-bucket dedup needed).
    def bkt(c: String) = floor(col(c).cast("long") / lit(maxLen))
    val l = left.withWatermark(lStart, delay)
      .withColumn("__bkt", explode(array(
        bkt(lStart) - 1, bkt(lStart), bkt(lStart) + 1)))
    val r = right.withWatermark(rStart, delay)
      .withColumn("__rbkt", bkt(rStart))
    // the overlap predicate, PLUS the start-vs-start range bound that
    // makes the state watermark-evictable (the condition IS the
    // retention contract)
    l.join(r, col("__bkt") === col("__rbkt") &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col(rStart) >= col(lStart) - expr(s"INTERVAL $maxLen SECONDS") &&
        col(rStart) <= col(lStart) + expr(s"INTERVAL $maxLen SECONDS"))
      .drop("__bkt", "__rbkt")
  }
}
