package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large×large interval overlap join, shuffle-safe: band both sides
  * into fixed-width buckets and EQUI-join on the bucket key, so the
  * plan is an ordinary hash-partitioned join instead of the
  * theta-join's broadcast nested loop (which requires one side to fit
  * in memory — q11's range join shape) or a cartesian product.
  *
  * Mechanics (the standard binned range join, cf. engine-internal range
  * join optimizations):
  *  - every interval explodes into the buckets it covers
  *    (`start div w .. end div w`);
  *  - overlapping pairs meet in every bucket both cover, so each pair
  *    is emitted ONLY from its canonical bucket — the one containing
  *    `greatest(l_start, r_start)` — making the dedup structural (no
  *    distinct shuffle);
  *  - the exact overlap predicate filters false bucket-mates after the
  *    equi-join.
  *
  * Choosing `bucketWidth` ≈ the typical interval length keeps the
  * explode factor ~2 and bucket occupancy balanced; a pathologically
  * long interval explodes into length/width rows (cap long intervals
  * upstream or raise the width). Bounds must be NON-NEGATIVE (epoch
  * timestamps): `div` truncates toward zero, which equals floor there.
  *
  * Column names of the two inputs must be disjoint. Closed-interval
  * semantics: [s, e] overlaps [s', e'] iff s <= e' and s' <= e.
  *
  * Reference analog: none (flow has no join surface); this extends the
  * relational layer's q11 range join to the both-sides-huge case.
  */
object IntervalJoin {

  def overlaps(left: DataFrame, right: DataFrame,
               lStart: String, lEnd: String,
               rStart: String, rEnd: String,
               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint, both have: $dup")
    // exact bucket math: subtracting the remainder first makes the
    // division an exact integer in double space (epoch micros < 2^53)
    def bucketOf(c0: org.apache.spark.sql.Column) = {
      val c = c0.cast("long")
      ((c - pmod(c, lit(bucketWidth))) / lit(bucketWidth)).cast("long")
    }
    def banded(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bkt",
        explode(sequence(bucketOf(col(s)), bucketOf(col(e)))))
    banded(left, lStart, lEnd)
      .join(banded(right, rStart, rEnd), "__bkt")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // canonical-bucket ownership: exactly one emission per pair
      .filter(col("__bkt") === bucketOf(greatest(col(lStart), col(rStart))))
      .drop("__bkt")
  }

  /** [[overlaps]] with hybrid handling of pathologically LONG intervals
    * (the documented failure mode of pure banding: an interval of
    * length L explodes into L/width bucket rows — a corpus-spanning
    * outlier alone can dwarf the whole join's shuffle). Inputs split at
    * `longFactor × bucketWidth`:
    *
    *  - the short mass (explode factor <= longFactor + 1, BOUNDED by
    *    construction) goes through the banded equi-join;
    *  - long outliers — few, by the skewed-length assumption this
    *    operator encodes — BROADCAST into theta joins against the other
    *    side (a long×N nested-loop probe is cheap when long is small,
    *    and it shuffles nothing).
    *
    * The three legs partition the pair space exactly (short×short
    * banded; long-left × all-right; short-left × long-right), so the
    * union needs no dedup. Results are row-identical to [[overlaps]].
    *
    * `bucketWidth = 0` (the default) AUTO-PICKS the width as the
    * approximate median interval length over both sides — one
    * single-pass columnar aggregate — which keeps the typical explode
    * factor ~2 without the caller knowing the length distribution.
    *
    * The skewed-length assumption is CHECKED, not trusted: the long
    * outliers are counted before broadcasting, and past
    * `maxLongBroadcast` rows the outlier legs run as plain
    * (non-broadcast) theta joins instead — Spark plans a shuffled
    * cartesian, slower but bounded-memory and exact, where an ungated
    * broadcast of a long-heavy workload is an executor OOM.
    */
  def overlapsHybrid(left: DataFrame, right: DataFrame,
                     lStart: String, lEnd: String,
                     rStart: String, rEnd: String,
                     bucketWidth: Long = 0L,
                     longFactor: Long = 16,
                     maxLongBroadcast: Long = 4000000L): DataFrame = {
    require(longFactor >= 1, "longFactor must be >= 1")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint, both have: $dup")
    def len(s: String, e: String) = col(e).cast("long") - col(s).cast("long")
    val w =
      if (bucketWidth > 0) bucketWidth
      else {
        val medRow = left.select(len(lStart, lEnd).as("__len"))
          .unionAll(right.select(len(rStart, rEnd).as("__len")))
          .agg(expr("approx_percentile(__len, 0.5, 100)")).head()
        // approx_percentile over ZERO rows is null — default the width
        // so empty inputs return an empty join like plain overlaps
        math.max(1L, if (medRow.isNullAt(0)) 1L else medRow.getLong(0))
      }
    val thr = w * longFactor
    val shortL = left.filter(len(lStart, lEnd) <= thr)
    // pin the outlier legs before counting them: the gate's count and
    // the join see the SAME long rows, and the checkpoint stops the
    // count from re-running the full upstream lineage a second time.
    // NOTE this pins only the LONG legs — shortL/shortR still re-scan
    // the input, so a non-deterministic source (rand-filtered, sampled)
    // can place a row in both or neither leg across the two scans;
    // deterministic inputs are a precondition here, as everywhere a
    // DataFrame is read by more than one job.
    val longL = left.filter(len(lStart, lEnd) > thr).localCheckpoint(true)
    val shortR = right.filter(len(rStart, rEnd) <= thr)
    val longR = right.filter(len(rStart, rEnd) > thr).localCheckpoint(true)
    val overlapPred = col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd)
    // count the outliers before committing them to a broadcast — two
    // counts over the pinned (lineage-truncated) legs, cheap next to
    // the join they protect
    val nLong = longL.count() + longR.count()
    val (legL, legR) =
      if (nLong <= maxLongBroadcast)
        (org.apache.spark.sql.functions.broadcast(longL),
          org.apache.spark.sql.functions.broadcast(longR))
      else (longL, longR) // shuffled theta fallback, see scaladoc
    overlaps(shortL, shortR, lStart, lEnd, rStart, rEnd, w)
      .unionByName(legL.join(right, overlapPred))
      .unionByName(shortL.join(legR, overlapPred))
  }
}
