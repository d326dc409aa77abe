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
}
