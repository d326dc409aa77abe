package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is too hot for AQE's
  * runtime splitting (or when AQE is off): classic salting. The big side
  * gets a uniform salt in [0, n); the small side is replicated n times;
  * the join key becomes (key, salt), spreading each hot key over n
  * reducers. Row-multiplication is on the SMALL side only (n x |dim|).
  *
  * RECOMMENDATION (settled by quiet-box best-of-5 measurement, two
  * passes — BASELINE.md §Round-4): for a KNOWN-skewed key, salt.
  * On the bench's single-ultra-hot-key join (~90% of rows on one key)
  * salted-32 runs ~1.6x faster than either AQE skew-split or no
  * mitigation, reproducibly; AQE's split helps the stragglers but
  * still sorts the undivided hot run on the map side and ties with no
  * mitigation at this shape. Keep AQE skewJoin ON as the safety net
  * for skew DISCOVERED at runtime — it degrades a failure into a slow
  * join — and reach for [[saltedEquiJoin]] when the hot keys are a
  * known property of the data (the reference's events/routing shape).
  */
object SkewTools {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: Column,
                     smallKey: Column, saltBuckets: Int,
                     joinType: String = "inner"): DataFrame = {
    require(saltBuckets >= 1)
    val salted = big.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()),
      lit(saltBuckets.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(replicated,
        bigKey === smallKey && salted("__salt") === replicated("__salt"), joinType)
      .drop("__salt")
  }
}
