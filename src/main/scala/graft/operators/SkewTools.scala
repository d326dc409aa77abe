package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is too hot for AQE's
  * runtime splitting (or when AQE is off): classic salting. The big side
  * gets a uniform salt in [0, n); the small side is replicated n times;
  * the join key becomes (key, salt), spreading each hot key over n
  * reducers. Row-multiplication is on the SMALL side only (n x |dim|).
  *
  * AQE's skewJoin handles most cases on sort-merge joins automatically
  * (enabled in GraftSession); this is the explicit tool for keyed
  * aggregation-free paths and for documented-deterministic layouts.
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
