package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * parquet file/row-group pruning on MORE THAN ONE predicate column.
  *
  * A single-column sort gives perfect min/max pruning on that column
  * and none on any other; interleaving the bits of two-to-four columns
  * gives useful pruning on EVERY participating column at once — the
  * layout choice that decides how many of a 100 TB table's files a
  * selective scan has to open. (Same idea as Delta/Iceberg OPTIMIZE
  * ZORDER; here it is a plain DataFrame transform + range-partitioned
  * write, nothing engine-specific.)
  *
  * The z-value is built entirely from codegen'd builtin expressions
  * (shift/and/or folds — no UDF): each column is linearly scaled to a
  * 16-bit rank between its observed min and max, and ranks are
  * bit-interleaved. Linear scaling keeps the math exact and cheap;
  * heavily skewed columns would prefer equi-depth (quantile) ranks —
  * at which point the rank expression changes and everything downstream
  * stays the same.
  *
  * Scale shape: one tiny min/max agg over the input (broadcast into
  * literals), then `repartitionByRange` on the z-value (sampled range
  * exchange — the only shuffle) and a within-partition sort, so every
  * output file owns a compact z-range = a small hyper-rectangle of the
  * key space. No driver-side data movement at any size.
  */
object ZOrder {

  /** n-way bit interleave: bit `i` of the `j`-th column lands at
    * position `i*k + j` (column 0 owns the least-significant lane).
    * Pure builtin shift/and/or fold — stays inside whole-stage codegen;
    * 16 bits x up to 4 columns fits a 64-bit morton key. */
  def interleaveBits(cols: Seq[Column]): Column = {
    val k = cols.size
    cols.zipWithIndex.map { case (c, j) =>
      (0 until 16).map(i =>
        shiftleft(c.bitwiseAND(lit(1L << i)), i * (k - 1) + j))
        .reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Rank `c` linearly into 0..65535 given its [lo, hi] range. */
  private def rank16(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, Double.MinPositiveValue)
    least(lit(65535L), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(span) * 65536.0).cast("long")))
  }

  /** The morton key column for 2..4 numeric columns. `ranges` are the
    * per-column [min, max] pairs, normally from [[columnRanges]]. */
  def zValue(cols: Seq[Column], ranges: Seq[(Double, Double)]): Column = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-order wants 2..4 columns, got ${cols.size}")
    require(cols.size == ranges.size, "one (min,max) range per column")
    interleaveBits(cols.zip(ranges).map { case (c, (lo, hi)) => rank16(c, lo, hi) })
  }

  /** Observed [min, max] per column — ONE small aggregate job; at
    * warehouse scale these come from table-level stats instead. */
  def columnRanges(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map(i => (row.getDouble(2 * i), row.getDouble(2 * i + 1)))
  }

  /** Write `df` clustered by the z-order of `zCols` into `numFiles`
    * range-partitioned, internally sorted parquet files at `path`. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    numFiles: Int): Unit = {
    val ranges = columnRanges(df, zCols)
    df.withColumn("__z", zValue(zCols.map(col), ranges))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
