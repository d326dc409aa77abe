package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row (by event
  * time, inclusive) with the same key — the temporal join relational
  * engines special-case and Spark lacks natively.
  *
  * Implemented by composition (SURVEY §7.3 preference (a)): tag both
  * sides, union, and carry the latest right payload forward with a
  * `last(ignoreNulls)` running window per key. One shuffle on the key —
  * identical to what any dedicated as-of physical operator would need —
  * and rows stay within whole-stage codegen. This beats the naive
  * range-join + per-left argmax rendering (which materializes every
  * (left, earlier-right) pair: quadratic per key).
  *
  * Right rows at the same timestamp as a left row DO match (ASOF <=
  * semantics); among equal-timestamp right rows the highest `rightOrder`
  * wins (pass a unique id for determinism).
  */
object AsofJoin {

  /** @param payload right-side columns to carry onto left rows (renamed
    *                as given). Left rows with no earlier right row get
    *                nulls (left-outer semantics). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               payload: Map[String, String], rightOrder: String): DataFrame = {
    val payloadSrc = payload.keys.toSeq
    val payloadDst = payload.values.toSeq
    val l = left.withColumn("__side", lit(0))
      .withColumn("__ts", col(leftTs))
      .withColumn("__ord", lit(null).cast("long"))
    val lWithNullPayload = payloadDst.foldLeft(l) { (df, c) =>
      df.withColumn(s"__p_$c", lit(null).cast(
        right.schema(payload.find(_._2 == c).get._1).dataType))
    }
    val rCols = right.select(
      (col(key) +: col(rightTs).as("__ts") +: col(rightOrder).cast("long").as("__ord") +:
        payloadSrc.zip(payloadDst).map { case (s, d) => col(s).as(s"__p_$d") }): _*)
    val rTagged = rCols.withColumn("__side", lit(1))
    // align schemas: left keeps all its columns; right rows carry nulls
    // for them and vice versa, via unionByName(allowMissingColumns)
    val unioned = lWithNullPayload.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort BEFORE left rows at the same ts (__side desc) so
    // same-instant rights are visible to lefts (inclusive as-of)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__side").desc, col("__ord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadDst.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 0)
      .drop((Seq("__side", "__ts", "__ord") ++ payloadDst.map(c => s"__p_$c")): _*)
  }
}
