package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` embedding columns.
  *
  * Everything here is pure `Column` expressions (higher-order functions),
  * so it stays inside whole-stage codegen — no UDF serialization, no
  * JVM<->interpreter hops. Summation is left-to-right (index order), which
  * keeps results deterministic across partitionings/engines.
  */
object VectorFunctions {

  /** Elementwise dot product in double precision, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe for zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(null)).otherwise(d / (na * nb))
  }

  /** Squared L2 distance, sequential fold in double. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, x) => acc + x)

}
