package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Routing and fan-in/out primitives — Spark analogs of the reference's
  * core.mux, core.router and core.replicator actors.
  *
  * Scale notes: mux is a metadata-only union (no shuffle). Router branches
  * are mutually exclusive filters over ONE cached/shared scan — Catalyst
  * pushes each predicate into the source, so k branches do not read the
  * data k times when used with `foreachBatch`/persisted input. Replicator
  * `each`/`ncopy` use explode (row-count multiplying but shuffle-free);
  * `fanout` avoids monotonically_increasing_id's single-partition ordering
  * pitfall by round-robining WITHIN each partition, which is exactly the
  * reference's per-thread rotation semantics (replicator.go:72-83 rotates
  * per message per worker, with no global order guarantee — SURVEY §2.6.4).
  */
object Routing {

  /** core.mux (mux.go:18-58): many-to-one fan-in, arrival order
    * unspecified. */
  def mux(inputs: Seq[DataFrame]): DataFrame =
    inputs.reduce(_ unionByName _)

  /** core.router (router.go:67-76): annotate each row with its route; rows
    * whose key misses `routes` get status UNROUTABLE (dead-letter branch).
    * The route key defaults to meta['sendto'].
    */
  def annotateRoutes(df: DataFrame, routes: Seq[String], routeKey: Column): DataFrame =
    df.withColumn("route", when(routeKey.isin(routes: _*), routeKey).otherwise(lit(null)))
      .withColumn("status",
        when(col("route").isNull, FlowEventModel.StatusUnroutable)
          .otherwise(FlowEventModel.StatusDone))

  /** Materialized per-route branches (disjoint + complete: the last entry
    * "__unroutable__" catches everything else). */
  def branches(df: DataFrame, routes: Seq[String], routeKey: Column): Map[String, DataFrame] = {
    val annotated = annotateRoutes(df, routes, routeKey)
    routes.map(r => r -> annotated.filter(col("route") === r)).toMap +
      ("__unroutable__" -> annotated.filter(col("route").isNull))
  }

  /** Replicator mode `each` (replicator.go:93-95): every row copied to all
    * k peers; adds `copy_id` in [0,k). */
  def replicateEach(df: DataFrame, k: Int): DataFrame =
    df.withColumn("copy_id", explode(sequence(lit(0), lit(k - 1))))

  /** Replicator mode `fanout` (replicator.go:72-83): round-robin each row
    * to exactly one of k peers. Rotation is per-partition (matches the
    * reference's per-worker rotating bitmask; no global order exists). */
  def replicateFanout(df: DataFrame, k: Int): DataFrame =
    // monotonically_increasing_id = (partitionId << 33) | rowIndexInPartition,
    // so masking the low 33 bits gives the per-partition row counter with no
    // shuffle and no window — a narrow, codegen'd rotation.
    df.withColumn("copy_id",
      pmod(monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)), lit(k.toLong))
        .cast("int"))

  /** Replicator mode `rand` (replicator.go:85-87): uniform random peer.
    * Seeded for reproducibility within a run; still nondeterministic across
    * input orderings, matching the reference's semantics. */
  def replicateRand(df: DataFrame, k: Int, seed: Long = 42L): DataFrame =
    df.withColumn("copy_id", floor(rand(seed) * k).cast("int"))

  /** Replicator mode `ncopy` (replicator.go:89-91 left it as panic; intent
    * documented at README.md:215-218): place n replicas on `numBuckets`
    * peers by jump consistent hash of a key column. */
  def replicateNcopy(df: DataFrame, keyCol: Column, n: Int, numBuckets: Int): DataFrame =
    df.withColumn("copy_id",
      explode(HashFunctions.replicaBucketsCol(keyCol.cast("long"), n, numBuckets)))
}
