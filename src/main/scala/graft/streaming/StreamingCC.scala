package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.llm.ConnectedComponents

/** Incremental connected components over an unbounded stream of pairs —
  * the streaming completion of [[graft.llm.ConnectedComponents]], for
  * ingest-time dedup clustering where each micro-batch of near-dup pairs
  * (e.g. from [[StreamingNearDup]]) must update the global cluster
  * assignment without re-scanning history.
  *
  * Invariant exploited: the (id, cluster_root) mapping IS a star-shaped
  * spanning forest that preserves connectivity of everything seen so
  * far, so `CC(forest ∪ newEdges) = CC(allEdgesEverSeen)`. Each batch
  * therefore runs the large-star/small-star rounds over at most
  * |nodes| + |newBatch| edges — bounded by corpus node count, not by the
  * unbounded edge stream.
  *
  * State lives as versioned parquet under `stateDir/v=<batchId>` —
  * cluster-shareable, partitioned, never driver-materialized. Versions
  * are named by micro-batch id, which makes replay after a restart
  * idempotent: a batch that already produced its version is skipped
  * (the exactly-once contract of foreachBatch sinks). Older versions
  * are pruned, keeping `keepVersions`.
  */
object StreamingCC {

  private val MappingSchema = StructType(Seq(
    StructField("id", LongType), StructField("cluster_root", LongType)))

  /** Latest committed (id, cluster_root) mapping, or an empty frame
    * before the first batch. `beforeBatch` bounds the version read —
    * used during replay so a batch never sees its own failed attempt. */
  def currentMapping(spark: SparkSession, stateDir: String,
                     beforeBatch: Long = Long.MaxValue): DataFrame =
    latestVersion(spark, stateDir, beforeBatch) match {
      case Some(v) => spark.read.parquet(s"$stateDir/v=$v")
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          MappingSchema)
    }

  /** Merge one batch of pairs into the persisted forest. Idempotent per
    * batchId; safe to call from foreachBatch or a batch backfill. */
  def mergeBatch(batch: DataFrame, uCol: String, vCol: String,
                 stateDir: String, batchId: Long,
                 keepVersions: Int = 3): Unit = {
    val spark = batch.sparkSession
    if (latestVersion(spark, stateDir, Long.MaxValue).exists(_ >= batchId)) return
    // rebuild the micro-batch as a clean LogicalRDD before the union:
    // localCheckpoint keeps origin constraints whose attribute ids are
    // foreign to the union, and Catalyst's constraint rewrite then fails
    // with "key not found" — a fresh createDataFrame carries none
    val newEdges = batch
      .select(col(uCol).cast("long").as("u"), col(vCol).cast("long").as("v"))
    val edges = latestVersion(spark, stateDir, batchId) match {
      case Some(v) => newEdges.union(
        spark.read.parquet(s"$stateDir/v=$v")
          .select(col("id").as("u"), col("cluster_root").as("v")))
      case None => newEdges
    }
    // rebuild as a clean LogicalRDD before the CC rounds: checkpointing
    // this mixed union (micro-batch source ∪ parquet state) keeps origin
    // constraints whose attribute ids are foreign to the re-analyzed
    // plan, and the rounds' own unions then fail constraint rewriting
    // with "key not found: u#N" — a fresh createDataFrame carries none
    val clean = spark.createDataFrame(edges.rdd, edges.schema)
    val mapping = ConnectedComponents.run(clean, "u", "v")
    mapping.write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
    prune(spark, stateDir, keepVersions)
  }

  /** Delta-localized merge: instead of re-running the CC rounds over
    * (forest ∪ batch), contract each batch edge to its component ROOT
    * (coalesce(mapping[x], x) — a star forest resolves roots in one
    * lookup), run the rounds on that tiny root graph only, and rewrite
    * the forest with two joins:
    *   - prior rows whose root merged get the new (smaller) root,
    *   - merged old roots / new nodes are appended from the tiny
    *     mapping itself.
    * Min-root semantics compose: roots are component minima, so the
    * min-CC of the root graph IS the global minimum of each merged
    * component. Per-batch iterative work is O(log^2 |touched roots|)
    * rounds over |batch| edges — independent of corpus size; the forest
    * is touched only by single-pass joins. A batch with no new
    * connectivity skips the state write entirely.
    */
  def mergeBatchDelta(batch: DataFrame, uCol: String, vCol: String,
                      stateDir: String, batchId: Long,
                      keepVersions: Int = 3): Unit = {
    val spark = batch.sparkSession
    if (latestVersion(spark, stateDir, Long.MaxValue).exists(_ >= batchId)) return
    latestVersion(spark, stateDir, batchId) match {
      case None => mergeBatch(batch, uCol, vCol, stateDir, batchId, keepVersions)
      case Some(v) =>
        val mapping = spark.read.parquet(s"$stateDir/v=$v")
        val newEdges = batch
          .select(col(uCol).cast("long").as("u"), col(vCol).cast("long").as("v"))
        val rootEdges0 = newEdges
          .join(mapping.select(col("id").as("u"), col("cluster_root").as("ru")),
            Seq("u"), "left")
          .join(mapping.select(col("id").as("v"), col("cluster_root").as("rv")),
            Seq("v"), "left")
          .select(coalesce(col("ru"), col("u")).as("ru"),
            coalesce(col("rv"), col("v")).as("rv"))
          .filter(col("ru") =!= col("rv"))
        // clean rebuild before the CC rounds (mixed batch/parquet lineage
        // breaks constraint rewriting under checkpoint — see mergeBatch)
        val rootEdges = spark.createDataFrame(rootEdges0.rdd, rootEdges0.schema)
        if (!rootEdges.isEmpty) {
          val remap = ConnectedComponents.run(rootEdges, "ru", "rv")
            .select(col("id").as("old_root"), col("cluster_root").as("new_root"))
          val rewritten = mapping.join(remap,
              mapping("cluster_root") === remap("old_root"), "left")
            .select(mapping("id"),
              coalesce(col("new_root"), mapping("cluster_root")).as("cluster_root"))
          // merged old roots (and first-seen nodes) become non-root rows;
          // prior roots never appear as `id` in the forest, so no dups
          val demoted = remap
            .select(col("old_root").as("id"), col("new_root").as("cluster_root"))
          rewritten.union(demoted).write.mode("overwrite")
            .parquet(s"$stateDir/v=$batchId")
          prune(spark, stateDir, keepVersions)
        }
    }
  }

  /** Wire a streaming pair frame into the stateful merge. Caller sets
    * checkpointLocation and starts:
    * {{{ StreamingCC.sink(pairs, "id_a", "id_b", dir).option(...).start() }}}
    * `delta = true` (default) uses the root-contracted
    * [[mergeBatchDelta]]; both paths produce identical state. */
  def sink(pairs: DataFrame, uCol: String, vCol: String,
           stateDir: String,
           delta: Boolean = true): DataStreamWriter[org.apache.spark.sql.Row] =
    pairs.writeStream.foreachBatch { (df: DataFrame, batchId: Long) =>
      if (delta) mergeBatchDelta(df, uCol, vCol, stateDir, batchId)
      else mergeBatch(df, uCol, vCol, stateDir, batchId)
    }

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versions(spark: SparkSession, stateDir: String): Seq[Long] = {
    val f = fs(spark, stateDir)
    val root = new Path(stateDir)
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.stripPrefix("v=").toLong }
      // only versions with a _SUCCESS marker are committed
      .filter(v => f.exists(new Path(s"$stateDir/v=$v/_SUCCESS")))
  }

  private def latestVersion(spark: SparkSession, stateDir: String,
                            before: Long): Option[Long] = {
    val vs = versions(spark, stateDir).filter(_ < before)
    if (vs.isEmpty) None else Some(vs.max)
  }

  private def prune(spark: SparkSession, stateDir: String, keep: Int): Unit = {
    val vs = versions(spark, stateDir).sorted.reverse.drop(keep)
    val f = fs(spark, stateDir)
    vs.foreach(v => f.delete(new Path(s"$stateDir/v=$v"), true))
  }
}
