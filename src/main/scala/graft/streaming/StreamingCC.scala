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

  /** Wire a streaming pair frame into the stateful merge. Caller sets
    * checkpointLocation and starts:
    * {{{ StreamingCC.sink(pairs, "id_a", "id_b", dir).option(...).start() }}} */
  def sink(pairs: DataFrame, uCol: String, vCol: String,
           stateDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    pairs.writeStream.foreachBatch { (df: DataFrame, batchId: Long) =>
      mergeBatch(df, uCol, vCol, stateDir, batchId)
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
