package graft

import org.apache.spark.sql.SparkSession

/** Cluster sizing profile: turns a target deployment (executor count,
  * cores, memory, input size) into the Spark confs the engine's operators
  * were designed around. The local[32] test harness exercises the same
  * settings at miniature scale; this object is where the 100-TB numbers
  * live so the scale-out story is executable configuration, not prose.
  *
  * Sizing rules (standard Spark practice, tuned to this engine):
  *  - shuffle partitions ≈ 2-3 tasks per core per wave, and no partition
  *    above ~200 MB of shuffle data: max(cores * 2, inputBytes / 200MB),
  *    with AQE coalescing shrinking small stages back down at runtime.
  *  - maxPartitionBytes 256 MB: big scan splits amortize task overhead at
  *    petabyte inputs; AQE re-splits skewed ones.
  *  - broadcast threshold 64 MB (same as local): every dimension table of
  *    the reference workload fits; runtime bloom-filter join pruning for
  *    the fact-to-fact joins that don't.
  *  - RocksDB state store: streaming state (GCRA TAT registers, LSH
  *    buckets, dedup hashes) lives off-heap and spills, so ingest-time
  *    dedup state is bounded by disk, not executor heap.
  */
object ClusterProfile {

  final case class Profile(executors: Int, coresPerExecutor: Int,
                           executorMemGb: Int, inputBytes: Long) {
    def totalCores: Int = executors * coresPerExecutor

    def shufflePartitions: Int = {
      val byCores = totalCores * 2
      val bySize = math.min(inputBytes / (200L << 20), 200000L).toInt
      math.max(math.max(byCores, bySize), 1)
    }

    def confs: Map[String, String] = Map(
      "spark.executor.instances" -> executors.toString,
      "spark.executor.cores" -> coresPerExecutor.toString,
      "spark.executor.memory" -> s"${executorMemGb}g",
      "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
      "spark.sql.files.maxPartitionBytes" -> (256L << 20).toString,
      "spark.sql.autoBroadcastJoinThreshold" -> (64L << 20).toString,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> (128L << 20).toString,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.session.timeZone" -> "UTC")
  }

  /** The design point from BASELINE.json: ~100 TB input on a
    * 1000-executor cluster. 2000-ish shuffle partitions by cores would
    * leave 50 GB per partition — the size rule takes over and caps
    * partitions at ~200 MB of shuffle each. */
  val HundredTb: Profile =
    Profile(executors = 1000, coresPerExecutor = 4,
      executorMemGb = 32, inputBytes = 100L << 40)

  /** Apply a profile to a builder (cluster-manager confs like
    * executor.instances are inert in local mode; the SQL confs are not). */
  def apply(b: SparkSession.Builder, p: Profile): SparkSession.Builder =
    p.confs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
