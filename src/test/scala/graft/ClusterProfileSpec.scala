package graft

import org.scalatest.funsuite.AnyFunSuite

class ClusterProfileSpec extends AnyFunSuite {

  test("100 TB profile: partition sizing is capped by data, not cores") {
    val p = ClusterProfile.HundredTb
    assert(p.totalCores == 4000)
    // 100 TB / 200 MB = 524288, capped at 200k partitions
    assert(p.shufflePartitions == 200000)
    // every shuffle partition stays around the 200 MB design size at
    // full input (before AQE coalescing of smaller intermediate stages)
    val bytesPerPartition = p.inputBytes / p.shufflePartitions
    assert(bytesPerPartition < (600L << 20))
  }

  test("small inputs size by cores, huge inputs by bytes") {
    val small = ClusterProfile.Profile(10, 4, 16, 1L << 30) // 1 GB
    assert(small.shufflePartitions == 80) // 2 waves x 40 cores
    val big = ClusterProfile.Profile(10, 4, 16, 1L << 40) // 1 TB
    assert(big.shufflePartitions == (1L << 40) / (200L << 20)) // by size
  }

  test("profile confs carry the engine's semantic settings") {
    val c = ClusterProfile.HundredTb.confs
    assert(c("spark.sql.adaptive.enabled") == "true")
    assert(c("spark.sql.session.timeZone") == "UTC")
    assert(c("spark.sql.autoBroadcastJoinThreshold") == (64L << 20).toString)
    assert(c("spark.sql.streaming.stateStore.providerClass").contains("RocksDB"))
  }
}
