package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for graft's function surface, so `spark.sql` users
  * can call the engine's primitives directly (the reference's plugin
  * mechanism — pkg/util/plugin/plugin.go — maps to function/actor
  * registries; this is the function half).
  *
  * Catalyst expressions register through the session FunctionRegistry
  * (keeping codegen); scalar Scala helpers register as UDFs.
  */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSimFloat(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProductFloat(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dup_ngram_ppm",
      exprs => DupNgramPpm(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "scala_udf")
    reg.createOrReplaceTempFunction("graft_window_hashes",
      exprs => WindowHashes(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int], 7L), "scala_udf")
    reg.createOrReplaceTempFunction("graft_bow_score",
      exprs => HashedBowScore(exprs(0), exprs(1)), "scala_udf")

    spark.udf.register("graft_jump_hash",
      (key: Long, n: Int) => HashFunctions.jumpHash(key, n))
    spark.udf.register("graft_replica_buckets",
      (key: Long, n: Int, buckets: Int) => HashFunctions.replicaBuckets(key, n, buckets))
    spark.udf.register("graft_simhash",
      (tokens: Seq[String]) => {
        val votes = new Array[Int](64)
        tokens.foreach { t =>
          val h = HashFunctions.hashString(t, 11L)
          var b = 0
          while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
        }
        var sig = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
        sig
      })
    spark.udf.register("graft_shingle_hashes",
      (tokens: Seq[String], n: Int) => {
        val th = tokens.map(t => HashFunctions.hashString(t, 7L)).toArray
        val out = scala.collection.mutable.LinkedHashSet.empty[Long]
        if (th.length < n) {
          var h = HashFunctions.mix64(7L + 0x5eedL)
          th.foreach(t => h = HashFunctions.mix64(h ^ t))
          out += h
        } else {
          var i = 0
          while (i + n <= th.length) {
            var h = HashFunctions.mix64(7L + 0x5eedL)
            var j = i
            while (j < i + n) { h = HashFunctions.mix64(h ^ th(j)); j += 1 }
            out += h
            i += 1
          }
        }
        out.toSeq
      })
  }
}
