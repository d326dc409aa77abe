package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed last-writer-wins merge (MERGE INTO / CDC-apply): fold a batch of
  * changes into a base snapshot, keeping per key the row with the highest
  * version — changes win version ties — and dropping keys whose winning
  * row is a tombstone.
  *
  * The scale shape is ONE shuffle on the merge key: base ∪ changes feeds
  * [[graft.plans.TopKPerKey]] with k=1, whose partial phase caps every
  * map partition at one row per key BEFORE the exchange — the shuffle
  * carries ≈ |distinct keys| rows, not |base| + |changes|, which is what
  * makes re-snapshotting a 100-TB table from a small change feed cheap
  * (the change feed dominates the exchange; the base contributes one
  * surviving candidate per touched partition-local key).
  *
  * No native-engine analog in the reference (flow is row-at-a-time
  * pass-through); this is warehouse-side table maintenance for the same
  * feeds its sinks produce.
  */
object Upsert {

  /** @param base       current snapshot
    * @param changes    change batch, same columns as base (plus optionally
    *                   `deleteCol`); may contain several versions per key
    * @param keys       merge key columns
    * @param versionCol monotone version column (higher wins; a change
    *                   beats base at equal version)
    * @param deleteCol  optional boolean tombstone column on `changes`;
    *                   when the winning row has it true, the key is
    *                   dropped from the output
    * @param maxPartialGroups map-side group bound for the TopKPerKey
    *                   partial phase (k=1, so task memory is
    *                   ~maxPartialGroups rows). The shuffle-carries-
    *                   ≈-distinct-keys contract is exact only while a
    *                   partition's distinct touched keys fit this bound
    *                   (SoakUpsert measures both regimes); the default
    *                   covers CDC batches of a few hundred thousand keys
    *                   per partition
    */
  def apply(base: DataFrame, changes: DataFrame, keys: Seq[String],
            versionCol: String, deleteCol: Option[String] = None,
            maxPartialGroups: Int = 1 << 18): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val del = deleteCol.getOrElse("_del")
    // the tombstone column may exist on either side (commonly only on
    // changes); default it false where absent so the union lines up
    def withDel(df: DataFrame): DataFrame =
      if (df.columns.contains(del)) df else df.withColumn(del, lit(false))
    val b = withDel(base).withColumn("_src", lit(0))
    val c = withDel(changes).withColumn("_src", lit(1))
    // TopKPerKey requires a unique order: (version, _src) alone leaves two
    // change rows with equal key+version to a nondeterministic winner, so a
    // stable hash of the full payload is appended as the final tie-break
    // (deterministic across runs and row orders; a change feed with unique
    // (key, version) never reaches it)
    val unioned = b.unionByName(c)
    val payloadHash = xxhash64(unioned.columns.filterNot(_ == "_src").map(col): _*)
    val winners = graft.plans.TopKPerKey(unioned,
      keys = keys.map(col),
      order = Seq(col(versionCol).desc, col("_src").desc, payloadHash.desc),
      k = 1, rankName = "_rn", maxPartialGroups = maxPartialGroups)
    // null tombstone flag means NOT deleted (a bare !col(del) filters the
    // row when del is NULL, silently treating null as a delete)
    winners.filter(!coalesce(col(del), lit(false))).drop("_src", "_rn", del)
  }
}
