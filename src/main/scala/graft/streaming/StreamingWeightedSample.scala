package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming weighted sampling without replacement — the reservoir form
  * of [[graft.llm.Sampling.weightedSample]] over an unbounded stream:
  * per stratum, keep the k rows with the largest A-ES rank keys seen so
  * far (Efraimidis–Spirtakis 2006 prove exactly this "k largest
  * u^(1/w)" reservoir is a weighted sample without replacement — their
  * algorithm A-ES IS a streaming algorithm; the batch operator and this
  * one are the same math under different drivers).
  *
  * The rank key is COMPUTED BY THE SAME COLUMN EXPRESSION as the batch
  * sampler ([[graft.llm.Sampling.rankKey]], evaluated on each
  * micro-batch before the stateful stage), so a drained stream's final
  * sample is row-identical to the batch sample over the same data —
  * the duality contract of the windowed aggregations, applied to
  * sampling. Determinism also makes redelivered rows harmless: a
  * retried id carries the same key and dedups inside the reservoir.
  *
  * State per stratum: exactly the current winners — at most k
  * (key, id, weight) triples in a RocksDB-backed ValueState, however
  * many rows flow through. Emission is a per-batch SNAPSHOT of each
  * updated stratum tagged with a generation counter (append-mode
  * friendly); downstream keeps the latest generation per stratum.
  *
  * Scale shape: one shuffle by stratum (the same exchange any per-key
  * sink needs); hot strata are a k-row register updated sequentially —
  * semantically unavoidable for per-stratum sampling, and bounded.
  */
object StreamingWeightedSample {

  /** One reservoir winner: `sample_rank` 1..k within the stratum,
    * `gen` the stratum's update generation (monotonic; consumers keep
    * rows of the max gen per group). */
  case class Kept(group: String, id: Long, weight: Double,
                  sample_rank: Int, gen: Long)

  private[streaming] case class Entry(key: Double, id: Long, weight: Double)
  private[streaming] case class Reservoir(entries: Seq[Entry], gen: Long)

  class SampleProcessor(k: Int)
      extends StatefulProcessor[String, (String, Long, Double, Double), Kept] {
    @transient private var res: ValueState[Reservoir] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      res = getHandle.getValueState[Reservoir]("reservoir",
        Encoders.product[Reservoir], TTLConfig.NONE)

    override def handleInputRows(key: String,
        it: Iterator[(String, Long, Double, Double)],
        tv: TimerValues): Iterator[Kept] = {
      val prior = if (res.exists()) res.get() else Reservoir(Nil, 0L)
      val fresh = it.map { case (_, id, w, wkey) => Entry(wkey, id, w) }
        .filter(e => e.weight > 0 && !e.key.isNaN)
      // merge, order (key desc, id asc) — the batch TopKPerKey order —
      // dedup retried ids (same id => same deterministic key), cap at k
      val merged = (prior.entries ++ fresh)
        .sortBy(e => (-e.key, e.id))
        .distinctBy(_.id)
        .take(k)
      val gen = prior.gen + 1
      res.update(Reservoir(merged, gen))
      merged.iterator.zipWithIndex.map { case (e, i) =>
        Kept(key, e.id, e.weight, i + 1, gen)
      }
    }
  }

  /** @param groupCol stratum column (rendered to string for keying)
    * @param idCol    unique row id — drives the deterministic rank key.
    *                 MUST be an integral column (checked loudly below):
    *                 the reservoir's tie-break is numeric id order, the
    *                 same order the batch sampler applies to integral
    *                 ids — a string id rendered through a silent cast
    *                 would null out and crash the tuple encoder deep in
    *                 the stream instead
    * @param weightCol positive weight; non-positive rows are excluded
    * @param seed     same seed as the batch sampler = same sample */
  def sample(docs: DataFrame, groupCol: String, idCol: String,
             weightCol: String, k: Int, seed: String = ""): Dataset[Kept] = {
    require(k >= 1)
    val idType = docs.schema(idCol).dataType
    // match the TYPE, not typeName strings (e.g. IntegerType.typeName is
    // "integer", never "int" — the old string list carried dead entries);
    // IntegralType itself is private[sql], so enumerate its members
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val integral = idType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    require(integral,
      s"streaming weighted sample requires an integral id column for the " +
        s"batch-identical numeric tie-break; '$idCol' is ${idType.typeName} — " +
        "derive a numeric id (e.g. xxhash64) upstream")
    implicit val inEnc = Encoders.product[(String, Long, Double, Double)]
    implicit val outEnc = Encoders.product[Kept]
    implicit val keyEnc = Encoders.STRING
    // exclusion BEFORE the key (the batch sampler's order too): ANSI
    // mode makes 1/w on a zero weight an error, not an Infinity
    docs.filter(col(weightCol).cast("double") > 0)
      .select(
        col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        col(weightCol).cast("double").as("w"),
        graft.llm.Sampling.rankKey(col(idCol), col(weightCol), seed).as("wkey"))
      .as[(String, Long, Double, Double)]
      .groupByKey(_._1)
      .transformWithState(new SampleProcessor(k), TimeMode.None(),
        OutputMode.Append())
  }
}
