package graft.llm

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Batch-increment log: the EXACTLY-ONCE upgrade for streaming index
  * ingest, layered on [[GenDir]].
  *
  * Structured Streaming's `foreachBatch` is at-least-once: a batch
  * whose side effect completed but whose checkpoint commit did not is
  * REDELIVERED after restart, and a plain additive append would apply
  * its counts twice. The ingest docstrings ([[graft.streaming
  * .StreamingLmIngest]], [[graft.streaming.StreamingBm25Ingest]])
  * named the upgrade path — batchId-keyed staging plus an atomic
  * commit — and this object implements it:
  *
  *  - a batch's count deltas land under `slice.inc/batch-<id>/`
  *    (full-directory overwrite, so REDELIVERY IS IDEMPOTENT — the
  *    second write produces byte-equivalent content);
  *  - the batch becomes visible only when its marker file
  *    `model/_commits/batch-<id>` lands (written to a temp name and
  *    renamed — single-file rename is the atomic commit); the marker
  *    body carries the batch's meta deltas (total tokens, doc count)
  *    so model totals never need a read-modify-write;
  *  - readers fold `live generation ∪ committed increments above the
  *    generation's fold watermark` — a half-written increment is
  *    invisible, a committed one is complete;
  *  - compaction folds committed increments into the next [[GenDir]]
  *    generation of each slice, recording the fold watermark as a
  *    `_FOLDED_THROUGH` file INSIDE the new generation (readers of
  *    that generation skip the folded increments; readers still
  *    scanning the previous generation keep using them — increments
  *    are garbage-collected one compaction LATER, the same
  *    two-generation retention window GenDir gives generations);
  *  - the `_commits/_folded` summary file (watermark + cumulative
  *    folded deltas, written via temp-and-rename) lets marker files be
  *    GC'd as well: "applied" = id ≤ summary watermark OR marker
  *    present, so a redelivered long-ago batch is still skipped after
  *    its marker is gone.
  *
  * Batch ids are Structured Streaming's monotonically increasing
  * `batchId`; the single-writer contract of the ingest loop (appends
  * and compactions from one thread) is unchanged — this log makes the
  * loop's side effects idempotent under redelivery and its increments
  * readable mid-stream, it does not add a second writer.
  *
  * ONE INDEX ↔ ONE CHECKPOINTED STREAM: batch ids are only unique
  * within a checkpoint lineage. Restarting ingest with a FRESH
  * checkpoint against an existing index restarts batchId at 0, and
  * ids at or below the old markers/watermark would be skipped as
  * redeliveries — silently dropping new data. Point a new stream at a
  * new index directory (or keep the checkpoint); binding markers to a
  * (streamId, batchId) pair — the Delta `txnAppId` discipline — is
  * the upgrade if multi-stream ingest into one index is ever needed.
  *
  * FILESYSTEM REQUIREMENT: the marker commit is temp-write +
  * single-file rename, and the summary fold is the same — atomic on
  * HDFS and local filesystems (the targets this protocol is specified
  * against), NOT a guaranteed contract on object-store connectors
  * (s3a rename is copy+delete). Serving a standing index off an
  * object store needs a connector-aware committer for these markers;
  * until then treat HDFS semantics as a prerequisite, like Delta's
  * LogStore does.
  *
  * Crash windows (all heal without double counting): dying before the
  * marker leaves an invisible increment that redelivery overwrites;
  * dying after some slice folds but before the summary leaves those
  * generations' watermarks ahead of the summary — counts stay exact
  * because each generation skips exactly the increments it folded, and
  * totals stay exact because un-summarized markers still carry their
  * deltas; dying after the summary but before GC leaves folded
  * increments that the watermark already hides.
  */
private[graft] object IncLog {

  private val FoldedFile = "_folded"
  private val SliceFoldMarker = "_FOLDED_THROUGH"
  private val BatchPrefix = "batch-"

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Increment directory of `batchId` for one slice artifact. */
  def incPath(sliceBase: String, batchId: Long): String =
    s"$sliceBase.inc/$BatchPrefix$batchId"

  private def commitsPath(modelDir: String) = s"$modelDir/_commits"

  /** True when the batch's effects are already durable: folded into the
    * summary watermark, or committed by a live marker. The ingest loop
    * checks this FIRST and skips redelivered batches. */
  def isApplied(spark: SparkSession, modelDir: String,
                batchId: Long): Boolean = {
    val (fs, c) = fsOf(spark, commitsPath(modelDir))
    batchId <= foldedSummary(spark, modelDir)._1 ||
      fs.exists(new Path(c, s"$BatchPrefix$batchId"))
  }

  /** Atomically commit a batch: write `batch-<id>` (body = "tDelta
    * nDelta") via a temp name + rename. After this returns, readers
    * fold the batch's increments and totals include its deltas. */
  def commitBatch(spark: SparkSession, modelDir: String, batchId: Long,
                  tDelta: Long, nDelta: Long): Unit = {
    val (fs, c) = fsOf(spark, commitsPath(modelDir))
    fs.mkdirs(c)
    val tmp = new Path(c, s".$BatchPrefix$batchId.tmp")
    val out = fs.create(tmp, true)
    out.write(s"$tDelta $nDelta".getBytes("UTF-8"))
    out.close()
    val dst = new Path(c, s"$BatchPrefix$batchId")
    fs.delete(dst, false) // idempotent redelivery of the commit itself
    require(fs.rename(tmp, dst), s"commit rename failed for batch $batchId")
  }

  /** Committed batches with id > `after`, ascending: (id, tDelta,
    * nDelta). Driver-side listing of tiny marker files — bounded by the
    * compaction cadence, not the stream's lifetime. */
  def committedAfter(spark: SparkSession, modelDir: String,
                     after: Long): Seq[(Long, Long, Long)] = {
    val (fs, c) = fsOf(spark, commitsPath(modelDir))
    if (!fs.exists(c)) return Nil
    fs.listStatus(c).toSeq
      .filter(st => st.getPath.getName.startsWith(BatchPrefix))
      .flatMap { st =>
        st.getPath.getName.stripPrefix(BatchPrefix).toLongOption
          .filter(_ > after)
          .map { id =>
            val in = fs.open(st.getPath)
            val body = try scala.io.Source.fromInputStream(in, "UTF-8")
              .mkString finally in.close()
            val Array(t, n) = body.trim.split(" ")
            (id, t.toLong, n.toLong)
          }
      }
      .sortBy(_._1)
  }

  /** (watermark, cumulative tDelta, cumulative nDelta) folded so far —
    * (-1, 0, 0) before the first fold. Model totals = base meta +
    * summary + [[committedAfter]] the watermark. */
  def foldedSummary(spark: SparkSession,
                    modelDir: String): (Long, Long, Long) = {
    val (fs, c) = fsOf(spark, commitsPath(modelDir))
    val f = new Path(c, FoldedFile)
    if (!fs.exists(f)) return (-1L, 0L, 0L)
    val in = fs.open(f)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val Array(w, t, n) = body.trim.split(" ")
    (w.toLong, t.toLong, n.toLong)
  }

  /** True when the log's state is provably an exactly-once BOOTSTRAP's
    * own: exactly one commit marker and nothing folded yet. Recover
    * paths use this to disambiguate torn meta over complete slices —
    * the bootstrap commits its marker BEFORE writing meta, so a crash
    * during that first meta write leaves this exact state, and
    * redelivery can safely rebuild (a full overwrite of one batch). A
    * plain-append meta crash cannot present it: plain lifecycles write
    * no markers at all (Nil here), and a post-bootstrap xo lifecycle
    * has >= 2 markers or an advanced fold watermark. */
  def bootstrapOnly(spark: SparkSession, modelDir: String): Boolean =
    foldedSummary(spark, modelDir)._1 == -1L &&
      committedAfter(spark, modelDir, -1L).size == 1

  /** Advance the folded summary (temp-and-rename atomic). */
  def writeFoldedSummary(spark: SparkSession, modelDir: String, w: Long,
                         t: Long, n: Long): Unit = {
    val (fs, c) = fsOf(spark, commitsPath(modelDir))
    fs.mkdirs(c)
    val tmp = new Path(c, s".$FoldedFile.tmp")
    val out = fs.create(tmp, true)
    out.write(s"$w $t $n".getBytes("UTF-8"))
    out.close()
    val dst = new Path(c, FoldedFile)
    fs.delete(dst, false)
    require(fs.rename(tmp, dst), "folded-summary rename failed")
  }

  /** Fold watermark of one slice GENERATION (the `_FOLDED_THROUGH`
    * file inside it): readers of this generation skip increments at or
    * below it. -1 when absent (a generation that folded nothing). */
  def sliceFoldedThrough(spark: SparkSession, genPath: String): Long = {
    val (fs, p) = fsOf(spark, genPath)
    val f = new Path(p, SliceFoldMarker)
    if (!fs.exists(f)) return -1L
    val in = fs.open(f)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    body.trim.toLong
  }

  /** Record the fold watermark inside a new generation directory —
    * call AFTER the generation's parquet lands and BEFORE it commits
    * (the underscore name keeps parquet readers from treating it as
    * data, like `_SUCCESS`). */
  def writeSliceFoldedThrough(spark: SparkSession, genPath: String,
                              w: Long): Unit = {
    val (fs, p) = fsOf(spark, genPath)
    val out = fs.create(new Path(p, SliceFoldMarker), true)
    out.write(w.toString.getBytes("UTF-8"))
    out.close()
  }

  /** Increment directories of committed batches above `after` for one
    * slice — what a reader unions with the slice's live generation. A
    * committed batch with no directory here contributed nothing to this
    * slice (possible only for empty batches; the write precedes the
    * marker). */
  def liveIncPaths(spark: SparkSession, modelDir: String, sliceBase: String,
                   after: Long): Seq[String] = {
    val ids = committedAfter(spark, modelDir, after).map(_._1)
    val (fs, _) = fsOf(spark, sliceBase)
    ids.map(id => incPath(sliceBase, id))
      .filter(p => fs.exists(new Path(p)))
  }

  // ---- per-operation snapshot + the fold machinery shared by every
  // family's read and compact paths ------------------------------------

  /** One listing of the increment log, taken ONCE per operation (one
    * `_commits` listing + one read per marker) and threaded through
    * every slice read and totals computation of that operation — a
    * standing scorer on an object store pays one listing per query
    * batch, not one per slice. `commits` holds every committed batch
    * above the summary watermark, ascending. */
  case class IncView(summary: (Long, Long, Long),
                     commits: Seq[(Long, Long, Long)]) {
    /** Cumulative (first, second) marker deltas: folded summary plus
      * every committed-but-unfolded batch. */
    def deltas: (Long, Long) =
      (summary._2 + commits.map(_._2).sum, summary._3 + commits.map(_._3).sum)
  }

  def view(spark: SparkSession, modelDir: String): IncView = {
    val s = foldedSummary(spark, modelDir)
    IncView(s, committedAfter(spark, modelDir, s._1))
  }

  /** One slice's full row set: the live generation unioned with the
    * view's committed increments above the generation's fold
    * watermark. With `schema` the union survives EMPTY increments (a
    * batch with no rows for this slice — schema inference would fail);
    * without it, increments holding no data files are skipped at the
    * listing. Plain-append indexes have no increments and read exactly
    * as a bare parquet read of the live path. */
  def readSlice(spark: SparkSession, modelDir: String, base: String,
                v: IncView, schema: Option[String] = None): org.apache.spark
      .sql.DataFrame = {
    val live = GenDir.live(spark, base)
    val w = sliceFoldedThrough(spark, live)
    val (fs, _) = fsOf(spark, base)
    def rd(p: String) =
      schema.fold(spark.read)(s => spark.read.schema(s)).parquet(p)
    v.commits.map(_._1).filter(_ > w)
      .map(id => incPath(base, id))
      .filter(p => fs.exists(new Path(p)))
      .filter(p => schema.isDefined || hasDataFiles(spark, p))
      .foldLeft(rd(live))((df, p) => df.unionByName(rd(p)))
  }

  /** True when `path` holds any non-underscore entry — an increment
    * with actual data files (an empty write leaves only `_SUCCESS`). */
  def hasDataFiles(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = fsOf(spark, path)
    fs.exists(p) && fs.listStatus(p).exists(!_.getPath.getName.startsWith("_"))
  }

  /** Fold prologue shared by every compact: (w0 = the summary
    * watermark as it stood, w = the newest committed id this fold
    * absorbs, wGen = the watermark the new generations must carry —
    * monotone across crash-interrupted reruns). */
  def foldBounds(spark: SparkSession, modelDir: String, primaryBase: String,
                 v: IncView): (Long, Long, Long) = {
    val w0 = v.summary._1
    val w = if (v.commits.isEmpty) w0 else v.commits.map(_._1).max
    val wGen = math.max(
      sliceFoldedThrough(spark, GenDir.live(spark, primaryBase)), w)
    (w0, w, wGen)
  }

  /** Fold one slice: hand `write` the slice's live rows unioned with
    * the committed increments in (its generation's watermark, wGen],
    * landing as the next generation stamped with wGen. */
  def foldSliceGen(spark: SparkSession, modelDir: String, base: String,
                   wGen: Long, v: IncView, schema: Option[String] = None)(
      write: (org.apache.spark.sql.DataFrame, String) => Unit): Unit = {
    val (fs, _) = fsOf(spark, base)
    def rd(p: String) =
      schema.fold(spark.read)(s => spark.read.schema(s)).parquet(p)
    GenDir.rewriteGen(spark, base) { (live, next) =>
      val sliceW = sliceFoldedThrough(spark, live)
      val rows = v.commits.map(_._1).filter(id => id > sliceW && id <= wGen)
        .map(id => incPath(base, id))
        .filter(p => fs.exists(new Path(p)))
        .filter(p => schema.isDefined || hasDataFiles(spark, p))
        .foldLeft(rd(live))((df, p) => df.unionByName(rd(p)))
      write(rows, next)
      writeSliceFoldedThrough(spark, next, wGen)
    }
  }

  /** Fold epilogue: advance the summary past `w` with the view's
    * cumulative deltas, then GC increments and markers the PREVIOUS
    * summary already covered (one compaction late — the GenDir
    * retention window applied to increments). */
  def finishFold(spark: SparkSession, modelDir: String,
                 sliceBases: Seq[String], v: IncView, w0: Long,
                 w: Long): Unit = {
    if (w > w0) {
      val (d1, d2) = v.deltas
      writeFoldedSummary(spark, modelDir, w, d1, d2)
    }
    gcThrough(spark, modelDir, sliceBases, w0)
  }

  /** Drop increment directories and marker files with id <= `through`.
    * The compactor calls this with the summary watermark as it stood
    * BEFORE the current fold, so increments a still-scanning reader of
    * the previous generation needs survive one more compaction — the
    * GenDir two-generation retention window, applied to increments. */
  def gcThrough(spark: SparkSession, modelDir: String,
                sliceBases: Seq[String], through: Long): Unit = {
    val (fs, c) = fsOf(spark, commitsPath(modelDir))
    sliceBases.foreach { base =>
      val incRoot = new Path(s"$base.inc")
      if (fs.exists(incRoot))
        fs.listStatus(incRoot).toSeq
          .filter(st => st.getPath.getName.startsWith(BatchPrefix))
          .filter(_.getPath.getName.stripPrefix(BatchPrefix)
            .toLongOption.exists(_ <= through))
          .foreach(st => fs.delete(st.getPath, true))
    }
    if (fs.exists(c))
      fs.listStatus(c).toSeq
        .filter(st => st.getPath.getName.startsWith(BatchPrefix))
        .filter(_.getPath.getName.stripPrefix(BatchPrefix)
          .toLongOption.exists(_ <= through))
        .foreach(st => fs.delete(st.getPath, false))
  }

  /** Start the increment log over (fresh build): delete every slice's
    * `.inc` tree and the `_commits` directory. */
  def reset(spark: SparkSession, modelDir: String,
            sliceBases: Seq[String]): Unit = {
    val (fs, c) = fsOf(spark, commitsPath(modelDir))
    sliceBases.foreach(base => fs.delete(new Path(s"$base.inc"), true))
    fs.delete(c, true)
  }
}
