package graft.llm

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory replacement for index compaction — shared by
  * the BM25 postings ([[Retrieval.bm25IndexCompact]]), IVF/IVFADC cell
  * slices ([[Similarity.ivfIndexCompact]]) and the LSH/span dedup
  * slices ([[Dedup.lshIndexCompact]]).
  *
  * The naive delete-then-rename swap has an unrecoverable window: a
  * crash after the delete leaves NO live directory while sibling
  * artifacts (e.g. BM25 `meta`) survive, and any bootstrap that keys
  * "index exists" on those siblings will then append onto a gutted
  * index — counts silently include lost rows forever. This protocol
  * replaces it with three renames whose every crash point is healable:
  *
  *  1. caller writes the rewritten data to `live + ".compact-tmp"`;
  *  2. [[commit]]: rename live aside to `live + ".compact-old"`,
  *     rename tmp into place, delete old;
  *  3. [[recover]] (run before any compact, and by index bootstraps
  *     before trusting directory presence): if live exists, stray
  *     tmp/old are leftovers — delete both (tmp may be half-written,
  *     old is an already-superseded copy); if live is missing, the
  *     crash happened mid-commit, where tmp was complete by
  *     construction — rename tmp in (or old back, if tmp already made
  *     it) and clean up.
  *
  * Renames are atomic on HDFS-like stores; on object stores without
  * atomic rename the same protocol applies over a manifest/pointer
  * file. The quiesce contract stays: the aside-window is not readable,
  * so compact in a maintenance slot, not alongside live queries — the
  * protocol makes crashes recoverable, not reads concurrent.
  */
private[graft] object IndexSwap {

  private def tmpOf(live: Path) = new Path(live.toString + ".compact-tmp")
  private def oldOf(live: Path) = new Path(live.toString + ".compact-old")

  /** Path the caller should write the rewritten data to (also clears
    * any stale leftover first, via [[recover]]). */
  def prepare(fs: FileSystem, live: Path): Path = {
    recover(fs, live)
    tmpOf(live)
  }

  /** Swap a fully-written tmp into place: live → old, tmp → live,
    * delete old. Call only after the tmp write committed. */
  def commit(fs: FileSystem, live: Path): Unit = {
    val tmp = tmpOf(live); val old = oldOf(live)
    require(fs.exists(tmp), s"commit without a written tmp: $tmp")
    if (fs.exists(live))
      require(fs.rename(live, old), s"aside rename failed for $live")
    require(fs.rename(tmp, live), s"swap-in rename failed for $live")
    fs.delete(old, true)
  }

  /** Heal any interrupted swap so `live` reflects a complete copy
    * (fresh or compacted — both are correct answers). Idempotent;
    * no-op when no swap artifacts exist. */
  def recover(fs: FileSystem, live: Path): Unit = {
    val tmp = tmpOf(live); val old = oldOf(live)
    if (fs.exists(live)) {
      // crash before commit (tmp possibly half-written) or after
      // swap-in (old superseded): live is authoritative either way
      fs.delete(tmp, true)
      fs.delete(old, true)
    } else if (fs.exists(tmp)) {
      // crash between aside and swap-in: tmp was complete when the
      // aside rename ran — finish the swap
      require(fs.rename(tmp, live), s"recovery swap-in failed for $live")
      fs.delete(old, true)
    } else if (fs.exists(old)) {
      // swap-in itself failed mid-flight (shouldn't happen on atomic
      // rename stores): fall back to the pre-compact copy
      require(fs.rename(old, live), s"recovery restore failed for $live")
    }
  }
}
