package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory publication for the snapshot/state dirs the
  * streaming operators maintain ([[graft.streaming.EventPipeline]]'s
  * sketchRollup / streamingUpsert) and [[Layout.compact]]'s rewrite.
  *
  * The naive `delete(live); rename(staging, live)` swap has a window
  * where a crash loses BOTH copies: live is already deleted, staging is
  * never promoted, and the next start sees `exists(live) == false` and
  * silently rebuilds from scratch. This helper publishes via
  * rename-aside instead:
  *
  *   1. `rename(live, live_old)`   (skip if live doesn't exist yet)
  *   2. `rename(staging, live)`
  *   3. `delete(live_old)`
  *
  * Every intermediate state is recoverable because at least one complete
  * copy (live, live_old, or a complete staging) exists at all times —
  * renames are metadata moves, never data rewrites. [[recover]] is run
  * before every read/merge and repairs any interrupted swap:
  * completes it when staging was already published-worthy, rolls back to
  * the old copy otherwise, and clears stale leftovers. Concurrent
  * readers racing the swap see a missing dir only inside the two-rename
  * window; a read path that calls [[recover]] first never observes a
  * lost snapshot.
  */
object AtomicSwap {
  def stagingOf(live: Path): Path = new Path(live.toString + "_staging")
  private def oldOf(live: Path): Path = new Path(live.toString + "_old")

  /** Publish `stagingOf(live)` (which must be completely written) as
    * `live`. Call [[recover]] first at process start; commit itself also
    * clears a leftover `_old` so repeated batches self-heal.
    */
  def commit(fs: FileSystem, live: Path): Unit = {
    val old = oldOf(live)
    val stg = stagingOf(live)
    require(fs.exists(stg), s"AtomicSwap.commit: staging dir $stg does not exist")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live))
      require(fs.rename(live, old), s"AtomicSwap.commit: rename $live -> $old failed")
    require(fs.rename(stg, live), s"AtomicSwap.commit: rename $stg -> $live failed")
    fs.delete(old, true)
  }

  /** Repair an interrupted [[commit]]. Exhaustive over the three dirs:
    *  - live present: any `_old` is post-publish leftover, any staging is
    *    an incomplete write — delete both.
    *  - live absent, `_old` present: a swap was cut mid-flight. If
    *    staging exists it was complete (commit only runs on a complete
    *    staging and `_old` proves commit started) — finish the publish;
    *    otherwise roll back `_old` to live.
    *  - live absent, `_old` absent, staging present: a first-ever write
    *    that never reached commit — completeness unknown, so drop it
    *    (the writer's checkpoint replays that batch).
    */
  def recover(fs: FileSystem, live: Path): Unit = {
    val old = oldOf(live)
    val stg = stagingOf(live)
    if (fs.exists(live)) {
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(stg)) fs.delete(stg, true)
    } else if (fs.exists(old)) {
      if (fs.exists(stg)) {
        require(fs.rename(stg, live), s"AtomicSwap.recover: rename $stg -> $live failed")
        fs.delete(old, true)
      } else {
        require(fs.rename(old, live), s"AtomicSwap.recover: rename $old -> $live failed")
      }
    } else if (fs.exists(stg)) {
      fs.delete(stg, true)
    }
  }
}
