package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cache-release discipline for operators that persist static frames
  * for the duration of a call and release them before returning.
  *
  * The naive lifecycle — `out = result.localCheckpoint(true);
  * statics.unpersist()` — has a race under AQE: adaptive execution
  * submits broadcast-exchange jobs on separate threads
  * (`withThreadLocalCaptured` futures), and those jobs can still be
  * running when the main action returns. If `unpersist()` then deletes
  * the cached blocks mid-fetch, the in-flight task fails with
  * `BlockNotFoundException` and its RETRY recomputes the block's full
  * lineage with the cache gone — for an iterative operator that means
  * re-running a multi-round recurrence from the raw tables, stealing
  * every core from whatever query runs next (measured: a 7 s PageRank
  * turning into 48 s with a 99 s run-to-run spread in the round-11
  * driver bench, 16 `BlockNotFoundException` hits in the test logs).
  *
  * [[drainAndUnpersist]] closes the race at the source: wait (bounded)
  * until the session has no active jobs — our own action already
  * returned, so the only stragglers are those async exchange jobs,
  * which complete in milliseconds — THEN drop the blocks. The wait is
  * bounded so a busy shared session degrades to today's behavior
  * instead of hanging; the drain is skipped entirely when nothing is
  * running (the common case: one poll, no sleep).
  */
private[graft] object Lifecycle {

  /** Unpersist `frames` once the session's in-flight jobs have drained
    * (bounded wait), so no straggler task can observe the blocks
    * disappearing mid-read. Call AFTER the operator's output has been
    * eagerly materialized — the caches must not be load-bearing for
    * the returned frame. */
  def drainAndUnpersist(spark: SparkSession, frames: DataFrame*): Unit = {
    drain(spark)
    frames.foreach(_.unpersist(blocking = false))
  }

  /** Bounded wait for session quiescence (no active jobs). The status
    * tracker is fed by the async listener bus, so a just-finished job
    * may linger for a few polls — that only lengthens the wait, never
    * shortens it, which is the safe direction here. */
  def drain(spark: SparkSession, timeoutMs: Long = 10000L): Unit = {
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (tracker.getActiveJobIds().nonEmpty &&
      System.nanoTime() < deadline) {
      Thread.sleep(5)
    }
  }
}
