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

  /** Bounded wait for session quiescence (no active jobs), required
    * EMPTY ON TWO POLLS ~15 ms apart. The status tracker is fed by the
    * async listener bus, which lags in both directions: a just-finished
    * job may linger (harmless — lengthens the wait) and a just-started
    * job may not be visible yet (dangerous — a single empty poll could
    * release blocks under it). The double poll covers the start-lag
    * window; the residual race is additionally BOUNDED by the callers'
    * per-round checkpoints — with flat lineage the worst recompute a
    * leaked straggler can trigger is one round over persisted statics,
    * never a multi-round rebuild. On a busy shared session the wait
    * gives up at `timeoutMs` and degrades to the pre-drain behavior. */
  def drain(spark: SparkSession, timeoutMs: Long = 10000L): Unit = {
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var emptyStreak = 0
    while (emptyStreak < 2 && System.nanoTime() < deadline) {
      if (tracker.getActiveJobIds().isEmpty) {
        emptyStreak += 1
        if (emptyStreak < 2) Thread.sleep(15)
      } else {
        emptyStreak = 0
        Thread.sleep(5)
      }
    }
  }

  /** Release the block-manager storage behind a superseded eagerly-
    * localCheckpoint'ed frame (per-round state the next round has
    * already been checkpointed FROM — nothing can legitimately read it
    * again). Without this, an iters-round recurrence parks iters ×
    * O(V) block sets until the ContextCleaner's next GC sweep — dead
    * weight that at scale evicts live caches. Best-effort by design:
    * drains first (a local-checkpoint block loss is NOT recomputable,
    * so no straggler may be mid-read), and falls back to the
    * ContextCleaner when the plan is not the expected checkpoint shape. */
  def releaseCheckpoint(spark: SparkSession, frames: DataFrame*): Unit = {
    val real = frames.filter(_ != null)
    if (real.isEmpty) return
    drain(spark)
    real.foreach { df =>
      // deliberately ONLY the root-is-checkpoint shape: traversing the
      // tree for checkpoint LEAVES could release a caller-owned
      // checkpoint that the initial round's frame still references
      // (local-checkpoint loss is unrecoverable, not a recompute)
      try df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}
