package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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

  // ------------------------------------------------------------------
  // Disk-backed per-round state (the round-13 substrate change).
  //
  // The iterative operators used to park each round's state in the
  // block manager via `localCheckpoint(true)`. Local-checkpoint blocks
  // are NON-RECOMPUTABLE by construction — the lineage is truncated at
  // the checkpoint, so a block lost to memory-pressure eviction churn
  // or an executor death is a failed stage and a rerun job, not a
  // recompute (Spark logs it as "lineage truncated, cannot be
  // recomputed"). On a loaded box that turned seconds-scale graph
  // recurrences into minute-scale flaps; at 1000-executor scale it is
  // a job killer. [[diskRound]] replaces the substrate: each round is
  // written ONCE to a session-scoped parquet scratch path and read
  // back — the round frames are O(V) rows of longs, so the write is a
  // fast narrow job, and the read-back plan is recomputable FOREVER
  // (a lost scan task just re-reads the file). Superseded rounds are
  // deleted promptly ([[releaseDiskRound]]); the FINAL round's files —
  // which the returned frame still reads — live until the scratch
  // root's shutdown-hook cleanup.
  //
  // Cluster posture: the default scratch root is `java.io.tmpdir`,
  // correct for local[*] (one JVM, one filesystem). On a real cluster
  // set `spark.graft.scratch.dir` to a path every executor can read
  // (HDFS/S3), exactly as one would `sparkContext.setCheckpointDir` —
  // the parquet write/read already goes through the Hadoop FS API, so
  // no code changes.
  // ------------------------------------------------------------------

  private val scratchRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val roundIds = new java.util.concurrent.atomic.AtomicLong(0L)

  // ------------------------------------------------------------------
  // Substrate telemetry (round-13 optimization): cumulative wall time
  // spent (a) polling in [[drain]] and (b) writing round state in
  // [[diskRound]], plus how often a drain gave up at its deadline.
  // graft.Bench snapshots these per timed run, so a slow iteration
  // whose task counters are all zero (no GC, no retries, no spill) can
  // still name its cause in the artifact: an idling drain poll or a
  // stalled scratch write, both invisible to task metrics.
  // ------------------------------------------------------------------
  private val drainNanosAcc = new java.util.concurrent.atomic.AtomicLong(0L)
  private val drainTimeoutsAcc = new java.util.concurrent.atomic.AtomicLong(0L)
  private val roundWriteNanosAcc = new java.util.concurrent.atomic.AtomicLong(0L)
  private val roundWritesAcc = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Read-and-zero the substrate counters:
    * (drainMs, drainTimeouts, roundWriteMs, roundWrites). */
  def substrateStatsSnapshot(): (Long, Long, Long, Long) = (
    drainNanosAcc.getAndSet(0L) / 1000000L,
    drainTimeoutsAcc.getAndSet(0L),
    roundWriteNanosAcc.getAndSet(0L) / 1000000L,
    roundWritesAcc.getAndSet(0L))

  /** Session-scoped scratch root (qualified URI string), created on
    * first use and best-effort deleted when the JVM exits. */
  private def scratchRoot(spark: SparkSession): String =
    scratchRoots.computeIfAbsent(spark.sparkContext.applicationId, _ => {
      val configured = spark.conf.getOption("spark.graft.scratch.dir")
        .getOrElse(new java.io.File(
          System.getProperty("java.io.tmpdir"),
          s"graft-scratch-${spark.sparkContext.applicationId}")
          .getAbsolutePath)
      val p = new org.apache.hadoop.fs.Path(configured)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val q = fs.makeQualified(p)
      fs.mkdirs(q)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        try fs.delete(q, true)
        catch { case _: Throwable => () }
      }, "graft-scratch-cleanup"))
      q.toString
    })

  /** Eagerly materialize a per-round frame to RELIABLE storage: one
    * parquet write (the only computation of `df`'s plan) + a read-back
    * whose scan is recomputable from disk — the eviction-proof
    * replacement for `localCheckpoint(true)` in iterative recurrences.
    * Lineage stays flat (the read-back plan is a file scan), and no
    * block manager state is load-bearing for the next round.
    *
    * Write machinery is kept deliberately bare (measured on the
    * pagerank-round-shaped producer, tools/RoundVariants): the round-13
    * build's REBALANCE hint added a full extra AQE shuffle stage per
    * round for files the producer already sizes — every round frame
    * here is the output of an aggregate or a join over AQE-coalesced
    * inputs, so its partitioning is already advisory-right-sized at any
    * scale, and the rebalance was pure overhead (0.63–0.74 s/round with
    * it vs 0.44–0.52 without, compute alone 0.07–0.14). The _SUCCESS
    * marker and parquet summary files are skipped the same way — this
    * is session-scoped scratch nobody discovers by directory listing.
    * Scratch stays SNAPPY regardless of any session-level zstd choice:
    * round state is written once, read once and deleted, so cheap CPU
    * beats ratio. */
  def diskRound(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val path = s"${scratchRoot(spark)}/round-${roundIds.incrementAndGet()}"
    val t0 = System.nanoTime()
    df.write.mode(SaveMode.ErrorIfExists)
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .option("parquet.summary.metadata.level", "NONE")
      .option("compression", "snappy")
      .parquet(path)
    roundWriteNanosAcc.addAndGet(System.nanoTime() - t0)
    roundWritesAcc.incrementAndGet()
    spark.read.parquet(path)
  }

  /** Delete the scratch files behind superseded [[diskRound]] frames —
    * the disk twin of [[releaseCheckpoint]]. Only paths under this
    * session's scratch root are ever touched (a caller accidentally
    * passing a real table is a no-op), and a SHORT drain runs first so
    * no straggling async-exchange task is mid-read when the file
    * vanishes (a re-read retry after that would FileNotFound — the one
    * non-recomputable window this substrate has, closed the same way
    * the block release was). Null frames are skipped so first-round
    * callers can pass their not-yet-disk-backed seed frame. */
  def releaseDiskRound(spark: SparkSession, frames: DataFrame*): Unit = {
    val real = frames.filter(_ != null)
    if (real.isEmpty) return
    val root = scratchRoot(spark)
    drain(spark, timeoutMs = 250L)
    val conf = spark.sparkContext.hadoopConfiguration
    real.foreach { df =>
      try df.queryExecution.analyzed.foreach {
        case lr: LogicalRelation => lr.relation match {
          case h: HadoopFsRelation => h.location.rootPaths.foreach { p =>
            if (p.toString.startsWith(root))
              try p.getFileSystem(conf).delete(p, true)
              catch { case scala.util.control.NonFatal(_) => () }
          }
          case _ => ()
        }
        case _ => ()
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

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
    val t0 = System.nanoTime()
    val deadline = t0 + timeoutMs * 1000000L
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
    if (emptyStreak < 2) drainTimeoutsAcc.incrementAndGet()
    drainNanosAcc.addAndGet(System.nanoTime() - t0)
  }

  /** Release the block-manager storage behind a superseded eagerly-
    * localCheckpoint'ed frame (per-round state the next round has
    * already been checkpointed FROM — nothing can legitimately read it
    * again). Without this, an iters-round recurrence parks iters ×
    * O(V) block sets until the ContextCleaner's next GC sweep — dead
    * weight that at scale evicts live caches. Best-effort by design:
    * drains first (a local-checkpoint block loss is NOT recomputable,
    * so no straggler may be mid-read), and falls back to the
    * ContextCleaner when the plan is not the expected checkpoint shape.
    *
    * The drain here is SHORT (250 ms, vs [[drainAndUnpersist]]'s 10 s):
    * this runs once per LOOP ROUND of the iterative operators, and on a
    * busy shared session whose tracker never empties a 10 s bounded
    * wait per round would turn a seconds-scale N-round operator into
    * minutes of idling. The long timeout stays reserved for the one
    * final drain before the statics release. */
  def releaseCheckpoint(spark: SparkSession, frames: DataFrame*): Unit = {
    val real = frames.filter(_ != null)
    if (real.isEmpty) return
    drain(spark, timeoutMs = 250L)
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
