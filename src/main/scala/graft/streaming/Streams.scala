package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.Row

import graft.weather.{Flatten, Schemas, Store}

/** Structured Streaming surface (SURVEY.md §2.9).
  *
  * The reference's "stream" is an hourly cron micro-batch with
  * upsert-on-key idempotence (ST1–ST3); here that becomes:
  *  - a file-drop source (the distributed stand-in for the REST fetch:
  *    payloads land as JSON files, the stream picks them up),
  *  - watermarked dropDuplicates on the upsert key (bounded state),
  *  - foreachBatch MERGE-style writes (idempotent under replay),
  *  - plus windowed event-time aggregation over the driver's `events`
  *    stream table.
  */
object Streams {

  /** ST1: file-drop ingest of current-weather JSON payloads → flattened
    * typed rows. `Trigger.AvailableNow` drains what exists then stops —
    * the scheduled-micro-batch shape; a processing-time trigger gives the
    * continuous shape with the same plan. `maxFilesPerTrigger` is the
    * source-side throttle — the streaming equivalent of the reference's
    * inter-call sleep (ST4, etl.py:136): bound how much lands per
    * micro-batch instead of sleeping. */
  def currentWeatherStream(spark: SparkSession, inputDir: String,
                           maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.schema(Schemas.currentWeatherRaw)
    val throttled = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n)).getOrElse(reader)
    val raw = throttled.json(inputDir)
    // reuse the batch flatten: wrap the parsed struct back under `d`
    Flatten.flattenCurrent(raw.select(struct(raw.columns.map(col): _*).as("d")))
  }

  /** ST2: exactly-once-per-key effect — watermarked dedup on the upsert
    * key (city_id, dt). The watermark bounds state: keys older than the
    * horizon are evicted, matching the reference's "late replays upsert
    * the same key" policy. */
  def dedupedStream(flat: DataFrame, watermark: String = "2 hours"): DataFrame =
    flat.withWatermark("dt", watermark).dropDuplicates("city_id", "dt")

  /** ST3: idempotent sink — per-batch last-write-wins merge into a
    * parquet fact table partitioned by date. foreachBatch makes the
    * streaming write transactional per micro-batch at the partition
    * granularity. The merge is INCREMENTAL: each micro-batch reads and
    * rewrites only the `p_date` partitions it touches (O(touched days)
    * per batch, never O(table) — the property that keeps a continuous
    * upsert stream viable at 100 TB). */
  def upsertSink(deduped: DataFrame, tablePath: String): DataStreamWriter[Row] =
    upsertSinkTo(deduped, Store.ParquetDateSink(tablePath), Seq("city_id", "dt"))

  /** Storage-agnostic variant: merge each micro-batch into any
    * [[graft.sources.MergeSink]] (parquet, JDBC, …). */
  def upsertSinkTo(deduped: DataFrame, sink: graft.sources.MergeSink,
                   keys: Seq[String]): DataStreamWriter[Row] =
    deduped.writeStream
      .outputMode(OutputMode.Update)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink.mergeLastWins(batch, keys)
      }

  /** EXACTLY-ONCE upsert into a Delta-protocol table: each micro-batch
    * commits its (appId, batchId) pair as a Delta `txn` action IN THE
    * SAME atomic log entry as its data, so a foreachBatch replay after
    * a crash (Structured Streaming's at-least-once contract) is
    * recognized from the table's own ledger and SKIPPED — the
    * transactional upgrade of [[upsertSinkTo]]'s key-idempotence, and
    * the handshake real Delta streaming writers use, readable by any
    * Delta client. `appId` must be stable across restarts (it names
    * this query in the ledger — pair it with the checkpointLocation). */
  def upsertSinkExactlyOnce(deduped: DataFrame,
                            sink: graft.sources.DeltaLake.DeltaDateSink,
                            keys: Seq[String],
                            appId: String): DataStreamWriter[Row] =
    deduped.writeStream
      .outputMode(OutputMode.Update)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink.mergeLastWinsTxn(batch, keys, appId, batchId)
        ()
      }

  /** Streaming corpus admission — the training-data ingestion front
    * door: each micro-batch of documents is near-dup-checked against
    * the persisted corpus through its MinHash band index
    * ([[graft.operators.IncrementalDedup]] — O(batch) work, the corpus
    * never shuffles), the admitted subset appends to the corpus table,
    * and its bands append to the index so LATER batches see EARLIER
    * ones without reprocessing anything.
    *
    * The admitted frame is localCheckpoint'ed before the two writes:
    * its plan reads `corpusDir`/`indexDir`, and appending to those
    * while a second action re-plans the same frame would make the
    * batch collide with itself. Within-batch duplicates are the
    * caller's upstream step (`TextDedup` on the small batch) — this
    * sink owns batch-vs-corpus admission.
    *
    * Replay semantics: a replayed micro-batch re-checks against an
    * index that now contains its own docs, so every doc whose TEXT is
    * in the corpus is flagged as its own duplicate and the batch admits
    * nothing — append-only storage plus content-level dedup gives
    * idempotence without a transaction log.
    *
    * Crash safety hinges on WRITE ORDER: the index appends BEFORE the
    * corpus. A crash between the two leaves bands indexed for absent
    * docs — harmless, because verification requires the corpus text, so
    * the replayed batch re-admits those docs and the corpus still ends
    * with exactly one copy (the index just holds a duplicate band row,
    * which candidate distinct() absorbs). The opposite order would
    * leave admitted docs invisible to the index and a replay would
    * append them twice.
    *
    * First deployment bootstraps itself: missing corpus/index paths
    * mean "empty corpus" — the whole first batch admits and creates
    * both. */
  def corpusAdmissionSink(docs: DataFrame, corpusDir: String, indexDir: String,
                          threshold: Double = 0.5,
                          p: graft.operators.IncrementalDedup.Params =
                            graft.operators.IncrementalDedup.Params())
      : DataStreamWriter[Row] =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import graft.operators.IncrementalDedup
        val spark = batch.sparkSession
        def exists(dir: String): Boolean = {
          val path = new org.apache.hadoop.fs.Path(dir)
          path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
        }
        val admitted =
          (if (exists(corpusDir) && exists(indexDir)) {
            val corpus = spark.read.parquet(corpusDir)
            val dups = IncrementalDedup.dedupeBatch(batch, corpus, indexDir, threshold, p)
            IncrementalDedup.admit(batch, dups)
          } else batch).localCheckpoint(true)
        IncrementalDedup.appendToIndex(admitted, indexDir, p)
        admitted.write.mode("append").parquet(corpusDir)
      }

  /** One input event of the streaming sessionizer: `entity` the session
    * key, `ts` event time, `tie` the deterministic tiebreaker (an event
    * id), `label` the entry/exit readout. */
  final case class SessEvent(entity: Long, ts: java.sql.Timestamp,
                             tie: Long, label: String)

  /** One open (not-yet-final) session in the keyed state. */
  final case class OpenSession(startUs: Long, endUs: Long, n: Long,
                               entryTie: Long, entryLabel: String,
                               exitTie: Long, exitLabel: String)

  /** Keyed state: the per-entity session counter (so `session_seq`
    * matches the batch numbering across the entity's whole history),
    * the open-session interval list, and the last finalized end (the
    * tombstone-TTL clock — 0 until a session finalizes). */
  final case class SessionState(nextSeq: Long, open: List[OpenSession],
                                lastEndUs: Long = 0L)

  /** One FINAL session — the [[graft.operators.Analytics.sessionStats]]
    * output row, emitted exactly once. */
  final case class SessionRow(entity: Long, session_seq: Long,
                              session_start_us: Long, session_end_us: Long,
                              duration_us: Long, n_events: Long,
                              entry_label: String, exit_label: String)

  private def usOf(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** STATEFUL STREAMING SESSIONIZATION — the unbounded-input twin of
    * [[graft.operators.Analytics.sessionStats]] (gap-based sessions,
    * same rollup columns, same tie discipline), via
    * `flatMapGroupsWithState` with EVENT-TIME timeout.
    *
    * Semantics: a session is emitted exactly once, when the watermark
    * passes `session_end + gap` — the first instant no event can
    * legally join it (events older than the watermark are filtered by
    * the stateful operator itself under EventTimeTimeout, so an
    * already-emitted session can never need reopening). Until then the
    * session sits in keyed state as an interval; late events WITHIN the
    * watermark extend or even MERGE open sessions (two fragments whose
    * bridging event arrives a batch later collapse into one — the
    * interval-merge sweep below is what a naive "extend the last
    * session" recurrence gets wrong). An event at exactly
    * `end + gap` joins (`≤ gap`, the batch rule); a session with
    * `end + gap ≥ watermark` is withheld even if it looks closed.
    *
    * Replay/equality contract (StreamsSpec): feeding the same bounded
    * input through the stream — in any batch split whose late arrivals
    * respect the watermark — and flushing the watermark emits EXACTLY
    * the batch operator's rows, session_seq included.
    *
    * Scale posture: state per entity = the open-session list, bounded
    * by (watermark delay / gap) + 1 intervals of 7 scalars each — never
    * the events (each event folds into its interval on arrival); the
    * shuffle is the same one entity-keyed exchange the batch operator
    * pays. A finalized entity keeps a small tombstone (the seq counter
    * + TTL clock) so numbering stays global across its whole history —
    * the price of batch-equal `session_seq`. WITHOUT a TTL that
    * tombstone set grows with lifetime entity cardinality; pass
    * `tombstoneTtlUs` to bound it: an entity idle (no open sessions,
    * no events) past the TTL after its last session end has its state
    * DROPPED — if it later reappears, `session_seq` restarts at 1, so
    * global numbering is guaranteed only within TTL-continuous
    * activity (the documented trade; pick TTL ≥ any reappearance gap
    * that must stay globally numbered, and ≥ gap). Every drop
    * increments `droppedTombstones` when supplied (also a named
    * accumulator visible in the Spark UI), so unbounded-state relief
    * is observable, never silent.
    *
    * Input columns: `entity` LONG, `ts` TIMESTAMP, `tie` LONG,
    * `label` STRING. Output: the batch rollup columns. */
  def sessionStatsStream(events: DataFrame, gapUs: Long,
                         watermark: String = "1 hour",
                         tombstoneTtlUs: Option[Long] = None,
                         droppedTombstones: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    require(gapUs > 0, s"gapUs must be > 0, got $gapUs")
    tombstoneTtlUs.foreach(t => require(t > 0, s"tombstoneTtlUs must be > 0, got $t"))
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("entity").cast("long").as("entity"),
        col("ts").cast("timestamp").as("ts"),
        // a NULL tie must not poison the long-running query (the typed
        // encoder would throw on the non-nullable Long field and take
        // the stream down); Long.MinValue mirrors the batch twin's
        // NULLS-FIRST ordering of a null tiebreaker
        coalesce(col("tie").cast("long"), lit(Long.MinValue)).as("tie"),
        col("label").cast("string").as("label"))
      .filter(col("entity").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .as[SessEvent]
      .groupByKey(_.entity)
      .flatMapGroupsWithState[SessionState, SessionRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (entity, it, state) =>
          advanceSessions(entity, it, state, gapUs, tombstoneTtlUs,
            droppedTombstones)
      }
      .toDF()
  }

  /** One state transition of [[sessionStatsStream]] (exposed for the
    * spec's direct unit cases): fold the batch's events into the
    * interval list, emit the finalized prefix, re-arm the timeout at
    * the earliest surviving `end + gap`. */
  private[streaming] def advanceSessions(entity: Long,
      it: Iterator[SessEvent], state: GroupState[SessionState],
      gapUs: Long, tombstoneTtlUs: Option[Long] = None,
      droppedTombstones: Option[org.apache.spark.util.LongAccumulator] = None)
      : Iterator[SessionRow] = {
    val prior = if (state.exists) state.get else SessionState(1L, Nil)
    val incoming = it.map(e =>
      OpenSession(usOf(e.ts), usOf(e.ts), 1L, e.tie, e.label, e.tie, e.label))
    // interval-merge sweep: open sessions are disjoint with gaps > gapUs
    // and new events are points, so one (start, tie)-sorted pass merges
    // everything a ≤ gap bridge connects
    def combine(a: OpenSession, b: OpenSession): OpenSession = {
      val (xt, xl) =
        if (b.endUs > a.endUs ||
            (b.endUs == a.endUs && b.exitTie > a.exitTie))
          (b.exitTie, b.exitLabel)
        else (a.exitTie, a.exitLabel)
      val (et, el) =
        if (b.startUs < a.startUs ||
            (b.startUs == a.startUs && b.entryTie < a.entryTie))
          (b.entryTie, b.entryLabel)
        else (a.entryTie, a.entryLabel)
      OpenSession(math.min(a.startUs, b.startUs),
        math.max(a.endUs, b.endUs), a.n + b.n, et, el, xt, xl)
    }
    val all = (prior.open ++ incoming)
      .sortBy(s => (s.startUs, s.entryTie))
    val merged = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
    all.foreach { s =>
      if (merged.nonEmpty && s.startUs - merged.last.endUs <= gapUs)
        merged += combine(merged.remove(merged.length - 1), s)
      else merged += s
    }
    // sessions are gap-separated, so ends are strictly increasing and
    // the finalized set is a PREFIX — seq numbering never interleaves
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (done, open) = merged.partition(s => s.endUs + gapUs < wmUs)
    val out = done.zipWithIndex.map { case (s, i) =>
      SessionRow(entity, prior.nextSeq + i, s.startUs, s.endUs,
        s.endUs - s.startUs, s.n, s.entryLabel, s.exitLabel)
    }
    val lastEnd = (prior.lastEndUs +: done.map(_.endUs)).max
    if (open.isEmpty && tombstoneTtlUs.exists(t =>
        lastEnd > 0 && wmUs > lastEnd + t)) {
      // pure tombstone idle past the TTL: drop it (counted, never
      // silent) — if the entity reappears, seq restarts at 1
      state.remove()
      droppedTombstones.foreach(_.add(1L))
    } else {
      state.update(
        SessionState(prior.nextSeq + done.length, open.toList, lastEnd))
      if (open.nonEmpty)
        // strictly above the watermark (ms floor could equal it)
        state.setTimeoutTimestamp(open.map(_.endUs + gapUs).min / 1000L + 1L)
      else tombstoneTtlUs.foreach { t =>
        // arm the TTL sweep: wake when the watermark passes lastEnd+ttl
        if (lastEnd > 0)
          state.setTimeoutTimestamp((lastEnd + t) / 1000L + 1L)
      }
    }
    out.iterator
  }

  private[streaming] final case class KmvIn(key: String, h: Long)

  /** One running distinct-cardinality row of [[kmvDistinctStream]]. */
  final case class KmvDistinctRow(key: String, n_sig: Int,
                                  distinct_est: Double)

  /** STREAMING DISTINCT-CARDINALITY sketches — the unbounded twin of
    * [[graft.operators.Sketches.kmvSignatures]] + `kmvDistinctEst`,
    * with the round-8 bottom-k buffer as the keyed STATE: per key, the
    * state is the sorted distinct bottom-k hash array (≤ k longs —
    * bounded forever, by construction), each micro-batch folds its
    * values in through exactly the batch aggregator's reduce, and the
    * emitted estimate is the same pinned IEEE chain the batch column
    * computes — so after any replay/batch-split of the same input the
    * final per-key row is BIT-IDENTICAL to the batch operator's
    * (bottom-k is canonical; StreamsSpec asserts it). Both `n_sig` and
    * `distinct_est` are non-decreasing over a key's lifetime (a
    * growing union can only lower the kth hash), which is what lets
    * update-mode consumers keep the max per key.
    *
    * Update output mode (running estimates, no watermark/event-time —
    * cardinality has no lateness semantics). State per key: ≤ k longs
    * + the key. */
  def kmvDistinctStream(events: DataFrame, key: Column, value: Column,
                        k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = events.sparkSession
    import spark.implicits._
    val agg = new graft.functions.Aggregators.BottomKDistinctAggregator(k)
    events
      .select(key.cast("string").as("key"),
        xxhash64(value).bitwiseXOR(lit(Long.MinValue)).as("h"))
      .filter(col("key").isNotNull)
      .as[KmvIn]
      .groupByKey(_.key)
      .mapGroupsWithState[Array[Long], KmvDistinctRow](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          var buf = state.getOption.getOrElse(agg.zero)
          it.foreach(e => buf = agg.reduce(buf, e.h))
          state.update(buf)
          KmvDistinctRow(key, buf.length, kmvEstimate(buf, k))
      }
      .toDF()
  }

  /** The classic KMV estimator, bit-identical to
    * [[graft.operators.Sketches.kmvDistinctEst]]'s column form: exact
    * |set| while the sketch holds the whole set, else
    * (k−1)/frac(kth smallest flipped hash). */
  private def kmvEstimate(sig: Array[Long], k: Int): Double =
    if (sig.length < k) sig.length.toDouble
    else {
      val frac = (sig(k - 1).toDouble + 9.223372036854776e18) /
        1.8446744073709552e19
      (k - 1).toDouble / frac
    }

  /** Stream-static enrichment: join the live fact stream to a dimension
    * snapshot (the dashboard's fact⋈cities shape, streaming edition).
    * Spark re-plans the static side per micro-batch, so a refreshed dim
    * parquet is picked up without restarting the query; the dim is tiny
    * (J1), so each micro-batch joins via broadcast — no stream-side
    * shuffle and no streaming state. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, on: Seq[String],
                    broadcastDim: Boolean = true): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    stream.join(d, on, "left_outer")
  }

  /** Tumbling event-time window aggregation over the events stream
    * (SURVEY.md §2.9 extension): count/sum per (window, event_type) with
    * a watermark so state is bounded and late rows beyond the horizon are
    * dropped. */
  def windowedEventStats(events: DataFrame, window_ : String = "1 hour",
                         watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Batch-equivalent of windowedEventStats — identical plan minus the
    * watermark; used by the oracle probe so batch and streaming results
    * can be cross-checked in tests. */
  def windowedEventStatsBatch(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join (§2.9 extension): attribute each
    * purchase to every click by the same user within `horizon` BEFORE
    * it — the canonical two-stream attribution shape. On streaming
    * inputs both sides carry a watermark and the join condition carries
    * the time bound, so Spark can size the join state and EVICT rows
    * older than watermark+horizon — state stays O(events in the horizon
    * window), not O(stream). On batch inputs the same plan is a plain
    * interval join (watermarks are a streaming-only notion), which is
    * exactly the cross-check the spec and oracle use.
    *
    * The shuffle keys on user_id on both sides — linear, and AQE handles
    * a hot user at scale the same way it does any skewed equi-join. */
  def attributedPurchases(events: DataFrame, horizon: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame = {
    def wm(df: DataFrame, tsCol: String): DataFrame =
      if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    val clicks = wm(events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts")), "click_ts")
    val purchases = wm(events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("amount")), "purchase_ts")
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("amount"))
  }

  /** LEFT OUTER stream-stream attribution — [[attributedPurchases]]
    * plus the rows that pipeline exists to surface: clicks that
    * converted to NOTHING inside the horizon. The streaming semantics
    * worth pinning (the spec does): an unmatched click is only provably
    * unmatched once BOTH watermarks clear its whole horizon window, so
    * its NULL-padded row emits with that delay — until then the click
    * sits in the state store as a potential match. The time-range
    * predicate is also the state bound: without it (or without both
    * watermarks) the state store grows forever, silently.
    *
    * Runs identically on a batch frame (plain left-outer interval
    * join), which is the correctness oracle the spec compares against
    * once the stream's watermark has advanced past all test data.
    *
    * Output: `user_id`, `click_id`, `click_ts`, `purchase_id`,
    * `amount` (purchase cols NULL = unattributed click). */
  def attributedPurchasesOuter(events: DataFrame, horizon: String = "1 hour",
                               watermark: String = "2 hours"): DataFrame = {
    def wm(df: DataFrame, tsCol: String): DataFrame =
      if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    val clicks = wm(events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts")), "click_ts")
    val purchases = wm(events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("amount")), "purchase_ts")
    clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("click_ts"),
        col("purchase_id"), col("amount"))
  }
}
