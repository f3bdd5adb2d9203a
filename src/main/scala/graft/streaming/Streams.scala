package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
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
