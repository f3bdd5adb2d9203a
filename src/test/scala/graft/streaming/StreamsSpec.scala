package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark
import graft.sources.Tables
import graft.weather.Store

class StreamsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("windowed streaming agg equals the batch-equivalent plan (ST-surface)") {
    // feed the events table through a file stream and compare to batch
    val batchEvents = Tables.events(spark, SharedSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream
      .schema(batchEvents.schema)
      .parquet(dir)
    val q = Streams.windowedEventStats(streamed)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("win_out")
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("win_out")
      .orderBy("window_start", "event_type")
      .select("window_start", "event_type", "n_events", "sum_value")
      .collect().toSeq
    val want = Streams.windowedEventStatsBatch(batchEvents)
      .orderBy("window_start", "event_type")
      .collect().toSeq
    assert(got === want)
  }

  test("stream-stream interval join equals the batch interval join (attribution)") {
    val batchEvents = Tables.events(spark, SharedSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_ssj_in").toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val streamed = spark.readStream.schema(batchEvents.schema).parquet(dir)
    val q = Streams.attributedPurchases(streamed)
      .writeStream
      .outputMode("append") // stream-stream inner join emits on match
      .format("memory")
      .queryName("attr_out")
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("attr_out")
      .orderBy("click_id", "purchase_id").collect().toSeq
    val want = Streams.attributedPurchases(batchEvents)
      .orderBy("click_id", "purchase_id").collect().toSeq
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("metrics listener records per-batch input rows (ST5)") {
    val batchEvents = Tables.events(spark, SharedSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_metrics_in").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val listener = Metrics.attach(spark)
    try {
      val stream = spark.readStream.schema(batchEvents.schema).parquet(dir)
      val query = Streams.windowedEventStats(stream)
        .writeStream.outputMode("complete").format("memory")
        .queryName("metrics_out").start()
      query.processAllAvailable()
      query.stop()
      // listener events are async; wait briefly for delivery
      var tries = 0
      while (listener.totalInputRows < batchEvents.count() && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      assert(listener.totalInputRows === batchEvents.count())
      assert(listener.snapshot.forall(_.queryName == "metrics_out"))
    } finally Metrics.detach(spark, listener)
  }

  test("stream-static enrichment joins each micro-batch to the dim snapshot") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_enrich_in").toString
    val payload =
      """{"coord":{"lon":105.8,"lat":21.0},"weather":[{"id":802,"main":"Clouds","description":"x","icon":"03d"}],
        |"main":{"temp":22.0,"feels_like":21.0,"temp_min":22.0,"temp_max":22.0,"pressure":1021,"humidity":37},
        |"wind":{"speed":4.0,"deg":355},"clouds":{"all":34},"dt":1764129959,
        |"sys":{"country":"VN","sunrise":1764112440,"sunset":1764152047},
        |"timezone":25200,"id":1581130,"name":"Hanoi","cod":200}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/a.json"), payload)

    val dim = Seq((1581130L, "Red River Delta"), (99L, "Nowhere"))
      .toDF("city_id", "region_name")
    val flat = Streams.currentWeatherStream(spark, inDir)
      .select("city_id", "dt", "temp")
    val q = Streams.enrichWithDim(flat, dim, Seq("city_id"))
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("enrich_out").collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("region_name") === "Red River Delta")
  }

  test("streaming micro-batches merge into a JDBC sink through the storage seam") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_jdbc_in").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_jdbc_ck").toString
    def payload(dt: Long, temp: Double) =
      s"""{"coord":{"lon":105.8,"lat":21.0},"weather":[{"id":802,"main":"Clouds","description":"x","icon":"03d"}],
         |"main":{"temp":$temp,"feels_like":21.0,"temp_min":$temp,"temp_max":$temp,"pressure":1021,"humidity":37},
         |"wind":{"speed":4.0,"deg":355},"clouds":{"all":34},"dt":$dt,
         |"sys":{"country":"VN","sunrise":1764112440,"sunset":1764152047},
         |"timezone":25200,"id":1581130,"name":"Hanoi","cod":200}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/a.json"), payload(1764129959, 22.0))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/b.json"), payload(1764133559, 23.0))

    val sink = graft.sources.JdbcMergeSink(
      "jdbc:derby:memory:graftstream;create=true", "stream_fact")
    val q = Streams.upsertSinkTo(
        Streams.dedupedStream(Streams.currentWeatherStream(spark, inDir)),
        sink, Seq("city_id", "dt"))
      .option("checkpointLocation", ckDir)
      .start()
    q.awaitTermination()
    val back = sink.read(spark)
    assert(back.count() === 2)
    assert(back.agg(max("temp")).head().getDouble(0) === 23.0)
  }

  test("streaming micro-batches merge into the TRANSACTIONAL parquet sink; versions advance per batch") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_txn_in").toString
    val ckDir = java.nio.file.Files.createTempDirectory("graft_txn_ck").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_txn_out").toString
    def payload(dt: Long, temp: Double) =
      s"""{"coord":{"lon":105.8,"lat":21.0},"weather":[{"id":802,"main":"Clouds","description":"x","icon":"03d"}],
         |"main":{"temp":$temp,"feels_like":21.0,"temp_min":$temp,"temp_max":$temp,"pressure":1021,"humidity":37},
         |"wind":{"speed":4.0,"deg":355},"clouds":{"all":34},"dt":$dt,
         |"sys":{"country":"VN","sunrise":1764112440,"sunset":1764152047},
         |"timezone":25200,"id":1581130,"name":"Hanoi","cod":200}""".stripMargin.replace("\n", "")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/a.json"), payload(1764129959, 22.0))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/b.json"), payload(1764133559, 23.0))

    val sink = graft.sources.TxnParquet.TxnParquetSink(outDir)
    val q = Streams.upsertSinkTo(
        Streams.dedupedStream(Streams.currentWeatherStream(spark, inDir)),
        sink, Seq("city_id", "dt"))
      .option("checkpointLocation", ckDir)
      .start()
    q.awaitTermination()
    val back = sink.read(spark)
    assert(back.count() === 2)
    assert(back.agg(max("temp")).head().getDouble(0) === 23.0)
    assert(sink.version(spark).exists(_ >= 1L))
    // replay the SAME files through a fresh checkpoint: the last-wins
    // merge is idempotent, so the committed table is unchanged
    val ck2 = java.nio.file.Files.createTempDirectory("graft_txn_ck2").toString
    val q2 = Streams.upsertSinkTo(
        Streams.dedupedStream(Streams.currentWeatherStream(spark, inDir)),
        sink, Seq("city_id", "dt"))
      .option("checkpointLocation", ck2)
      .start()
    q2.awaitTermination()
    assert(sink.read(spark).count() === 2)
    assert(sink.read(spark).agg(max("temp")).head().getDouble(0) === 23.0)
  }

  test("streaming ingest end-to-end: json drop → flatten → dedup → upsert sink, idempotent") {
    val inDir  = java.nio.file.Files.createTempDirectory("graft_json_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_fact_out").toString
    val ckDir  = java.nio.file.Files.createTempDirectory("graft_ck").toString
    val payload =
      """{"coord":{"lon":105.8,"lat":21.0},"weather":[{"id":802,"main":"Clouds","description":"x","icon":"03d"}],
        |"main":{"temp":22.0,"feels_like":21.0,"temp_min":22.0,"temp_max":22.0,"pressure":1021,"humidity":37},
        |"wind":{"speed":4.0,"deg":355},"clouds":{"all":34},"dt":1764129959,
        |"sys":{"country":"VN","sunrise":1764112440,"sunset":1764152047},
        |"timezone":25200,"id":1581130,"name":"Hanoi","cod":200}""".stripMargin.replace("\n", "")
    // duplicate payload in two files → dedup must collapse to one fact row
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/a.json"), payload)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$inDir/b.json"), payload)

    def runOnce(): Unit = {
      val flat = Streams.currentWeatherStream(spark, inDir)
      val q = Streams.upsertSink(Streams.dedupedStream(flat), outDir)
        .option("checkpointLocation", ckDir)
        .start()
      q.awaitTermination()
    }
    runOnce()
    val after1 = Store.readFact(spark, outDir)
    assert(after1.count() === 1)
    assert(after1.head().getAs[Double]("temp") === 22.0)

    // replay with a fresh checkpoint (simulates a re-run of the same hour)
    val ck2 = java.nio.file.Files.createTempDirectory("graft_ck2").toString
    val flat2 = Streams.currentWeatherStream(spark, inDir)
    val q2 = Streams.upsertSink(Streams.dedupedStream(flat2), outDir)
      .option("checkpointLocation", ck2)
      .start()
    q2.awaitTermination()
    assert(Store.readFact(spark, outDir).count() === 1) // idempotent
  }

  test("streaming corpus admission: batches dedup against the growing corpus, replay admits nothing") {
    import graft.operators.IncrementalDedup
    def txt(tag: String, i: Long) =
      s"$tag $i " + (0 until 12).map(k => s"${tag}${i}_$k").mkString(" ")

    val base = java.nio.file.Files.createTempDirectory("graft_corpus_adm").toString
    val corpusDir = s"$base/corpus"; val indexDir = s"$base/index"
    val inDir = s"$base/in"; new java.io.File(inDir).mkdirs()

    // seed corpus + index
    val seed = (0L until 20L).map(i => (i, txt("c", i))).toDF("doc_id", "text")
    seed.write.parquet(corpusDir)
    IncrementalDedup.writeIndex(seed, indexDir)

    def runAvailable(ck: String): Unit = {
      val docs = spark.readStream.schema(seed.schema).parquet(inDir)
      val q = Streams.corpusAdmissionSink(docs, corpusDir, indexDir)
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
    }

    // the file-drop source wants FILES in inDir, not parquet directories
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_adm_drop").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(inDir, name))
    }

    // batch 1: one near-dup of the seed corpus + two fresh docs
    drop(Seq((100L, txt("c", 3L) + " EDITED"), (101L, txt("n", 1L)), (102L, txt("n", 2L)))
      .toDF("doc_id", "text"), "b1.parquet")
    val ck = java.nio.file.Files.createTempDirectory("graft_adm_ck").toString
    runAvailable(ck)
    val afterB1 = spark.read.parquet(corpusDir)
    assert(afterB1.count() === 22) // 20 seed + 2 fresh; the edit was rejected
    assert(afterB1.filter($"doc_id" === 100L).count() === 0)

    // batch 2: a near-dup of a doc admitted in batch 1 — caught via the
    // appended index, plus one fresh doc
    drop(Seq((200L, txt("n", 1L) + " AGAIN"), (201L, txt("f", 9L)))
      .toDF("doc_id", "text"), "b2.parquet")
    runAvailable(ck)
    val afterB2 = spark.read.parquet(corpusDir)
    assert(afterB2.count() === 23)
    assert(afterB2.filter($"doc_id" === 200L).count() === 0)
    assert(afterB2.filter($"doc_id" === 201L).count() === 1)

    // replay batch 2 with a fresh checkpoint: its docs are in the index
    // now, so every one is its own duplicate — nothing re-admits
    val ck2 = java.nio.file.Files.createTempDirectory("graft_adm_ck2").toString
    runAvailable(ck2)
    assert(spark.read.parquet(corpusDir).count() === 23) // idempotent
  }

  test("corpus admission bootstraps from nothing: first batch creates corpus and index") {
    def txt(i: Long) = s"boot $i " + (0 until 12).map(k => s"b${i}_$k").mkString(" ")
    val base = java.nio.file.Files.createTempDirectory("graft_adm_boot").toString
    val corpusDir = s"$base/corpus"; val indexDir = s"$base/index"
    val inDir = s"$base/in"; new java.io.File(inDir).mkdirs()
    val schema = Seq((0L, "x")).toDF("doc_id", "text").schema

    val tmp = java.nio.file.Files.createTempDirectory("graft_boot_drop").toString
    (0L until 5L).map(i => (i, txt(i))).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(inDir, "b0.parquet"))

    val ck = java.nio.file.Files.createTempDirectory("graft_boot_ck").toString
    val q = Streams.corpusAdmissionSink(
      spark.readStream.schema(schema).parquet(inDir), corpusDir, indexDir)
      .option("checkpointLocation", ck)
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(corpusDir).count() === 5)
    assert(spark.read.parquet(indexDir).count() > 0)
  }

  test("left-outer stream-stream join: unmatched clicks emit NULL-padded " +
      "ONLY after the watermark clears their window") {
    import spark.implicits._
    def t(min: Int) = new java.sql.Timestamp(1704067200000L + 60000L * min)
    // user 1: click at t0 converts at t10 (inside the 1h horizon)
    // user 2: click at t0 never converts -> must surface as NULL row,
    //   but only once the watermark (2h delay) passes t0 + 1h
    val phase1 = Seq(
      (1L, t(0), 1L, "click", 0.0),
      (1L, t(10), 2L, "purchase", 9.5),
      (2L, t(0), 3L, "click", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val inDir = java.nio.file.Files.createTempDirectory("graft_ssj_outer").toString
    def feed(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ssj_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }
    feed(phase1, "p1")

    val schema = phase1.schema
    val streamed = spark.readStream.schema(schema).parquet(inDir)
    val q = Streams.attributedPurchasesOuter(streamed)
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_outer").start()
    q.processAllAvailable()
    val early = spark.table("ssj_outer").collect()
    // the match emits promptly; user 2's NULL row must NOT have emitted
    // yet (watermark has not cleared its window)
    assert(early.map(_.getLong(1)).toSet === Set(1L))
    assert(early.head.getLong(3) === 2L && early.head.getDouble(4) === 9.5)

    // heartbeat events far in the future advance BOTH watermarks past
    // user 2's whole window -> the unmatched row becomes provable
    val heartbeat = Seq(
      (999L, t(600), 90L, "click", 0.0),
      (999L, t(600), 91L, "purchase", 1.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    feed(heartbeat, "p2")
    q.processAllAvailable()
    // one more empty-ish cycle lets the new watermark evict state
    q.processAllAvailable()
    q.stop()
    val late = spark.table("ssj_outer").collect()
    val u2 = late.filter(_.getLong(1) === 3L)
    assert(u2.length === 1, s"unmatched click must emit exactly once: ${late.toSeq}")
    assert(u2.head.isNullAt(3) && u2.head.isNullAt(4))

    // batch oracle: the same frame through the same operator (plain
    // left-outer interval join) agrees on the non-heartbeat rows
    val batch = Streams.attributedPurchasesOuter(
        phase1.unionByName(heartbeat))
      .filter(col("user_id") =!= 999L)
      .select("user_id", "click_id", "purchase_id")
      .collect().map(_.toSeq).toSet
    val stream = late.filter(_.getLong(1) != 90L)
      .map(r => Seq(r.get(0), r.get(1), r.get(3))).toSet
    assert(stream.subsetOf(batch))
    assert(batch.map(_(1)).subsetOf(stream.map(_(1)) + 90L),
      "every non-heartbeat click accounted for")
  }

  test("streaming KMV distinct == batch kmvSignatures estimate under replay") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_kmv_in").toString
    // enough distinct values per key to overflow k=16 (the estimator
    // path), split across two batches with overlap (state must dedup)
    def ev(lo: Int, hi: Int) = (lo until hi).flatMap(i =>
      Seq(("a", s"u$i"), ("b", s"v${i % 9}")))
      .toDF("key", "v")
    def feed(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_kmv_st").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }
    val schema = ev(0, 1).schema
    val q = Streams.kmvDistinctStream(
        spark.readStream.schema(schema).parquet(inDir),
        col("key"), col("v"), k = 16)
      .writeStream.outputMode("update").format("memory")
      .queryName("kmv_out").start()
    feed(ev(0, 40), "p1"); q.processAllAvailable()
    feed(ev(30, 80), "p2"); q.processAllAvailable() // overlap 30..40
    q.stop()
    // n_sig/est are NON-DECREASING per key, so the final state is the
    // max across update-mode emissions
    val got = spark.table("kmv_out")
      .groupBy("key").agg(max("n_sig").as("n_sig"),
        max("distinct_est").as("est"))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2)))).toMap
    val want = graft.operators.Sketches
      .kmvSignatures(ev(0, 80), col("key"), col("v"), 16)
      .select(col("key"), col("n_sig"),
        graft.operators.Sketches.kmvDistinctEst(col("sig"), 16).as("est"))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2)))).toMap
    assert(got === want) // bit-identical, estimator path AND exact path
    assert(want("a")._1 === 16 && want("b")._2 === 9.0,
      "fixture must exercise both the truncated and the exact regime")
  }

  test("streaming sessionization == batch sessionStats under replay, " +
      "late bridging event, timeout-boundary join") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_sess_in").toString
    def ev(rows: (Long, String, Long, String)*) = rows
      .toDF("entity", "ts", "tie", "label")
      .withColumn("ts", col("ts").cast("timestamp"))
    def feed(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sess_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }
    // gap 30 min, watermark 2 h. Entity 1: events 10:00/10:20, then one
    // at EXACTLY end+gap (10:50 — must join, the <= gap batch rule), and
    // a 12:00 event (a new session) arriving in batch 2. Entity 2:
    // fragments at 09:00 and 09:50 land in batch 1 (two open sessions,
    // 50 min apart), and the BRIDGING event at 09:25 arrives late in
    // batch 2 — inside the watermark (batch-1 max is 10:50, so the
    // batch-2 watermark is 08:50) — so the fragments must MERGE into
    // one session.
    val gapUs = 30L * 60 * 1000000
    val phase1 = ev(
      (1L, "2026-01-01 10:00:00", 100L, "a"),
      (1L, "2026-01-01 10:20:00", 101L, "b"),
      (1L, "2026-01-01 10:50:00", 102L, "c"),
      (2L, "2026-01-01 09:00:00", 200L, "x"),
      (2L, "2026-01-01 09:50:00", 201L, "y"))
    val phase2 = ev(
      (2L, "2026-01-01 09:25:00", 202L, "z"),
      (1L, "2026-01-01 12:00:00", 103L, "d"))
    // heartbeat entity pushes the watermark far past every session so
    // all state times out and emits
    val flush = ev((999L, "2026-01-02 12:00:00", 900L, "hb"))

    val schema = phase1.schema
    val streamed = spark.readStream.schema(schema).parquet(inDir)
    val q = Streams.sessionStatsStream(streamed, gapUs, watermark = "2 hours")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    feed(phase1, "p1"); q.processAllAvailable()
    feed(phase2, "p2"); q.processAllAvailable()
    feed(flush, "p3"); q.processAllAvailable()
    q.processAllAvailable() // timeout pass under the advanced watermark
    q.stop()

    val got = spark.table("sess_out")
      .filter(col("entity") =!= 999L)
      .orderBy("entity", "session_seq")
      .collect().map(_.toSeq).toSeq
    val want = graft.operators.Analytics.sessionStats(
        phase1.unionByName(phase2), col("entity"),
        unix_micros(col("ts")), gapUs, col("tie"), col("label"))
      .collect().map(_.toSeq).toSeq
    assert(got === want)
    // the late bridge really merged: entity 2 has ONE 50-minute session
    val e2 = got.filter(_.head == 2L)
    assert(e2.length === 1 && e2.head(5) == 3L, s"bridge failed: $e2")
    // the boundary event joined: entity 1's first session spans to 10:50
    val e1 = got.filter(_.head == 1L)
    assert(e1.length === 2 && e1.head(5) == 3L && e1.head(7) == "c",
      s"end+gap event must join the session: $e1")
  }

  test("tombstone TTL bounds session-stream state: drops counted, seq restarts") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_ttl_in").toString
    def ev(rows: (Long, String, Long, String)*) = rows
      .toDF("entity", "ts", "tie", "label")
      .withColumn("ts", col("ts").cast("timestamp"))
    def feed(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ttl_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }
    // pathological shape: many touch-once entities (each one session,
    // never seen again) — without a TTL every one leaves a permanent
    // tombstone; with a 2 h TTL their state must be DROPPED once the
    // watermark passes session_end + ttl, visibly counted
    val gapUs = 30L * 60 * 1000000
    val dropped = spark.sparkContext.longAccumulator("graft_sess_tombstones")
    val onceOff = (1L to 50L).map(e =>
      (e, "2026-01-01 08:00:00", e, "x"))
    val phase1 = ev(onceOff: _*)
    // heartbeats advance the watermark in two hops: first enough to
    // FINALIZE the 08:00 sessions (tombstones form), then past
    // end + ttl so the TTL sweep fires
    val hb1 = ev((999L, "2026-01-01 12:00:00", 900L, "hb"))
    val hb2 = ev((999L, "2026-01-02 12:00:00", 901L, "hb"))
    // entity 1 reappears AFTER its tombstone was dropped: seq restarts
    val phase2 = ev((1L, "2026-01-02 13:00:00", 1000L, "y"))
    val hb3 = ev((999L, "2026-01-03 12:00:00", 902L, "hb"))

    val schema = phase1.schema
    val streamed = spark.readStream.schema(schema).parquet(inDir)
    val q = Streams.sessionStatsStream(streamed, gapUs,
        watermark = "1 hour",
        tombstoneTtlUs = Some(2L * 3600 * 1000000),
        droppedTombstones = Some(dropped))
      .writeStream.outputMode("append").format("memory")
      .queryName("ttl_out").start()
    feed(phase1, "p1"); q.processAllAvailable()
    feed(hb1, "p2"); q.processAllAvailable()
    feed(hb2, "p3"); q.processAllAvailable()
    q.processAllAvailable()
    val droppedAfterSweep = dropped.value
    feed(phase2, "p4"); q.processAllAvailable()
    feed(hb3, "p5"); q.processAllAvailable()
    q.processAllAvailable()
    q.stop()

    assert(droppedAfterSweep === 50L,
      s"all 50 touch-once tombstones must be dropped, got $droppedAfterSweep")
    val e1 = spark.table("ttl_out").filter(col("entity") === 1L)
      .orderBy("session_start_us")
      .select("session_seq").collect().map(_.getLong(0)).toSeq
    // both sessions numbered 1: the second because the tombstone (and
    // its counter) was TTL-dropped before the entity reappeared — the
    // documented trade for bounded state
    assert(e1 === Seq(1L, 1L), s"seq must restart after a TTL drop: $e1")
  }
}
