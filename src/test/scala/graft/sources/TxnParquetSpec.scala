package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SharedSpark
import graft.sources.TxnParquet.TxnParquetSink

/** The commit-protocol contract: a merge is ATOMIC — a writer killed at
  * any point before the manifest rename leaves the previous state live
  * and byte-identical; replaying the batch lands the post-state. Parity
  * with the reference's one-transaction-per-run Postgres load
  * (dags/etl.py:138). */
class TxnParquetSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("txnparquet").toString

  private val keys = Seq("city_id", "dt")

  private def df(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("city_id", "dt", "temp")
      .withColumn("dt", col("dt").cast("timestamp"))

  private def snapshot(sink: TxnParquetSink): Set[(Long, String, Double)] =
    sink.read(spark).collect().map(r => (r.getLong(0),
      r.getTimestamp(1).toString, r.getDouble(2))).toSet

  test("merge + read round-trips, incremental across dates, versions advance") {
    val path = tmp()
    val sink = TxnParquetSink(path)
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 22.0),
      (2L, "2025-11-27 05:00:00", 25.0)), keys)
    assert(sink.version(spark) === Some(1L))
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 99.0),
      (3L, "2025-11-26 06:00:00", 30.0)), keys)
    assert(sink.version(spark) === Some(2L))
    assert(snapshot(sink) === Set(
      (1L, "2025-11-26 04:00:00.0", 99.0),
      (2L, "2025-11-27 05:00:00.0", 25.0),
      (3L, "2025-11-26 06:00:00.0", 30.0)))
    // DO NOTHING: existing key keeps its value, absent key appends
    sink.mergeIfAbsent(df((3L, "2025-11-26 06:00:00", -1.0),
      (4L, "2025-11-28 07:00:00", 40.0)), keys)
    assert(snapshot(sink).contains((3L, "2025-11-26 06:00:00.0", 30.0)))
    assert(snapshot(sink).contains((4L, "2025-11-28 07:00:00.0", 40.0)))
    // pruned read touches only the asked dates
    val pruned = sink.prunedRead(spark,
        Seq(java.sql.Date.valueOf("2025-11-26"))).collect()
    assert(pruned.map(_.getLong(0)).toSet === Set(1L, 3L))
  }

  test("kill-mid-merge: pre-state or post-state, never partial") {
    val path = tmp()
    TxnParquetSink(path).mergeLastWins(
      df((1L, "2025-11-26 04:00:00", 22.0), (2L, "2025-11-27 05:00:00", 25.0)),
      keys)
    val pre = snapshot(TxnParquetSink(path))
    val preVersion = TxnParquetSink(path).version(spark)

    // writer dies AFTER staging all data and the tmp manifest, BEFORE the
    // atomic rename — the worst possible moment
    val dying = TxnParquetSink(path,
      crashBeforeCommit = () => throw new RuntimeException("kill -9"))
    val batch = df((1L, "2025-11-26 04:00:00", 99.0),
      (5L, "2025-11-27 09:00:00", 55.0))
    intercept[RuntimeException](dying.mergeLastWins(batch, keys))

    // pre-state is live and byte-identical: same version, same rows
    val after = TxnParquetSink(path)
    assert(after.version(spark) === preVersion)
    assert(snapshot(after) === pre)

    // replaying the batch on a healthy writer lands exactly the post-state
    after.mergeLastWins(batch, keys)
    assert(snapshot(after) === Set(
      (1L, "2025-11-26 04:00:00.0", 99.0),
      (2L, "2025-11-27 05:00:00.0", 25.0),
      (5L, "2025-11-27 09:00:00.0", 55.0)))
    // the crashed attempt's orphan chunk was swept by the commit's GC:
    // every surviving chunk dir is referenced by a kept manifest
    val dataDir = new java.io.File(path, "data")
    val chunks = dataDir.listFiles().filter(_.isDirectory).map(_.getName).toSet
    val referenced = (1L to 2L).flatMap { v =>
      val m = new java.io.File(path, s"_graft/manifest-$v.txt")
      if (m.exists())
        scala.io.Source.fromFile(m).getLines().drop(1)
          .filterNot(_.startsWith("schema\t"))
          .map(_.split("\t")(1).split("/p_dir=")(0).stripPrefix("data/")).toSeq
      else Seq.empty
    }.toSet
    assert(chunks === referenced)
  }

  test("kill-DURING-chunk-write: failed stage job leaves pre-state live; " +
      "replay lands post-state; orphan swept") {
    // Completes the crash matrix's earliest corner: the writer dies
    // while the chunk parquet job is still running (before the tmp
    // manifest even exists) — a real mid-job executor failure, induced
    // by a raise_error that fires on one row of the batch.
    val path = tmp()
    TxnParquetSink(path).mergeLastWins(
      df((1L, "2025-11-26 04:00:00", 22.0), (2L, "2025-11-27 05:00:00", 25.0)),
      keys)
    val pre = snapshot(TxnParquetSink(path))
    val preVersion = TxnParquetSink(path).version(spark)

    val poisoned = df((1L, "2025-11-26 04:00:00", 99.0),
      (5L, "2025-11-27 09:00:00", 55.0))
      .withColumn("temp", when(col("city_id") === 5L,
        raise_error(lit("kill during chunk write"))).otherwise(col("temp")))
    intercept[Exception](TxnParquetSink(path).mergeLastWins(poisoned, keys))

    // pre-state live and byte-identical; the half-written chunk is
    // invisible (no manifest references it)
    val after = TxnParquetSink(path)
    assert(after.version(spark) === preVersion)
    assert(snapshot(after) === pre)

    // a healthy replay commits; its GC sweeps the dead chunk dir
    after.mergeLastWins(df((1L, "2025-11-26 04:00:00", 99.0),
      (5L, "2025-11-27 09:00:00", 55.0)), keys)
    assert(snapshot(after) === Set(
      (1L, "2025-11-26 04:00:00.0", 99.0),
      (2L, "2025-11-27 05:00:00.0", 25.0),
      (5L, "2025-11-27 09:00:00.0", 55.0)))
    val chunks = new java.io.File(path, "data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val referenced = (1L to 2L).flatMap { v =>
      val m = new java.io.File(path, s"_graft/manifest-$v.txt")
      if (m.exists())
        scala.io.Source.fromFile(m).getLines().drop(1)
          .filterNot(_.startsWith("schema\t"))
          .map(_.split("\t")(1).split("/p_dir=")(0).stripPrefix("data/")).toSeq
      else Seq.empty
    }.toSet
    assert(chunks === referenced,
      s"crashed chunk not swept: chunks=$chunks referenced=$referenced")
  }

  test("concurrent reader pinned to an old manifest keeps reading it " +
      "byte-identically across later commits (grace window)") {
    val path = tmp()
    val sink = TxnParquetSink(path, keepManifests = 4)
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 22.0),
      (2L, "2025-11-27 05:00:00", 25.0)), keys)
    // reader resolves the manifest NOW (v1) — chunk paths are fixed at
    // plan time, exactly how a long-running query pins its snapshot
    val pinned = sink.read(spark)
    val v1Rows = Set((1L, "2025-11-26 04:00:00.0", 22.0),
      (2L, "2025-11-27 05:00:00.0", 25.0))
    // two later commits REWRITE both of v1's dates (so v1's chunks are
    // obsolete, kept alive only by the manifest grace window)
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 91.0)), keys)
    sink.mergeLastWins(df((2L, "2025-11-27 05:00:00", 92.0)), keys)
    assert(sink.version(spark) === Some(3L))
    // the pinned reader still sees v1, byte-identically
    val got = pinned.collect().map(r => (r.getLong(0),
      r.getTimestamp(1).toString, r.getDouble(2))).toSet
    assert(got === v1Rows, "pinned reader must keep its snapshot")
    // a fresh reader sees v3
    assert(snapshot(sink) === Set(
      (1L, "2025-11-26 04:00:00.0", 91.0),
      (2L, "2025-11-27 05:00:00.0", 92.0)))
    // and v1's chunks are still on disk because manifest-1 is within the
    // keepManifests=4 window — the documented reader-grace contract
    val m1 = new java.io.File(path, "_graft/manifest-1.txt")
    assert(m1.exists(), "grace window must retain the pinned manifest")
  }

  test("time travel: readVersion serves each kept version exactly; " +
      "GC'd versions fail loudly") {
    val path = tmp()
    val sink = TxnParquetSink(path, keepManifests = 2)
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 10.0)), keys)
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 20.0)), keys)
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 30.0)), keys)
    def tempAt(v: Long): Double = sink.readVersion(spark, v)
      .collect().head.getDouble(2)
    assert(tempAt(3L) === 30.0)
    assert(tempAt(2L) === 20.0) // within the keep-2 window
    // v1 is past the window: loud failure, never a silently wrong read
    val e = intercept[IllegalArgumentException](sink.readVersion(spark, 1L))
    assert(e.getMessage.contains("version 1 is not available"))
    assert(e.getMessage.contains("live=3"))
  }

  test("optimistic concurrency: a second commit of the same version throws, table intact") {
    val path = tmp()
    val sink = TxnParquetSink(path)
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 22.0)), keys)
    // simulate a racing writer that committed v2 while we were staging:
    // plant manifest-2 before our commit's rename fires
    val racing = TxnParquetSink(path, crashBeforeCommit = () => {
      val src = new java.io.File(path, "_graft/manifest-1.txt")
      val dst = new java.io.File(path, "_graft/manifest-2.txt")
      Files.copy(src.toPath, dst.toPath)
      ()
    })
    intercept[java.util.ConcurrentModificationException](
      racing.mergeLastWins(df((9L, "2025-11-26 08:00:00", 9.0)), keys))
    // the loser did not corrupt anything: v2 (the planted one) is live
    // and carries v1's content
    assert(snapshot(TxnParquetSink(path)) ===
      Set((1L, "2025-11-26 04:00:00.0", 22.0)))
  }

  test("manifest window GC keeps the last K versions and their chunks readable") {
    val path = tmp()
    val sink = TxnParquetSink(path, keepManifests = 2)
    (1 to 5).foreach(i =>
      sink.mergeLastWins(df((i.toLong, "2025-11-26 04:00:00", i.toDouble)), keys))
    assert(sink.version(spark) === Some(5L))
    val gdir = new java.io.File(path, "_graft")
    val manifests = gdir.listFiles().map(_.getName).filter(_.startsWith("manifest-")).toSet
    assert(manifests === Set("manifest-4.txt", "manifest-5.txt"))
    // all five keys still present (same date chunk rewritten each merge)
    assert(snapshot(sink).map(_._1) === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("vacuum: shrinks retention now, pinned-version reads fail loudly after") {
    val path = tmp()
    val sink = TxnParquetSink(path, keepManifests = 4)
    (1 to 3).foreach(i =>
      sink.mergeLastWins(df((i.toLong, "2025-11-26 04:00:00", i.toDouble)), keys))
    // all three versions in the window before vacuum
    assert(sink.readVersion(spark, 1L).count() === 1L)
    assert(sink.readVersion(spark, 2L).count() === 2L)
    sink.vacuum(spark, retain = 1)
    val gdir = new java.io.File(path, "_graft")
    assert(gdir.listFiles().map(_.getName)
      .filter(_.startsWith("manifest-")).toSet === Set("manifest-3.txt"))
    // vacuumed versions fail LOUDLY, the live read is untouched
    intercept[IllegalArgumentException](sink.readVersion(spark, 1L))
    intercept[IllegalArgumentException](sink.readVersion(spark, 2L))
    assert(snapshot(sink).map(_._1) === Set(1L, 2L, 3L))
    // on-disk chunks = exactly the live manifest's references
    val dataDirs = new java.io.File(path, "data").listFiles()
      .filter(_.isDirectory).map(n => s"data/${n.getName}").toSet
    val referenced = TxnParquet.currentManifest(spark, path).get._2
      .values.map(_.split("/p_dir=", 2)(0)).toSet
    assert(dataDirs === referenced)
    // vacuum below 1 is rejected; vacuum on an empty table is a no-op
    intercept[IllegalArgumentException](sink.vacuum(spark, retain = 0))
    TxnParquetSink(tmp()).vacuum(spark) // must not throw
  }

  test("null event dates ride the merge like any other partition") {
    val path = tmp()
    val sink = TxnParquetSink(path)
    val withNull = Seq((1L, Some("2025-11-26 04:00:00"), 22.0),
      (2L, None, 25.0)).toDF("city_id", "dt", "temp")
      .withColumn("dt", col("dt").cast("timestamp"))
    sink.mergeLastWins(withNull, keys)
    val rows = sink.read(spark).collect()
    assert(rows.length === 2)
    assert(rows.count(_.isNullAt(1)) === 1)
  }

  test("compact: content identical, one chunk + one file per date, " +
      "pinned pre-compact versions intact") {
    val path = tmp()
    val sink = TxnParquetSink(path)
    // three merges scatter three dates across three chunk dirs
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 22.0)), keys)
    sink.mergeLastWins(df((2L, "2025-11-27 05:00:00", 25.0)), keys)
    sink.mergeLastWins(df((3L, "2025-11-28 06:00:00", 30.0),
      (1L, "2025-11-26 04:00:00", 99.0)), keys)
    val before = snapshot(sink)
    def chunkDirs() = new java.io.File(path, "data").listFiles()
      .filter(_.isDirectory).toSeq
    assert(chunkDirs().size === 3)

    sink.compact(spark)
    assert(sink.version(spark) === Some(4L))
    assert(snapshot(sink) === before)
    // the live manifest points every date into ONE chunk, one file each
    val live = TxnParquet.currentManifest(spark, path).get._2
    assert(live.values.map(_.split("/p_dir=", 2)(0)).toSet.size === 1)
    live.values.foreach { rel =>
      val files = new java.io.File(path, rel).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1)
    }
    // a reader pinned to the pre-compact version still sees its snapshot
    assert(sink.readVersion(spark, 3L).collect().map(r => (r.getLong(0),
      r.getTimestamp(1).toString, r.getDouble(2))).toSet === before)
    // vacuum to the live version: only the compacted chunk survives
    sink.vacuum(spark, retain = 1)
    assert(chunkDirs().size === 1)
    assert(snapshot(sink) === before)
  }

  test("compactSmall: bin-packs only fragmented small dates; healthy " +
      "chunks untouched byte-for-byte; pinned reader safe across the swap") {
    val path = tmp()
    val sink = TxnParquetSink(path)
    // one merge writes two dates; the 26th gets many rows spread over
    // several part files (repartition by (p_date, keys) fans them out),
    // the 27th gets one row
    val many = (1L to 40L).map(i => (i, "2025-11-26 04:00:00", i * 1.0)) :+
      ((99L, "2025-11-27 05:00:00", 25.0))
    // AQE's tiny-data coalescing would land this KB-scale merge in one
    // task (one file per date) — disable it for the fixture write so the
    // 26th fans out across the 4 shuffle partitions like a real batch
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try sink.mergeLastWins(df(many: _*), keys)
    finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
    val before = snapshot(sink)
    val manifestBefore = TxnParquet.currentManifest(spark, path).get._2
    def fileStats(rel: String): (Int, Long) = {
      val fl = new java.io.File(path, rel).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      (fl.length, fl.map(_.length).sum)
    }
    val fragBefore = fileStats(manifestBefore("2025-11-26"))
    assert(fragBefore._1 > 1, "fixture must start fragmented")
    val healthyRel = manifestBefore("2025-11-27")
    val healthyBytes = java.nio.file.Files.readAllBytes(
      new java.io.File(path, healthyRel).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath)

    // a reader pins v1 BEFORE the swap
    val pinnedV = sink.version(spark).get
    val n = sink.compactSmall(spark)
    assert(n === 1, "only the fragmented small date is rewritten " +
      "(the 27th is already one file and must be skipped)")
    assert(sink.version(spark) === Some(pinnedV + 1))
    assert(snapshot(sink) === before, "compaction must not change content")
    val manifestAfter = TxnParquet.currentManifest(spark, path).get._2
    val fragAfter = fileStats(manifestAfter("2025-11-26"))
    assert(fragAfter._1 === 1, "rewritten date collapses to one file")
    // pinned reader still sees its snapshot, from the ORIGINAL chunks
    assert(sink.readVersion(spark, pinnedV).collect().map(r =>
      (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2))).toSet
      === before)
    val healthyAfter = java.nio.file.Files.readAllBytes(
      new java.io.File(path, healthyRel).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath)
    assert(java.util.Arrays.equals(healthyBytes, healthyAfter),
      "pre-swap chunk files must survive byte-identically for pinned readers")
    // second pass: nothing fragmented remains → no commit, version pinned
    assert(sink.compactSmall(spark) === 0)
    assert(sink.version(spark) === Some(pinnedV + 1))
    // empty table: no-op returning 0
    assert(TxnParquetSink(tmp()).compactSmall(spark) === 0)
  }

  test("compact: crash before commit leaves the table untouched; " +
      "empty table is a no-op") {
    val path = tmp()
    var arm = false
    val sink = TxnParquetSink(path,
      crashBeforeCommit = () => if (arm) sys.error("die mid-compact"))
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 22.0),
      (2L, "2025-11-27 05:00:00", 25.0)), keys)
    val before = snapshot(sink)
    arm = true
    intercept[RuntimeException](sink.compact(spark))
    arm = false
    assert(sink.version(spark) === Some(1L))
    assert(snapshot(sink) === before)
    // replaying compaction after the crash succeeds (orphan swept by GC)
    sink.compact(spark)
    assert(sink.version(spark) === Some(2L))
    assert(snapshot(sink) === before)
    TxnParquetSink(tmp()).compact(spark) // empty table: must not throw
  }

  test("schema evolution: added column surfaces as typed NULL on old rows and old dates") {
    val path = tmp()
    val sink = TxnParquetSink(path)
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 22.0),
      (2L, "2025-11-27 05:00:00", 25.0)), keys)
    // v2 adds a 'hum' column and touches ONLY the 26th
    val wide = Seq((3L, "2025-11-26 08:00:00", 30.0, Some(71L)))
      .toDF("city_id", "dt", "temp", "hum")
      .withColumn("dt", col("dt").cast("timestamp"))
    sink.mergeLastWins(wide, keys)
    val out = sink.read(spark)
    assert(out.columns.toSeq === Seq("city_id", "dt", "temp", "hum"))
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getLong(3) === 71L)
    assert(byId(1L).isNullAt(3), "old row in a touched date: typed NULL")
    assert(byId(2L).isNullAt(3), "row in an UNTOUCHED date chunk: the " +
      "manifest schema must widen the read, not first-file inference")
    // pruned read of the untouched date also carries the live schema
    val pruned = sink.prunedRead(spark,
      Seq(java.sql.Date.valueOf("2025-11-27")))
    assert(pruned.columns.contains("hum") &&
      pruned.collect().head.isNullAt(3))
  }

  test("schema evolution: time travel keeps each version's own schema; compact preserves width") {
    val path = tmp()
    val sink = TxnParquetSink(path)
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 22.0)), keys)
    val wide = Seq((2L, "2025-11-27 05:00:00", 25.0, Some(60L)))
      .toDF("city_id", "dt", "temp", "hum")
      .withColumn("dt", col("dt").cast("timestamp"))
    sink.mergeLastWins(wide, keys)
    assert(!sink.readVersion(spark, 1L).columns.contains("hum"),
      "the pre-evolution snapshot reads back with its own columns")
    assert(sink.readVersion(spark, 2L).columns.contains("hum"))
    sink.compact(spark)
    val compacted = sink.read(spark)
    assert(compacted.columns.contains("hum"))
    assert(compacted.collect().map(r =>
      r.getLong(0) -> r.isNullAt(3)).toMap === Map(1L -> true, 2L -> false))
  }

  test("schema evolution: dropping or re-typing a column fails loudly") {
    val path = tmp()
    val sink = TxnParquetSink(path)
    sink.mergeLastWins(df((1L, "2025-11-26 04:00:00", 22.0)), keys)
    val narrower = Seq((2L, "2025-11-26 09:00:00"))
      .toDF("city_id", "dt")
      .withColumn("dt", col("dt").cast("timestamp"))
    val e1 = intercept[IllegalArgumentException] {
      sink.mergeLastWins(narrower, keys)
    }
    assert(e1.getMessage.contains("missing existing table column"))
    val retyped = Seq((2L, "2025-11-26 09:00:00", "hot"))
      .toDF("city_id", "dt", "temp")
      .withColumn("dt", col("dt").cast("timestamp"))
    val e2 = intercept[IllegalArgumentException] {
      sink.mergeLastWins(retyped, keys)
    }
    assert(e2.getMessage.contains("re-types column"))
    // the failed merges left the table intact
    assert(snapshot(sink) === Set((1L, "2025-11-26 04:00:00.0", 22.0)))
  }
}
