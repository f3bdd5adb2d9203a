package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.weather.Store

/** Transactional plain-parquet [[MergeSink]]: a Delta-style miniature
  * commit protocol over immutable chunk directories, so a crashed merge
  * can never leave a torn table — readers see the pre-merge state or the
  * post-merge state, NOTHING in between. This is the plain-parquet
  * answer to the reference's one-transaction-per-run Postgres load
  * (dags/etl.py:138 `conn.commit()`; notebook c24 try/commit/rollback):
  * there, atomicity comes from the database; here, from a single atomic
  * manifest rename.
  *
  * Layout:
  * {{{
  *   root/_graft/manifest-<v>.txt     # the ONLY mutable truth (append-new)
  *   root/data/chunk-<uuid>/p_dir=<date>/part-*.parquet   # immutable
  * }}}
  *
  * A manifest maps each date to the one chunk subdirectory holding that
  * date's current rows (`p_date` is ALSO a regular column in the files,
  * so any set of chunk dirs reads back in one `spark.read.parquet`).
  * The live table state is the HIGHEST-numbered manifest.
  *
  * Commit = write data to a fresh chunk dir (invisible: no manifest
  * references it), write `manifest-<v+1>` under a temp name, then ONE
  * atomic rename to its final name. Rename-to-fresh-name is atomic on
  * POSIX and HDFS, and FAILS if the destination exists — which makes the
  * version number an optimistic-concurrency token: two racing writers
  * cannot both commit v+1, the loser throws instead of corrupting
  * (single-writer is still the supported contract; the rename check is
  * the belt to that suspender). A crash anywhere before the rename
  * leaves the previous manifest live and only an orphaned chunk on disk,
  * swept by the next successful commit's GC.
  *
  * Merges stay INCREMENTAL exactly like [[Store.mergeFactLastWins]]:
  * only the batch's touched dates are read (driver-side manifest lookup,
  * no listing), merged, and written; untouched dates keep pointing at
  * their existing chunks byte-identically.
  *
  * GC: at each successful commit the writer keeps the last
  * `keepManifests` manifests (a grace window for readers pinned to a
  * recent version) and deletes chunk dirs referenced by none of them —
  * including the orphans of crashed attempts.
  */
object TxnParquet {

  private val ManifestRe = "manifest-(\\d+)\\.txt".r
  private val NullKey = "null"

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) = {
    val root = new Path(path)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  /** Manifest body → (dateKey → chunk dir, committed schema). The
    * schema line (`schema\t<json>`, written since the schema-evolution
    * change) is optional — pre-evolution manifests parse fine and
    * simply carry no schema. */
  private def parseBody(text: String)
      : (Map[String, String], Option[org.apache.spark.sql.types.StructType]) = {
    val lines = text.linesIterator.filter(_.nonEmpty).drop(1).toSeq
    val (schemaLines, dateLines) = lines.partition(_.startsWith("schema\t"))
    val dates = dateLines.map { line =>
      val Array(k, d) = line.split("\t", 2)
      k -> d
    }.toMap
    val schema = schemaLines.headOption.map { l =>
      org.apache.spark.sql.types.DataType.fromJson(l.split("\t", 2)(1))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
    (dates, schema)
  }

  private def slurp(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 65536, false)
      bytes.toString("UTF-8")
    } finally in.close()
  }

  /** (version, dateKey → chunk-relative dir, committed schema) of the
    * live manifest. */
  private[sources] def currentManifest(spark: SparkSession, path: String)
      : Option[(Long, Map[String, String],
        Option[org.apache.spark.sql.types.StructType])] = {
    val (f, root) = fs(spark, path)
    val dir = new Path(root, "_graft")
    if (!f.exists(dir)) return None
    val versions = f.listStatus(dir).toSeq.flatMap(s => s.getPath.getName match {
      case ManifestRe(v) => Some(v.toLong)
      case _ => None
    })
    if (versions.isEmpty) return None
    val v = versions.max
    val (dates, schema) = parseBody(slurp(f, new Path(dir, s"manifest-$v.txt")))
    Some((v, dates, schema))
  }

  private def readManifestAt(f: FileSystem, dir: Path, v: Long)
      : (Map[String, String],
        Option[org.apache.spark.sql.types.StructType]) =
    parseBody(slurp(f, new Path(dir, s"manifest-$v.txt")))

  private def dateKey(d: java.sql.Date): String =
    if (d == null) NullKey else d.toString

  /** Transactional date-partitioned parquet sink. `crashBeforeCommit` is
    * a test seam invoked after ALL data is staged but before the atomic
    * manifest rename — a throw there models a writer dying mid-merge. */
  final case class TxnParquetSink(path: String, tsCol: String = "dt",
                                  keepManifests: Int = 4,
                                  crashBeforeCommit: () => Unit = () => ())
      extends DatePartitionedSink with VersionedSink {
    require(keepManifests >= 1, "must keep at least the live manifest")

    def mergeLastWins(updates: DataFrame, keys: Seq[String]): Unit =
      merge(updates, keys, Store.upsertLastWins)
    def mergeIfAbsent(updates: DataFrame, keys: Seq[String]): Unit =
      merge(updates, keys, Store.upsertDoNothing)

    /** Full rewrite (general MERGE write-back) under the SAME commit
      * protocol as merge: stage the whole table into a fresh chunk dir
      * (live files untouched, so `merged` may read the current table —
      * no checkpoint needed), then one atomic manifest swap whose date
      * mapping is exactly the new contents: days the rewrite deleted
      * simply vanish from the manifest. A crash leaves the old version
      * live. Rewrites are also the sanctioned schema-evolution path, so
      * no merge-style schema checks here. */
    override def overwriteAll(merged: DataFrame): Unit = {
      require(!merged.columns.contains("p_date") && !merged.columns.contains("p_dir"),
        "TxnParquetSink: 'p_date'/'p_dir' are reserved layout columns")
      val spark = merged.sparkSession
      val batch = merged.withColumn("p_date", to_date(col(tsCol)))
      val chunkRel = s"data/chunk-${java.util.UUID.randomUUID().toString.take(12)}"
      batch
        .repartition(col("p_date"))
        .sortWithinPartitions(col("p_date"))
        .withColumn("p_dir", coalesce(col("p_date").cast("string"), lit(NullKey)))
        .write.partitionBy("p_dir").mode("errorifexists").parquet(s"$path/$chunkRel")
      // the staged dirs ARE the new table: list them rather than re-derive
      // from the data (one listing of one fresh dir, driver-side)
      val (f, root) = fs(spark, path)
      val staged = f.listStatus(new Path(s"$path/$chunkRel")).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("p_dir="))
        .map(_.getPath.getName.stripPrefix("p_dir="))
      val gdir = new Path(root, "_graft")
      f.mkdirs(gdir)
      val nextV = currentManifest(spark, path).map(_._1 + 1).getOrElse(1L)
      val nextDates = staged.map(k => k -> s"$chunkRel/p_dir=$k").toMap
      // manifest schema convention = data columns + p_date (see merge)
      commitManifest(f, root, gdir, nextV, nextDates, batch.schema.json)
    }

    def read(spark: SparkSession): DataFrame = {
      val m = currentManifest(spark, path).getOrElse(
        throw new IllegalStateException(s"TxnParquetSink: no committed table at $path"))
      readDirs(spark, m._2.values.toSeq, m._3)
    }

    /** The table restricted to `dates` — pure driver-side manifest
      * lookup, reads only those dates' chunk dirs (no listing, no
      * partition discovery). */
    def prunedRead(spark: SparkSession, dates: Seq[java.sql.Date]): DataFrame = {
      val m = currentManifest(spark, path).getOrElse(
        throw new IllegalStateException(s"TxnParquetSink: no committed table at $path"))
      readDirs(spark, dates.map(dateKey).distinct.flatMap(m._2.get), m._3)
    }

    /** Live manifest version, None before the first commit. */
    def version(spark: SparkSession): Option[Long] =
      currentManifest(spark, path).map(_._1)

    /** `TIMESTAMP AS OF` resolution: the highest RETAINED manifest
      * whose file modification time is at or before `tsMicros`. */
    def versionAt(spark: SparkSession, tsMicros: Long): Option[Long] = {
      val (f, root) = fs(spark, path)
      val gdir = new Path(root, "_graft")
      if (!f.exists(gdir)) return None
      f.listStatus(gdir).toSeq.flatMap { st =>
        st.getPath.getName match {
          case ManifestRe(v) if st.getModificationTime * 1000L <= tsMicros =>
            Some(v.toLong)
          case _ => None
        }
      }.maxOption
    }

    /** TIME-TRAVEL read: the table exactly as manifest `v` committed it
      * — the audit/debug read "what did the merge job see last night",
      * and the explicit API form of the pinned-reader grace contract
      * (a reader holding version v keeps its snapshot while v stays
      * within the `keepManifests` window; this asks for it by number).
      * Fails LOUDLY when v has been GC'd past the window — never
      * silently serves a different version. */
    def readVersion(spark: SparkSession, v: Long): DataFrame = {
      val (f, root) = fs(spark, path)
      val gdir = new Path(root, "_graft")
      require(f.exists(new Path(gdir, s"manifest-$v.txt")), {
        val live = currentManifest(spark, path).map(_._1)
        s"TxnParquetSink: version $v is not available at $path " +
          s"(live=${live.getOrElse("none")}, keepManifests=$keepManifests" +
          s" — older versions are GC'd past the grace window)"
      })
      val (dates, schema) = readManifestAt(f, gdir, v)
      // per-version schema: a pre-evolution snapshot reads back with
      // its OWN columns, not the live table's
      readDirs(spark, dates.values.toSeq, schema)
    }

    /** Chunk reads pin the manifest's committed schema when present:
      * chunks written before an add-column evolution lack the new
      * columns, and the explicit schema makes the parquet reader fill
      * them with typed NULLs instead of letting first-file inference
      * drop them. */
    private def readDirs(spark: SparkSession, rel: Seq[String],
        schema: Option[org.apache.spark.sql.types.StructType]): DataFrame = {
      if (rel.isEmpty) {
        // a committed-but-empty table (e.g. a rewrite that deleted every
        // row) still reads: zero rows, the manifest's schema
        val s = schema.getOrElse(throw new IllegalStateException(
          "TxnParquetSink: committed table has no data for the requested dates"))
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s).drop("p_date")
      }
      val reader = schema.fold(spark.read)(s => spark.read.schema(s))
      reader.parquet(rel.map(r => s"$path/$r"): _*).drop("p_date")
    }

    private def merge(updates: DataFrame, keys: Seq[String],
                      policy: (DataFrame, DataFrame, Seq[String]) => DataFrame): Unit = {
      if (!keys.contains(tsCol)) throw new IncrementalMergeDeclined(
        s"date-partitioned merge keys $keys must include the partition timestamp '$tsCol'")
      require(!updates.columns.contains("p_date") && !updates.columns.contains("p_dir"),
        "TxnParquetSink: 'p_date'/'p_dir' are reserved layout columns")
      val spark = updates.sparkSession
      val batch = updates.dropDuplicates(keys)
        .withColumn("p_date", to_date(col(tsCol)))
      val current = currentManifest(spark, path)
      val touched = Store.touchedDates(batch, tsCol).map(dateKey)
      if (touched.isEmpty) return // empty batch: nothing to merge or commit
      // Schema evolution contract: adding columns is a merge (old rows
      // read back with typed NULLs); dropping or re-typing a column is
      // a REWRITE, and a merge attempting it fails loudly — silence
      // here would truncate the table's schema one commit at a time.
      current.flatMap(_._3).foreach { ts =>
        val batchTypes = batch.schema.map(f => f.name -> f.dataType).toMap
        val tableData = ts.filter(_.name != "p_date")
        val missing = tableData.map(_.name).filterNot(batchTypes.contains)
        require(missing.isEmpty,
          s"TxnParquetSink: merge batch is missing existing table " +
            s"column(s) ${missing.mkString(", ")} — dropping columns " +
            s"requires an explicit rewrite, not a merge")
        val retyped = tableData.filter(f =>
          batchTypes(f.name) != f.dataType)
        require(retyped.isEmpty,
          s"TxnParquetSink: merge batch re-types column(s) " +
            retyped.map(f => s"${f.name} (${f.dataType.simpleString} -> " +
              s"${batchTypes(f.name).simpleString})").mkString(", ") +
            " — type evolution requires an explicit rewrite")
      }
      val merged = current match {
        case Some((_, dates, schemaOpt)) =>
          val dirs = touched.flatMap(dates.get)
          if (dirs.isEmpty) batch
          else {
            val raw = schemaOpt.fold(spark.read)(s => spark.read.schema(s))
              .parquet(dirs.map(r => s"$path/$r"): _*)
            val have = raw.columns.toSet
            // align to the batch's (possibly wider) schema: columns the
            // old chunks lack surface as typed NULLs
            val existing = raw.select(batch.schema.map(f =>
              if (have.contains(f.name)) col(f.name)
              else lit(null).cast(f.dataType).as(f.name)): _*)
            policy(existing, batch, keys)
          }
        case None => batch
      }

      // 1. stage: all data lands in a fresh, unreferenced chunk dir
      val chunkRel = s"data/chunk-${java.util.UUID.randomUUID().toString.take(12)}"
      val orderCols: IndexedSeq[Column] = col("p_date") +: keys.map(col).toIndexedSeq
      merged
        .repartition(orderCols: _*)
        .sortWithinPartitions(orderCols: _*)
        .withColumn("p_dir", coalesce(col("p_date").cast("string"), lit(NullKey)))
        .write.partitionBy("p_dir").mode("errorifexists").parquet(s"$path/$chunkRel")

      // 2. manifest v+1 = old mapping with touched dates repointed
      val (f, root) = fs(spark, path)
      val gdir = new Path(root, "_graft")
      f.mkdirs(gdir)
      val nextV = current.map(_._1 + 1).getOrElse(1L)
      val nextDates = current.map(_._2).getOrElse(Map.empty) ++
        touched.map(k => k -> s"$chunkRel/p_dir=$k")
      // 3. THE commit: one atomic rename-to-fresh-name (see
      //    commitManifest). crashBeforeCommit fires with everything
      //    staged, nothing live.
      commitManifest(f, root, gdir, nextV, nextDates, merged.schema.json)
    }

    /** Shared commit tail of merge/compact/compactSmall: write manifest
      * `nextV` under a temp name, fire the crash seam, ONE atomic
      * rename-to-fresh-name (fails loudly if another writer committed
      * this version), then the retention GC. */
    private def commitManifest(f: FileSystem, root: Path, gdir: Path,
                               nextV: Long, nextDates: Map[String, String],
                               schemaJson: String): Unit = {
      val body = (s"v $nextV" +: s"schema\t$schemaJson" +:
        nextDates.toSeq.sortBy(_._1).map { case (k, d) => s"$k\t$d" })
        .mkString("", "\n", "\n")
      val tmp = new Path(gdir, s".manifest-$nextV.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = f.create(tmp, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()

      crashBeforeCommit() // test seam: die with everything staged, nothing live

      val dst = new Path(gdir, s"manifest-$nextV.txt")
      if (f.exists(dst) || !f.rename(tmp, dst)) {
        f.delete(tmp, false)
        throw new java.util.ConcurrentModificationException(
          s"TxnParquetSink: version $nextV already committed by another writer " +
            s"($path is single-writer; coordinate or retry)")
      }

      gc(f, root, gdir, nextV, keepManifests)
    }

    /** Replace EXACTLY `dates` with `kept` under the usual commit
      * protocol: `kept` (those dates' full post-operation rows) stages
      * into a fresh chunk dir, then ONE atomic manifest swap repoints
      * the touched dates — a date with zero kept rows simply leaves the
      * mapping. This is what makes SQL UPDATE/DELETE O(touched dates)
      * on this sink (SqlMerge routes here): untouched dates' chunks are
      * neither read nor written, and a crash leaves the old version
      * live. Loud guards: `kept` must not smuggle rows of OTHER dates
      * (the staged partition listing is checked against the replaced
      * set), and must carry the table's exact schema (replaceDates is a
      * row-level operation, never a schema evolution). */
    def replaceDates(dates: Seq[java.sql.Date], kept: DataFrame): Unit = {
      require(dates.nonEmpty, "replaceDates needs at least one date")
      require(!kept.columns.contains("p_date") && !kept.columns.contains("p_dir"),
        "TxnParquetSink: 'p_date'/'p_dir' are reserved layout columns")
      val spark = kept.sparkSession
      val current = currentManifest(spark, path).getOrElse(
        throw new IllegalStateException(
          s"TxnParquetSink: no committed table at $path"))
      val keys = dates.map(dateKey).distinct
      val batch = kept.withColumn("p_date", to_date(col(tsCol)))
      current._3.foreach { stored =>
        // names + types only: nullability/metadata legitimately drift
        // through filters and projections without changing the data shape
        def shape(st: org.apache.spark.sql.types.StructType) =
          st.map(f => (f.name.toLowerCase(java.util.Locale.ROOT), f.dataType))
        require(shape(batch.schema) == shape(stored),
          s"TxnParquetSink.replaceDates: kept schema ${batch.schema.simpleString} " +
            s"!= table schema ${stored.simpleString} — row-level ops cannot evolve the schema")
      }
      val chunkRel = s"data/chunk-${java.util.UUID.randomUUID().toString.take(12)}"
      batch
        .repartition(col("p_date"))
        .sortWithinPartitions(col("p_date"))
        .withColumn("p_dir", coalesce(col("p_date").cast("string"), lit(NullKey)))
        .write.partitionBy("p_dir").mode("errorifexists").parquet(s"$path/$chunkRel")
      val (f, root) = fs(spark, path)
      val staged = f.listStatus(new Path(s"$path/$chunkRel")).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("p_dir="))
        .map(_.getPath.getName.stripPrefix("p_dir="))
      val stray = staged.filterNot(keys.contains)
      require(stray.isEmpty,
        s"TxnParquetSink.replaceDates: kept rows carry dates ${stray.mkString(", ")} " +
          s"outside the replaced set ${keys.mkString(", ")}")
      val gdir = new Path(root, "_graft")
      val nextDates = (current._2 -- keys) ++
        staged.map(k => k -> s"$chunkRel/p_dir=$k")
      commitManifest(f, root, gdir, current._1 + 1, nextDates,
        current._3.map(_.json).getOrElse(batch.schema.json))
    }

    /** Explicit retention sweep — VACUUM: shrink the kept-manifest
      * window to `retain` versions NOW and delete every chunk dir none
      * of them references, without waiting for (or performing) a
      * commit. The storage-reclaim half of [[readVersion]]'s
      * time-travel contract: vacuumed versions fail loudly there
      * afterwards, they never silently serve other data. Runs under
      * the same single-writer contract as merges (a concurrent reader
      * pinned INSIDE the retained window is safe; pinning outside it
      * was already outside the grace contract). No-op before the first
      * commit. */
    def vacuum(spark: SparkSession, retain: Int = 1): Unit = {
      require(retain >= 1, "vacuum must retain at least the live manifest")
      currentManifest(spark, path).foreach { case (v, _, _) =>
        val (f, root) = fs(spark, path)
        gc(f, root, new Path(root, "_graft"), v, retain)
      }
    }

    /** COMPACTION: rewrite the live table into ONE fresh chunk dir (one
      * file per date) and commit it as manifest v+1 — the small-files
      * cure after a long run of incremental merges has scattered dates
      * across many chunk dirs (every merge-touched date = a new dir; at
      * 100 TB the scan's file-listing and per-file open cost grow with
      * every commit until someone bin-packs).
      *
      * Runs THROUGH the commit protocol, not around it: stage to an
      * unreferenced chunk, write manifest v+1 under a temp name, one
      * atomic rename. A crash anywhere leaves the pre-compact table
      * live plus one orphaned chunk (next commit's GC sweeps it);
      * readers pinned to pre-compact versions inside the
      * `keepManifests` window keep their snapshots byte-identically —
      * compaction changes LAYOUT, never content, and old chunks survive
      * until every manifest referencing them ages out. Same
      * single-writer contract as merges (the rename token makes a racing
      * writer fail loudly). No-op before the first commit.
      *
      * One file per date comes from `repartition(p_date)` — each date's
      * rows collapse to one task before the partitioned write. Dates
      * whose rows exceed one healthy file should stay on incremental
      * merges (their chunk IS one dir already); this operator targets
      * the many-small-dirs tail, the common shape after frequent small
      * batches. */
    def compact(spark: SparkSession): Unit = {
      currentManifest(spark, path).foreach { case (v, dates, schemaOpt) =>
        val dirs = dates.values.toSeq.distinct
        // schema-pinned read: post-evolution tables hold chunks of
        // mixed width, and first-file inference would drop the newer
        // columns from the whole compacted table
        val all = schemaOpt.fold(spark.read)(s => spark.read.schema(s))
          .parquet(dirs.map(r => s"$path/$r"): _*)

        val chunkRel = s"data/chunk-${java.util.UUID.randomUUID().toString.take(12)}"
        all
          .repartition(col("p_date"))
          .sortWithinPartitions(col("p_date"))
          .withColumn("p_dir", coalesce(col("p_date").cast("string"), lit(NullKey)))
          .write.partitionBy("p_dir").mode("errorifexists").parquet(s"$path/$chunkRel")

        val (f, root) = fs(spark, path)
        val gdir = new Path(root, "_graft")
        val nextDates = dates.keys.map(k => k -> s"$chunkRel/p_dir=$k").toMap
        commitManifest(f, root, gdir, v + 1, nextDates, all.schema.json)
      }
    }

    /** BIN-PACK compaction — the incremental form of [[compact]]:
      * rewrite ONLY the dates whose live chunk directory is fragmented
      * into more small files than its byte size justifies, leaving
      * every healthy date's chunk untouched (and, for pinned readers,
      * byte-identical — repointed dates' old chunks survive until the
      * manifests referencing them age out, the [[compact]] contract).
      * At 100 TB this is the operational difference: a full-table
      * rewrite is O(table) I/O every time, while the small-file problem
      * lives in the tail of recently-merged dates — this pass is
      * O(selected dates' bytes), so it can run after every batch window.
      *
      * Selection reads CHUNK STATS ONLY (a driver-side file listing of
      * each manifest-referenced date dir — bounded by the date count,
      * no row data): a date is rewritten when its dir holds more than
      * one data file AND its total bytes fit inside `targetBytes` (one
      * bin) — dates already one-file-per-dir are left alone, and dates
      * larger than a bin keep their multi-file layout (their files are
      * full-sized; collapsing them to one task would make one giant
      * file and one straggler task — use [[compact]] for deliberate
      * full rewrites). All selected dates stage into ONE fresh chunk
      * dir (one task per date → one file per date), then the usual
      * atomic manifest swap. Returns the number of dates rewritten;
      * 0 = nothing selected, NO commit (the table version is
      * unchanged). */
    def compactSmall(spark: SparkSession,
                     targetBytes: Long = 64L << 20): Int = {
      require(targetBytes > 0, "targetBytes must be positive")
      currentManifest(spark, path) match {
        case None => 0
        case Some((v, dates, schemaOpt)) =>
          val (f, root) = fs(spark, path)
          def stats(rel: String): (Int, Long) = {
            val p = new Path(root, rel)
            if (!f.exists(p)) (0, 0L)
            else {
              val files = f.listStatus(p).filter(s => s.isFile &&
                !s.getPath.getName.startsWith("_") &&
                !s.getPath.getName.startsWith("."))
              (files.length, files.map(_.getLen).sum)
            }
          }
          val selected = dates.toSeq.filter { case (_, rel) =>
            val (nFiles, bytes) = stats(rel)
            nFiles > 1 && bytes <= targetBytes
          }
          if (selected.isEmpty) return 0
          val reader = schemaOpt.fold(spark.read)(s => spark.read.schema(s))
          val small = reader.parquet(
            selected.map { case (_, rel) => s"$path/$rel" }: _*)
          val chunkRel = s"data/chunk-${java.util.UUID.randomUUID().toString.take(12)}"
          small
            .repartition(col("p_date"))
            .sortWithinPartitions(col("p_date"))
            .withColumn("p_dir",
              coalesce(col("p_date").cast("string"), lit(NullKey)))
            .write.partitionBy("p_dir").mode("errorifexists")
            .parquet(s"$path/$chunkRel")
          val gdir = new Path(root, "_graft")
          val nextDates = dates ++
            selected.map { case (k, _) => k -> s"$chunkRel/p_dir=$k" }
          commitManifest(f, root, gdir, v + 1, nextDates,
            small.schema.json)
          selected.size
      }
    }

    /** Post-commit sweep: drop manifests older than the kept window and
      * any chunk dir none of the kept manifests references (orphans of
      * crashed attempts included). Runs only in the committing writer —
      * under the single-writer contract nothing else is mid-write. */
    private def gc(f: FileSystem, root: Path, gdir: Path, liveV: Long,
                   keep: Int): Unit = {
      val keepFrom = liveV - keep + 1
      f.listStatus(gdir).foreach(s => s.getPath.getName match {
        case ManifestRe(v) if v.toLong < keepFrom => f.delete(s.getPath, false)
        case n if n.startsWith(".manifest-") => f.delete(s.getPath, false)
        case _ => ()
      })
      val referenced = (keepFrom to liveV)
        .filter(v => f.exists(new Path(gdir, s"manifest-$v.txt")))
        .flatMap(v => readManifestAt(f, gdir, v)._1.values)
        .map(_.split("/p_dir=", 2)(0)).toSet
      val dataDir = new Path(root, "data")
      if (f.exists(dataDir))
        f.listStatus(dataDir).foreach { s =>
          if (s.isDirectory && !referenced.contains(s"data/${s.getPath.getName}"))
            f.delete(s.getPath, true)
        }
    }
  }
}
