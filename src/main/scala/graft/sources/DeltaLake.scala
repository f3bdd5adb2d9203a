package graft.sources

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.weather.Store

/** Delta Lake PROTOCOL interop, dependency-free: a reader and writer for
  * the open `_delta_log` transaction-log format (the published spec at
  * delta-io/delta `PROTOCOL.md` — JSON commit files of `protocol` /
  * `metaData` / `add` / `remove` actions, parquet checkpoints, atomic
  * rename-to-fresh-name commits), implemented directly over Hadoop
  * `FileSystem` + Spark parquet. No Delta jars involved — which is the
  * point: SURVEY.md §2.1 S4 names "MERGE INTO on Delta/Iceberg" as the
  * production mapping of the reference's `INSERT … ON CONFLICT` load
  * (dags/etl.py:71-76,97-114), and this module makes graft's
  * transactional tables interoperate with that world in both directions:
  *
  *  - '''read''': [[DeltaLake.readTable]] replays a `_delta_log` written
  *    by ANY Delta writer (checkpoint + JSON tail) and reconstructs the
  *    table as a DataFrame — partition columns come from the log's
  *    `partitionValues`, never from directory listing, exactly as the
  *    spec requires. Unsupported reader features (column mapping,
  *    deletion vectors) fail LOUDLY, never return wrong rows.
  *  - '''write''': [[DeltaLake.DeltaDateSink]] is a [[DatePartitionedSink]]
  *    + [[VersionedSink]] whose storage IS a spec-conformant Delta table:
  *    every merge/rewrite stages immutable parquet files and commits one
  *    atomic log entry, so `MERGE INTO` / `UPDATE` / `DELETE` /
  *    `VERSION AS OF` over graft SQL run against a table any Delta
  *    client can read.
  *  - '''export''': [[DeltaLake.publish]] makes an existing
  *    [[TxnParquet.TxnParquetSink]] table ALSO a valid Delta table by
  *    synthesizing `_delta_log` at the same root from the live manifest
  *    (chunk files carry `p_date` as a data column, so the export is an
  *    unpartitioned Delta table — no file rewrite, metadata only).
  *
  * == Scale posture ==
  * Log replay is driver-side over KB-sized JSON files plus one parquet
  * checkpoint read — the same design Delta itself uses; the data plane
  * stays fully distributed. Snapshot state is the file LIST (path,
  * partitionValues, size), ~100 bytes/file on the driver: a 100 TB table
  * at 1 GB/file is ~10^5 entries, trivially held. Checkpoints are
  * written every [[DeltaLake.DeltaDateSink.checkpointInterval]] commits
  * so replay cost is O(checkpoint + tail), not O(history). Partition
  * pruning for merges and row-level DML happens on `partitionValues` in
  * the snapshot — a driver-side hash lookup, no listing, no footer
  * reads, exactly like the TxnParquet manifest path.
  *
  * == Commit atomicity ==
  * Same discipline as `TxnParquet.commitManifest`: the commit JSON is
  * staged under a temp name and published to `_delta_log/%020d.json`
  * with an atomic put-if-absent primitive — hard-link creation on the
  * local scheme (link(2) EEXIST), `FileContext.rename(Rename.NONE)`
  * elsewhere — so the version number doubles as the
  * optimistic-concurrency token the Delta spec prescribes and a racing
  * writer of the same version loses LOUDLY, never by clobbering. A
  * crash before publication leaves only unreferenced staging debris
  * (swept, age-gated, by [[DeltaLake.DeltaDateSink.vacuum]]).
  */
object DeltaLake {

  /** One live data file of a snapshot. `partitionValues` maps partition
    * column → string value (None = SQL NULL), exactly as the log stores
    * it; `path` is the DECODED table-root-relative path; `raw` is the
    * log-encoded form the add action carried (null for locally staged
    * files — [[rawPath]] derives it). */
  final case class AddFile(
      path: String,
      partitionValues: Map[String, Option[String]],
      size: Long,
      modificationTime: Long,
      raw: String = null) {
    /** The exact log form a `remove` for this file must reference:
      * replay cancels adds by the RAW string (two spec-equivalent
      * encodings of one path would otherwise fail to match — e.g. a
      * foreign writer's `%3D` vs a literal `=`). */
    def rawPath: String = if (raw != null) raw else encodePath(path)
  }

  /** Replayed table state at one version. `appTxns` is the spec's
    * streaming-transaction ledger (`txn` actions): highest committed
    * version per application id — the exactly-once handshake for
    * replayed micro-batches. */
  final case class Snapshot(
      version: Long,
      tableId: String,
      schema: StructType,
      partitionColumns: Seq[String],
      configuration: Map[String, String],
      adds: Seq[AddFile],
      appTxns: Map[String, Long] = Map.empty) {
    def dataSchema: StructType =
      StructType(schema.filterNot(f => partitionColumns.contains(f.name)))
  }

  private val mapper = new ObjectMapper()
  private val LogDir = "_delta_log"
  private val JsonRe = "(\\d{20})\\.json".r
  private val CkptRe = "(\\d{20})\\.checkpoint\\.parquet".r
  private val CkptPartRe = "(\\d{20})\\.checkpoint\\.(\\d{10})\\.(\\d{10})\\.parquet".r
  private val HiveNull = "__HIVE_DEFAULT_PARTITION__"

  /** Reader features this implementation actually understands. Column
    * mapping and deletion vectors change row-level semantics — a reader
    * that ignored them would silently return wrong data, so anything
    * outside this set is a loud failure. */
  private val SupportedReaderFeatures =
    Set("timestampNtz", "vacuumProtocolCheck", "appendOnly", "invariants")

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) =
    FsUtil.fs(spark, path)

  private def commitPath(logDir: Path, v: Long): Path =
    new Path(logDir, f"$v%020d.json")

  /** add.path is RFC 2396 URL-encoded per the spec; foreign logs may
    * carry literal paths that are not valid URIs — fall back verbatim. */
  private[sources] def decodePath(p: String): String =
    try {
      val d = new java.net.URI(p).getPath
      if (d == null || d.isEmpty) p else d
    } catch { case _: Exception => p }

  /** RFC 2396 encoding of a table-root-relative path for add.path, the
    * inverse of [[decodePath]] — the spec requires the log form to be
    * URL-encoded (a literal on-disk '%', e.g. from a hive-escaped
    * partition dir, must round-trip through foreign readers as `%25`).
    * Falls back verbatim on the (never-produced-here) paths the URI
    * class cannot represent. */
  private[sources] def encodePath(p: String): String =
    try new java.net.URI(null, null, p, null).getRawPath
    catch { case _: Exception => p }

  private def slurp(f: FileSystem, p: Path): String = FsUtil.slurp(f, p)

  // ---------------------------------------------------------------- replay

  /** All versions present in the log dir: (json commit versions,
    * checkpoint versions). A checkpoint is either the classic single
    * file or the multi-part form real writers produce for large tables
    * (`%020d.checkpoint.%010d.%010d.parquet`); a multi-part checkpoint
    * only counts when EVERY declared part is present — a torn upload
    * must not serve a partial file list. */
  private def logStatuses(f: FileSystem, logDir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    if (!f.exists(logDir)) Nil else f.listStatus(logDir).toSeq

  private def listLog(f: FileSystem, logDir: Path): (Seq[Long], Seq[Long]) =
    parseLog(logStatuses(f, logDir).map(_.getPath.getName))

  private def parseLog(names: Seq[String]): (Seq[Long], Seq[Long]) = {
    val jsons = names.collect { case JsonRe(v) => v.toLong }.sorted
    val singles = names.collect { case CkptRe(v) => v.toLong }
    val multi = names.collect { case CkptPartRe(v, part, of) =>
      (v.toLong, part.toInt, of.toInt)
    }.groupBy(_._1).collect {
      case (v, parts) if parts.map(_._3).distinct.size == 1 &&
        parts.map(_._2).toSet == (1 to parts.head._3).toSet => v
    }
    (jsons, (singles ++ multi).distinct.sorted)
  }

  /** The parquet file(s) of version `cv`'s checkpoint. */
  private def checkpointFiles(f: FileSystem, logDir: Path, cv: Long): Seq[String] = {
    val single = new Path(logDir, f"$cv%020d.checkpoint.parquet")
    if (f.exists(single)) Seq(single.toString)
    else f.listStatus(logDir).toSeq.map(_.getPath)
      .filter(p => p.getName match {
        case CkptPartRe(v, _, _) => v.toLong == cv
        case _ => false
      }).map(_.toString).sorted
  }

  /** Latest committed version, None for a non-Delta path. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val (f, r) = fs(spark, root)
    val (jsons, ckpts) = listLog(f, new Path(r, LogDir))
    (jsons ++ ckpts).maxOption
  }

  def snapshot(spark: SparkSession, root: String): Option[Snapshot] =
    latestVersion(spark, root).map(v => snapshotAt(spark, root, v))

  /** `TIMESTAMP AS OF` resolution: the highest commit whose log file's
    * modification time is at or before `tsMicros` — the convention
    * Delta Lake documents for timestamp travel. Only versions
    * [[listLog]] VALIDATES are candidates (a torn multi-part checkpoint
    * must not resolve here and then fail in `snapshotAt` — the two
    * paths answer from one set). A version's timestamp is its JSON
    * commit file's mtime (Delta's convention); a checkpoint-only
    * version (JSON vacuumed) uses the newest checkpoint part's mtime. */
  def versionAtTime(spark: SparkSession, root: String,
                    tsMicros: Long): Option[Long] = {
    val (f, r) = fs(spark, root)
    val logDir = new Path(r, LogDir)
    // ONE directory listing serves both the validated-version parse and
    // the mtime pass (a second listing would double the metadata-store
    // round-trips and could disagree with the first under concurrent
    // vacuum)
    val statuses = logStatuses(f, logDir)
    if (statuses.isEmpty) return None
    val (jsons, ckpts) = parseLog(statuses.map(_.getPath.getName))
    val jsonSet = jsons.toSet
    val ckptSet = ckpts.toSet
    val jsonMt = mutable.Map.empty[Long, Long]
    val ckptMt = mutable.Map.empty[Long, Long]
    statuses.foreach { st =>
      st.getPath.getName match {
        case JsonRe(v) if jsonSet.contains(v.toLong) =>
          jsonMt(v.toLong) = st.getModificationTime
        case CkptRe(v) if ckptSet.contains(v.toLong) =>
          val vv = v.toLong
          ckptMt(vv) = math.max(ckptMt.getOrElse(vv, 0L), st.getModificationTime)
        case CkptPartRe(v, _, _) if ckptSet.contains(v.toLong) =>
          val vv = v.toLong
          ckptMt(vv) = math.max(ckptMt.getOrElse(vv, 0L), st.getModificationTime)
        case _ =>
      }
    }
    (jsonSet ++ ckptSet).toSeq
      .filter(v => jsonMt.get(v).orElse(ckptMt.get(v))
        .exists(_ * 1000L <= tsMicros))
      .maxOption
  }

  /** Replay the log to exactly version `v`: largest checkpoint ≤ v, then
    * the JSON tail. Fails loudly on a gap (vacuumed history) rather than
    * serving a partial table. */
  def snapshotAt(spark: SparkSession, root: String, v: Long): Snapshot = {
    val (f, r) = fs(spark, root)
    val logDir = new Path(r, LogDir)
    val (jsons, ckpts) = listLog(f, logDir)
    require(jsons.contains(v) || ckpts.contains(v),
      s"DeltaLake: version $v is not present at $root " +
        s"(commits=${jsons.take(3).mkString(",")}..${jsons.lastOption.getOrElse("-")})")

    val ckptV = ckpts.filter(_ <= v).maxOption
    val adds = mutable.LinkedHashMap.empty[String, AddFile]
    val appTxns = mutable.Map.empty[String, Long]
    var tableId: String = null
    var schema: StructType = null
    var partCols: Seq[String] = Nil
    var conf: Map[String, String] = Map.empty

    def applyMeta(id: String, schemaString: String, pcs: Seq[String],
                  cfg: Map[String, String]): Unit = {
      tableId = id
      schema = DataType.fromJson(schemaString).asInstanceOf[StructType]
      partCols = pcs
      conf = cfg
      require(!conf.get("delta.columnMapping.mode").exists(_ != "none"),
        s"DeltaLake: column mapping mode '${conf("delta.columnMapping.mode")}' " +
          "is not supported — refusing to read (ids/physical names would be wrong)")
    }

    def checkProtocol(minReader: Int, readerFeatures: Seq[String]): Unit = {
      require(minReader <= 3,
        s"DeltaLake: protocol minReaderVersion $minReader not supported")
      if (minReader >= 3) {
        val unsupported = readerFeatures.filterNot { ft =>
          SupportedReaderFeatures.contains(ft) ||
            // columnMapping listed but disabled carries no obligation
            (ft == "columnMapping" &&
              !conf.get("delta.columnMapping.mode").exists(_ != "none")) ||
            (ft == "deletionVectors") // gated per-file below instead
        }
        require(unsupported.isEmpty,
          s"DeltaLake: unsupported reader features ${unsupported.mkString(", ")}")
      }
    }

    // 1. checkpoint base (parquet; distributed read, driver-side collect
    //    of the bounded file list)
    ckptV.foreach { cv =>
      val ck = spark.read.parquet(checkpointFiles(f, logDir, cv): _*)
      val cols = ck.columns.toSet
      if (cols.contains("metaData")) {
        ck.select("metaData").where(col("metaData.id").isNotNull)
          .collect().foreach { row =>
            val m = row.getStruct(0)
            val idx = m.schema.fieldNames.zipWithIndex.toMap
            applyMeta(
              m.getString(idx("id")),
              m.getString(idx("schemaString")),
              m.getSeq[String](idx("partitionColumns")),
              Option(m.getMap[String, String](idx("configuration")))
                .map(_.toMap).getOrElse(Map.empty))
          }
      }
      if (cols.contains("protocol")) {
        ck.select("protocol").where(col("protocol.minReaderVersion").isNotNull)
          .collect().foreach { row =>
            val p = row.getStruct(0)
            val idx = p.schema.fieldNames.zipWithIndex.toMap
            val feats =
              if (idx.contains("readerFeatures") && !p.isNullAt(idx("readerFeatures")))
                p.getSeq[String](idx("readerFeatures"))
              else Nil
            checkProtocol(p.getInt(idx("minReaderVersion")), feats)
          }
      }
      if (cols.contains("txn")) {
        ck.select("txn").where(col("txn.appId").isNotNull)
          .collect().foreach { row =>
            val t0 = row.getStruct(0)
            val idx = t0.schema.fieldNames.zipWithIndex.toMap
            appTxns(t0.getString(idx("appId"))) = t0.getLong(idx("version"))
          }
      }
      if (cols.contains("add")) {
        val a = ck.select("add.*").where(col("path").isNotNull)
        val hasDv = a.columns.contains("deletionVector")
        if (hasDv) require(a.where(col("deletionVector").isNotNull).isEmpty,
          "DeltaLake: table has deletion vectors — unsupported, refusing to read")
        a.select("path", "partitionValues", "size", "modificationTime")
          .collect().foreach { row =>
            val raw = row.getString(0)
            val pv = Option(row.getMap[String, String](1))
              .map(_.toMap).getOrElse(Map.empty)
              .map { case (k, vv) => k -> Option(vv) }
            adds(raw) = AddFile(decodePath(raw), pv, row.getLong(2),
              row.getLong(3), raw = raw)
          }
      }
    }

    // 2. JSON tail — every commit (ckptV, v] must exist
    val tail = (ckptV.map(_ + 1).getOrElse(0L) to v)
    tail.foreach { cv =>
      val p = commitPath(logDir, cv)
      require(f.exists(p),
        s"DeltaLake: commit $cv missing at $root — history gap (vacuumed?), " +
          s"cannot replay to $v")
      slurp(f, p).linesIterator.filter(_.trim.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        if (n.has("metaData")) {
          val m = n.get("metaData")
          val pcs = (0 until m.get("partitionColumns").size())
            .map(i => m.get("partitionColumns").get(i).asText())
          val cfg = Option(m.get("configuration")).filter(!_.isNull).map { c =>
            val it = c.properties().iterator()
            val b = Map.newBuilder[String, String]
            while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
            b.result()
          }.getOrElse(Map.empty[String, String])
          applyMeta(m.get("id").asText(), m.get("schemaString").asText(), pcs, cfg)
        }
        if (n.has("protocol")) {
          val p0 = n.get("protocol")
          val feats = Option(p0.get("readerFeatures")).filter(!_.isNull)
            .map(a => (0 until a.size()).map(i => a.get(i).asText()))
            .getOrElse(Nil)
          checkProtocol(p0.get("minReaderVersion").asInt(), feats)
        }
        if (n.has("add")) {
          val a = n.get("add")
          require(!a.hasNonNull("deletionVector"),
            "DeltaLake: add action carries a deletion vector — unsupported")
          val pvNode = a.get("partitionValues")
          val pv = Option(pvNode).filter(!_.isNull).map { c =>
            val it = c.properties().iterator()
            val b = Map.newBuilder[String, Option[String]]
            while (it.hasNext) {
              val e = it.next()
              b += e.getKey -> (if (e.getValue.isNull) None else Some(e.getValue.asText()))
            }
            b.result()
          }.getOrElse(Map.empty[String, Option[String]])
          val raw = a.get("path").asText()
          adds(raw) = AddFile(decodePath(raw), pv,
            Option(a.get("size")).map(_.asLong()).getOrElse(0L),
            Option(a.get("modificationTime")).map(_.asLong()).getOrElse(0L),
            raw = raw)
        }
        if (n.has("remove")) adds.remove(n.get("remove").get("path").asText())
        if (n.has("txn")) {
          val t0 = n.get("txn")
          appTxns(t0.get("appId").asText()) = t0.get("version").asLong()
        }
      }
    }

    require(schema != null,
      s"DeltaLake: no metaData action found replaying $root to version $v")
    Snapshot(v, tableId, schema, partCols, conf, adds.values.toSeq,
      appTxns.toMap)
  }

  // --------------------------------------------------------- reconstruction

  /** Hive partition-path escaping (subset of Hive's FileUtils: the
    * characters Spark's own writer escapes). Used only to RECOGNIZE the
    * hive-style layout for the fast path — correctness never depends on
    * paths, only on `partitionValues`. */
  private[sources] def escapePart(s: String): String =
    s.flatMap { c =>
      if (c < 0x20 || "\"#%'*/:=?\\{[]^".contains(c))
        f"%%${c.toInt}%02X"
      else c.toString
    }

  private def hiveDir(partCols: Seq[String], pv: Map[String, Option[String]]): String =
    partCols.map(pc => s"${escapePart(pc)}=" +
      pv.getOrElse(pc, None).map(escapePart).getOrElse(HiveNull)).mkString("/")

  /** Inverse of [[escapePart]]: decode hive partition-dir %XX escapes
    * ONLY — hive escaping never maps '+' to space (that is
    * application/x-www-form-urlencoded, which URLDecoder implements and
    * which would corrupt a legitimate '+' in a partition value).
    * Consecutive %XX groups decode as one UTF-8 byte run. */
  private[sources] def hiveUnescape(s: String): String = {
    def hex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')
    if (!s.contains('%')) return s
    val out = new java.lang.StringBuilder(s.length)
    val bytes = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        hex(s.charAt(i + 1)) && hex(s.charAt(i + 2))) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        if (bytes.size() > 0) {
          out.append(new String(bytes.toByteArray,
            java.nio.charset.StandardCharsets.UTF_8))
          bytes.reset()
        }
        out.append(c)
        i += 1
      }
    }
    if (bytes.size() > 0)
      out.append(new String(bytes.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8))
    out.toString
  }

  /** The snapshot as a DataFrame. Partition columns come from the log:
    * when every file sits under the hive-style directory chain its
    * `partitionValues` describe (what Spark/Delta writers produce), ONE
    * partition-aware parquet scan serves the whole table; otherwise
    * falls back to per-partition reads + literal columns (correct for
    * any layout the spec allows, plan width O(#partitions)). */
  def reconstruct(spark: SparkSession, root: String, s: Snapshot): DataFrame = {
    if (s.adds.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], s.schema)
    if (s.partitionColumns.isEmpty)
      return spark.read.schema(s.schema)
        .parquet(s.adds.map(a => s"$root/${a.path}"): _*)

    val hive = s.adds.forall { a =>
      val dir = hiveDir(s.partitionColumns, a.partitionValues)
      val i = a.path.lastIndexOf('/')
      i > 0 && a.path.substring(0, i).endsWith(dir)
    }
    if (hive) {
      spark.read.option("basePath", root).schema(s.schema)
        .parquet(s.adds.map(a => s"$root/${a.path}"): _*)
        .select(s.schema.map(f => col(f.name)): _*)
    } else {
      val byPart = s.adds.groupBy(_.partitionValues)
      val parts = byPart.toSeq.map { case (pv, files) =>
        val base = spark.read.schema(s.dataSchema)
          .parquet(files.map(a => s"$root/${a.path}"): _*)
        val withParts = s.partitionColumns.foldLeft(base) { (df, pc) =>
          val tpe = s.schema(pc).dataType
          df.withColumn(pc,
            pv.getOrElse(pc, None).map(v => lit(v).cast(tpe))
              .getOrElse(lit(null).cast(tpe)))
        }
        withParts.select(s.schema.map(f => col(f.name)): _*)
      }
      parts.reduce(_ unionByName _)
    }
  }

  /** Read a Delta table (written by this module or any Delta client) at
    * its latest version. */
  def readTable(spark: SparkSession, root: String): DataFrame = {
    val s = snapshot(spark, root).getOrElse(throw new IllegalStateException(
      s"DeltaLake: no _delta_log at $root"))
    reconstruct(spark, root, s)
  }

  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame =
    reconstruct(spark, root, snapshotAt(spark, root, v))

  // ----------------------------------------------------------------- write

  private def obj(): ObjectNode = mapper.createObjectNode()

  private def protocolAction(): String = {
    val p = obj(); val o = obj()
    o.put("minReaderVersion", 1); o.put("minWriterVersion", 2)
    p.set[JsonNode]("protocol", o); mapper.writeValueAsString(p)
  }

  private def metaAction(id: String, schema: StructType,
                         partCols: Seq[String]): String = {
    val w = obj(); val m = obj()
    m.put("id", id)
    val fmt = obj(); fmt.put("provider", "parquet")
    fmt.set[JsonNode]("options", obj())
    m.set[JsonNode]("format", fmt)
    m.put("schemaString", schema.json)
    val pcs = mapper.createArrayNode()
    partCols.foreach(pcs.add)
    m.set[JsonNode]("partitionColumns", pcs)
    m.set[JsonNode]("configuration", obj())
    m.put("createdTime", System.currentTimeMillis())
    w.set[JsonNode]("metaData", m); mapper.writeValueAsString(w)
  }

  private def addAction(a: AddFile): String = {
    val w = obj(); val n = obj()
    n.put("path", a.rawPath) // log form is RFC 2396 encoded per the spec
    val pv = obj()
    a.partitionValues.foreach {
      case (k, Some(v)) => pv.put(k, v)
      case (k, None)    => pv.putNull(k)
    }
    n.set[JsonNode]("partitionValues", pv)
    n.put("size", a.size)
    n.put("modificationTime", a.modificationTime)
    n.put("dataChange", true)
    w.set[JsonNode]("add", n); mapper.writeValueAsString(w)
  }

  /** `path` must be the RAW log form of the add it cancels
    * ([[AddFile.rawPath]]) — replay matches adds and removes by the
    * exact string, so re-encoding here could orphan a foreign writer's
    * differently-but-equivalently-encoded add. */
  private def removeAction(path: String): String = {
    val w = obj(); val n = obj()
    n.put("path", path)
    n.put("deletionTimestamp", System.currentTimeMillis())
    n.put("dataChange", true)
    w.set[JsonNode]("remove", n); mapper.writeValueAsString(w)
  }

  private def txnAction(appId: String, version: Long): String = {
    val w = obj(); val n = obj()
    n.put("appId", appId)
    n.put("version", version)
    n.put("lastUpdated", System.currentTimeMillis())
    w.set[JsonNode]("txn", n); mapper.writeValueAsString(w)
  }

  private def commitInfoAction(operation: String,
                               params: Map[String, String]): String = {
    val w = obj(); val n = obj()
    n.put("timestamp", System.currentTimeMillis())
    n.put("operation", operation)
    val p = obj(); params.foreach { case (k, v) => p.put(k, v) }
    n.set[JsonNode]("operationParameters", p)
    n.put("engineInfo", "graft-deltalake-interop")
    w.set[JsonNode]("commitInfo", n); mapper.writeValueAsString(w)
  }

  /** THE commit: stage the JSON under a temp name, one atomic
    * put-if-absent publication to `%020d.json` ([[AtomicFs]] — see
    * there for why exists()+rename is not enough). The loser of a race
    * throws instead of corrupting (the spec's requirement). */
  private def commit(f: FileSystem, root: Path, version: Long,
                     actions: Seq[String]): Unit = {
    val logDir = new Path(root, LogDir)
    f.mkdirs(logDir)
    val tmp = new Path(logDir,
      s".tmp-${java.util.UUID.randomUUID().toString.take(12)}.json")
    val out = f.create(tmp, false)
    try out.write((actions.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = commitPath(logDir, version)
    if (!AtomicFs.putIfAbsent(f, tmp, dest))
      throw new IllegalStateException(
        s"DeltaLake: concurrent commit detected — version $version already " +
          s"exists at $root (optimistic-concurrency loser)")
  }

  /** Write a parquet checkpoint of the CURRENT snapshot plus the
    * `_last_checkpoint` pointer, so replay cost stays O(tail) instead of
    * O(history). Readers that cannot parse `_last_checkpoint` still find
    * the checkpoint by listing (this module does). */
  def writeCheckpoint(spark: SparkSession, root: String): Unit = {
    val s = snapshot(spark, root).getOrElse(throw new IllegalStateException(
      s"DeltaLake: nothing to checkpoint at $root"))
    val (f, r) = fs(spark, root)
    val logDir = new Path(r, LogDir)

    val protocolT = StructType(Seq(
      StructField("minReaderVersion", IntegerType),
      StructField("minWriterVersion", IntegerType)))
    val metaT = StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType),
        StructField("options", MapType(StringType, StringType))))),
      StructField("schemaString", StringType),
      StructField("partitionColumns", ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType)),
      StructField("createdTime", LongType)))
    val addT = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType, valueContainsNull = true)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", BooleanType)))
    val txnT = StructType(Seq(
      StructField("appId", StringType),
      StructField("version", LongType)))
    val ckptT = StructType(Seq(
      StructField("protocol", protocolT),
      StructField("metaData", metaT),
      StructField("add", addT),
      StructField("txn", txnT)))

    val protoRow = Row(Row(1, 2), null, null, null)
    val metaRow = Row(null, Row(s.tableId, Row("parquet", Map.empty[String, String]),
      s.schema.json, s.partitionColumns, s.configuration,
      System.currentTimeMillis()), null, null)
    val addRows = s.adds.map(a => Row(null, null,
      Row(a.rawPath, a.partitionValues.map { case (k, v) => k -> v.orNull },
        a.size, a.modificationTime, true), null))
    // txn actions MUST survive checkpointing (the spec requires it):
    // dropping them would let a replayed micro-batch past the
    // exactly-once gate after history compaction
    val txnRows = s.appTxns.toSeq.sortBy(_._1).map { case (app, ver) =>
      Row(null, null, null, Row(app, ver))
    }
    val rows = protoRow +: metaRow +: (addRows ++ txnRows)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), ckptT)

    val tmpDir = new Path(logDir,
      s".ckpt-${java.util.UUID.randomUUID().toString.take(12)}")
    df.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
    val part = f.listStatus(tmpDir).map(_.getPath)
      .find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException("checkpoint write produced no parquet"))
    val dest = new Path(logDir, f"${s.version}%020d.checkpoint.parquet")
    if (f.exists(dest)) f.delete(dest, false)
    require(f.rename(part, dest), s"DeltaLake: checkpoint rename failed at $root")
    f.delete(tmpDir, true)

    // _last_checkpoint is a non-atomic HINT; a torn write is tolerated
    // by reader fallback to listing
    val lc = obj()
    lc.put("version", s.version); lc.put("size", rows.size.toLong)
    val lcp = new Path(logDir, "_last_checkpoint")
    if (f.exists(lcp)) f.delete(lcp, false)
    val o = f.create(lcp, true)
    try o.write(mapper.writeValueAsString(lc)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally o.close()
  }

  // ------------------------------------------------------- TxnParquet export

  /** Make the TxnParquet table at `txnPath` ALSO a valid Delta table by
    * synthesizing `_delta_log` at the same root from its live manifest —
    * metadata only, zero data movement: chunk files already carry
    * `p_date` as a regular column, so the export is an UNPARTITIONED
    * Delta table whose adds point straight at the live chunk files.
    * Idempotent: re-publishing an unchanged manifest commits nothing.
    * Returns the Delta version now live. Call after each TxnParquet
    * commit to keep external Delta readers current (their snapshot
    * isolation then mirrors the manifest's pinned-reader window). */
  def publish(spark: SparkSession, txnPath: String): Long = {
    val m = TxnParquet.currentManifest(spark, txnPath).getOrElse(
      throw new IllegalStateException(
        s"DeltaLake.publish: no committed TxnParquet table at $txnPath"))
    val (f, root) = fs(spark, txnPath)
    val liveDirs = m._2.values.toSeq.distinct
    val live: Seq[AddFile] = liveDirs.flatMap { rel =>
      val dir = new Path(root, rel)
      if (!f.exists(dir)) Nil
      else f.listStatus(dir).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => AddFile(s"$rel/${st.getPath.getName}",
          Map.empty, st.getLen, st.getModificationTime))
    }
    val schema = m._3.getOrElse(
      spark.read.parquet(liveDirs.map(r => s"$txnPath/$r"): _*).schema)

    val cur = snapshot(spark, txnPath)
    val curByPath = cur.map(_.adds.map(a => a.path -> a).toMap)
      .getOrElse(Map.empty[String, AddFile])
    val livePaths = live.map(_.path).toSet
    val removes = curByPath.keySet.diff(livePaths).toSeq.sorted
    val addsNew = live.filterNot(a => curByPath.contains(a.path))
    val schemaChanged = !cur.exists(_.schema.json == schema.json)
    if (cur.isDefined && removes.isEmpty && addsNew.isEmpty && !schemaChanged)
      return cur.get.version

    val nextV = cur.map(_.version + 1).getOrElse(0L)
    val id = cur.map(_.tableId).getOrElse(java.util.UUID.randomUUID().toString)
    val actions =
      Seq(commitInfoAction("GRAFT-PUBLISH",
        Map("txnManifestVersion" -> m._1.toString))) ++
        (if (cur.isEmpty) Seq(protocolAction()) else Nil) ++
        (if (cur.isEmpty || schemaChanged)
          Seq(metaAction(id, schema, Nil)) else Nil) ++
        removes.map(p => removeAction(curByPath(p).rawPath)) ++
        addsNew.map(addAction)
    commit(f, root, nextV, actions)
    nextV
  }

  // ------------------------------------------------------------ native sink

  /** Date-partitioned [[MergeSink]] whose storage is a spec-conformant
    * Delta table: parquet files under hive-style `p_date=<date>/` dirs,
    * state in `_delta_log`. Incremental merges and row-level DML prune
    * on `partitionValues` (driver-side snapshot lookup — no listing),
    * rewrite only touched dates' files, and commit one atomic log entry;
    * untouched dates' files stay byte-identical AND remain readable by
    * earlier versions (Delta never deletes on commit — time travel and
    * pinned readers ride the same immutability, reclaimed only by
    * [[vacuum]]). The layout column `p_date = date(tsCol)` is internal:
    * reads drop it, writers derive it. */
  final case class DeltaDateSink(path: String, tsCol: String = "dt",
                                 checkpointInterval: Int = 10,
                                 preCommit: () => Unit = () => ())
      extends DatePartitionedSink with VersionedSink {
    require(checkpointInterval >= 1, "checkpointInterval must be >= 1")

    private val PCol = "p_date"

    private def dateStr(d: java.sql.Date): Option[String] = Option(d).map(_.toString)

    def version(spark: SparkSession): Option[Long] =
      latestVersion(spark, path)

    def readVersion(spark: SparkSession, v: Long): DataFrame =
      reconstruct(spark, path, snapshotAt(spark, path, v)).drop(PCol)

    def versionAt(spark: SparkSession, tsMicros: Long): Option[Long] =
      versionAtTime(spark, path, tsMicros)

    def read(spark: SparkSession): DataFrame =
      readTable(spark, path).drop(PCol)

    def prunedRead(spark: SparkSession, dates: Seq[java.sql.Date]): DataFrame = {
      val s = snap(spark).getOrElse(throw new IllegalStateException(
        s"DeltaDateSink: no committed table at $path"))
      val want: Set[Option[String]] = dates.map(dateStr).toSet
      val pruned = s.adds.filter(a => want.contains(a.partitionValues.getOrElse(PCol, None)))
      reconstruct(spark, path, s.copy(adds = pruned)).drop(PCol)
    }

    private def snap(spark: SparkSession): Option[Snapshot] =
      snapshot(spark, path)

    /** Stage `df` (which must carry `p_date`) as immutable files under
      * the table root and return their AddFiles — files land in
      * hive-style `p_date=<v>/` dirs (Delta-writer convention, enables
      * the one-scan read path) via a temp write + per-file rename. */
    private def stage(df: DataFrame): Seq[AddFile] = {
      val spark = df.sparkSession
      val (f, root) = fs(spark, path)
      f.mkdirs(root)
      val tmp = new Path(root,
        s".stage-${java.util.UUID.randomUUID().toString.take(12)}")
      df.write.partitionBy(PCol).mode("errorifexists").parquet(tmp.toString)
      val out = Seq.newBuilder[AddFile]
      val partDirs = f.listStatus(tmp).filter(_.isDirectory)
      partDirs.foreach { pd =>
        val dirName = pd.getPath.getName // p_date=2024-01-01 | p_date=__HIVE_DEFAULT_PARTITION__
        val rawVal = dirName.substring(dirName.indexOf('=') + 1)
        val pv: Option[String] =
          if (rawVal == HiveNull) None
          else Some(hiveUnescape(rawVal)) // %XX only — never '+'→space
        val destDir = new Path(root, dirName)
        f.mkdirs(destDir)
        f.listStatus(pd.getPath).filter(st => st.isFile &&
          st.getPath.getName.endsWith(".parquet")).foreach { st =>
          val name = s"part-${java.util.UUID.randomUUID().toString.take(12)}-" +
            st.getPath.getName.stripPrefix("part-")
          val dest = new Path(destDir, name)
          require(f.rename(st.getPath, dest),
            s"DeltaDateSink: stage rename failed for ${st.getPath}")
          val fin = f.getFileStatus(dest)
          out += AddFile(s"$dirName/$name", Map(PCol -> pv),
            fin.getLen, fin.getModificationTime)
        }
      }
      f.delete(tmp, true)
      out.result()
    }

    private def fullSchema(data: StructType): StructType =
      StructType(data.filterNot(_.name == PCol) :+ StructField(PCol, DateType))

    private def commitNext(spark: SparkSession, schema: StructType,
                           adds: Seq[AddFile], removes: Seq[String],
                           op: String, emitMeta: Boolean,
                           tableId: Option[String],
                           curV: Option[Long],
                           txn: Option[(String, Long)] = None): Unit = {
      val (f, root) = fs(spark, path)
      preCommit() // test seam: models a concurrent writer landing first
      val nextV = curV.map(_ + 1).getOrElse(0L)
      val actions =
        Seq(commitInfoAction(op, Map("tsCol" -> tsCol))) ++
          (if (curV.isEmpty) Seq(protocolAction()) else Nil) ++
          (if (emitMeta) Seq(metaAction(
            tableId.getOrElse(java.util.UUID.randomUUID().toString),
            schema, Seq(PCol))) else Nil) ++
          txn.map { case (app, ver) => txnAction(app, ver) }.toSeq ++
          removes.map(removeAction) ++ adds.map(addAction)
      commit(f, root, nextV, actions)
      if (nextV > 0 && nextV % checkpointInterval == 0)
        writeCheckpoint(spark, path)
    }

    /** Highest micro-batch version committed for `appId` (the spec's
      * `txn` ledger), None if the app never committed. */
    def lastTxnVersion(spark: SparkSession, appId: String): Option[Long] =
      snap(spark).flatMap(_.appTxns.get(appId))

    /** EXACTLY-ONCE last-wins merge for replayable micro-batches: the
      * (appId, batchVersion) pair rides the SAME atomic commit as the
      * data (the Delta `txn` action), so a foreachBatch replay after a
      * crash either sees its version already in the ledger — and skips
      * the batch entirely, returning false — or re-commits data+txn
      * together. The skip check and the commit race are both guarded by
      * the put-if-absent commit: a replay that loses the version race
      * throws and the retry then observes the ledger. Returns true if
      * the batch was applied, false if it was recognized as already
      * committed. */
    def mergeLastWinsTxn(updates: DataFrame, keys: Seq[String],
                         appId: String, batchVersion: Long): Boolean = {
      val spark = updates.sparkSession
      if (lastTxnVersion(spark, appId).exists(_ >= batchVersion)) false
      else {
        merge(updates, keys, Store.upsertLastWins,
          txn = Some((appId, batchVersion)))
        true
      }
    }

    def mergeLastWins(updates: DataFrame, keys: Seq[String]): Unit =
      merge(updates, keys, Store.upsertLastWins)
    def mergeIfAbsent(updates: DataFrame, keys: Seq[String]): Unit =
      merge(updates, keys, Store.upsertDoNothing)

    /** Same incremental shape as `TxnParquetSink.merge`: prune to the
      * batch's touched dates (driver-side partitionValues lookup), merge
      * only those dates' rows, stage, commit adds + removes for exactly
      * the touched dates. O(touched partitions), never O(table). */
    private def merge(updates: DataFrame, keys: Seq[String],
                      policy: (DataFrame, DataFrame, Seq[String]) => DataFrame,
                      txn: Option[(String, Long)] = None): Unit = {
      if (!keys.contains(tsCol)) throw new IncrementalMergeDeclined(
        s"date-partitioned merge keys $keys must include the partition timestamp '$tsCol'")
      require(!updates.columns.contains(PCol),
        s"DeltaDateSink: '$PCol' is a reserved layout column")
      val spark = updates.sparkSession
      val batch = updates.dropDuplicates(keys)
        .withColumn(PCol, to_date(col(tsCol)))
      val touched = Store.touchedDates(batch, tsCol)
      if (touched.isEmpty) {
        // an EMPTY batch still advances the txn ledger (a data-less
        // commit) so a replayed empty micro-batch is recognized as
        // committed instead of replaying forever
        txn.foreach { _ =>
          snap(spark) match {
            case Some(s) => commitNext(spark, s.schema, Nil, Nil,
              "GRAFT-MERGE", emitMeta = false, Some(s.tableId),
              Some(s.version), txn)
            case None => commitNext(spark, fullSchema(batch.schema), Nil,
              Nil, "GRAFT-MERGE", emitMeta = true, None, None, txn)
          }
        }
        return
      }
      val touchedStr: Set[Option[String]] = touched.map(dateStr).toSet

      snap(spark) match {
        case None =>
          commitNext(spark, fullSchema(batch.schema), stage(batch), Nil,
            "GRAFT-MERGE", emitMeta = true, None, None, txn)
        case Some(s) =>
          // schema contract mirrors TxnParquetSink: widening is a merge,
          // dropping/re-typing is a rewrite and fails loudly here
          val batchTypes = batch.schema.map(f => f.name -> f.dataType).toMap
          val tableData = s.schema.filter(_.name != PCol)
          val missing = tableData.map(_.name).filterNot(batchTypes.contains)
          require(missing.isEmpty,
            s"DeltaDateSink: merge batch is missing existing table column(s) " +
              s"${missing.mkString(", ")} — dropping columns requires an " +
              "explicit rewrite, not a merge")
          val retyped = tableData.filter(f => batchTypes(f.name) != f.dataType)
          require(retyped.isEmpty,
            s"DeltaDateSink: merge batch re-types column(s) " +
              retyped.map(f => s"${f.name} (${f.dataType.simpleString} -> " +
                s"${batchTypes(f.name).simpleString})").mkString(", ") +
              " — type evolution requires an explicit rewrite")

          val oldAdds = s.adds.filter(a =>
            touchedStr.contains(a.partitionValues.getOrElse(PCol, None)))
          val merged =
            if (oldAdds.isEmpty) batch
            else {
              val raw = reconstruct(spark, path, s.copy(adds = oldAdds))
              val have = raw.columns.toSet
              val existing = raw.select(batch.schema.map(f =>
                if (have.contains(f.name)) col(f.name)
                else lit(null).cast(f.dataType).as(f.name)): _*)
              policy(existing, batch, keys)
            }
          val orderCols: IndexedSeq[Column] =
            col(PCol) +: keys.map(col).toIndexedSeq
          val staged = stage(merged.repartition(orderCols: _*)
            .sortWithinPartitions(orderCols: _*))
          commitNext(spark, fullSchema(batch.schema), staged,
            oldAdds.map(_.rawPath), "GRAFT-MERGE",
            emitMeta = !s.schema.json.equals(fullSchema(batch.schema).json),
            Some(s.tableId), Some(s.version), txn)
      }
    }

    /** Pruned rewrite for SQL UPDATE/DELETE: replace exactly `dates` —
      * `kept` may read this sink's current files (old files are never
      * deleted on commit, so there is no read-own-overwrite hazard and
      * no checkpoint/materialization is needed). A date with no kept
      * rows simply has no add — it vanishes from the live version while
      * staying time-travelable. */
    def replaceDates(dates: Seq[java.sql.Date], kept: DataFrame): Unit = {
      val spark = kept.sparkSession
      val s = snap(spark).getOrElse(throw new IllegalStateException(
        s"DeltaDateSink: no committed table at $path"))
      val want: Set[Option[String]] = dates.map(dateStr).toSet
      val staged = stage(kept.withColumn(PCol, to_date(col(tsCol))))
      val stray = staged.filterNot(a =>
        want.contains(a.partitionValues.getOrElse(PCol, None)))
      require(stray.isEmpty,
        s"DeltaDateSink.replaceDates: kept rows fall outside the replaced " +
          s"dates ${dates.mkString(", ")}: " +
          stray.map(_.partitionValues).distinct.mkString(", "))
      val oldAdds = s.adds.filter(a =>
        want.contains(a.partitionValues.getOrElse(PCol, None)))
      commitNext(spark, s.schema, staged, oldAdds.map(_.rawPath),
        "GRAFT-REPLACE-DATES", emitMeta = false, Some(s.tableId), Some(s.version))
    }

    /** Full rewrite (general MERGE write-back / table (re)creation) —
      * stage everything, one commit removing every live file. Also the
      * sanctioned schema-evolution path, so metaData is re-emitted. */
    override def overwriteAll(merged: DataFrame): Unit = {
      val spark = merged.sparkSession
      val withP = merged.drop(PCol).withColumn(PCol, to_date(col(tsCol)))
      val cur = snap(spark)
      val staged = stage(withP.repartition(col(PCol))
        .sortWithinPartitions(col(PCol)))
      commitNext(spark, fullSchema(withP.schema), staged,
        cur.map(_.adds.map(_.rawPath)).getOrElse(Nil),
        "GRAFT-OVERWRITE", emitMeta = true,
        cur.map(_.tableId), cur.map(_.version))
    }

    /** Reclaim data files referenced by NONE of the last `retain`
      * versions (the pinned-reader/time-travel grace window, like
      * TxnParquet's keepManifests), plus crashed-writer debris: stale
      * `.stage-*` dirs under the root and `.ckpt-*` dirs / `.tmp-*`
      * commit files under `_delta_log` older than `debrisMs` (age-gated
      * so an IN-FLIGHT writer's staging is never swept). Committed log
      * files are kept — they are KBs and preserve auditability; a
      * version whose files were vacuumed fails reconstruction loudly at
      * read time. */
    def vacuum(spark: SparkSession, retain: Int = 2,
               debrisMs: Long = 60L * 60 * 1000): Unit = {
      require(retain >= 1, "must retain at least the live version")
      val (f, root) = fs(spark, path)
      val live = version(spark).getOrElse(return)
      val keepV = (math.max(0L, live - retain + 1) to live)
      val keep: Set[String] = keepV.flatMap(v =>
        snapshotAt(spark, path, v).adds.map(_.path)).toSet
      val partDirs = f.listStatus(root).filter(st =>
        st.isDirectory && st.getPath.getName.startsWith(s"$PCol="))
      partDirs.foreach { pd =>
        f.listStatus(pd.getPath).filter(_.isFile).foreach { st =>
          val rel = s"${pd.getPath.getName}/${st.getPath.getName}"
          if (!keep.contains(rel)) f.delete(st.getPath, false)
        }
        if (f.listStatus(pd.getPath).isEmpty) f.delete(pd.getPath, false)
      }
      // crashed-writer debris, age-gated on the NEWEST mtime anywhere
      // in the tree — a directory's own mtime does not refresh while a
      // live writer streams task files into nested _temporary dirs, so
      // gating on it alone could sweep an in-flight stage mid-write
      val cutoff = System.currentTimeMillis() - debrisMs
      // a concurrent writer can FINISH (and delete its staging dir)
      // between our listing and the recursive descent — a vanished
      // subtree is treated as young/skippable, never an abort (the
      // next vacuum sees the final state)
      def treeHasYoung(st: org.apache.hadoop.fs.FileStatus): Boolean =
        st.getModificationTime >= cutoff ||
          (st.isDirectory && {
            try f.listStatus(st.getPath).exists(treeHasYoung)
            catch { case _: java.io.FileNotFoundException => true }
          })
      f.listStatus(root).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(".stage-") && !treeHasYoung(st))
        .foreach(st => f.delete(st.getPath, true))
      val logDir = new Path(root, LogDir)
      if (f.exists(logDir)) f.listStatus(logDir).filter { st =>
        val n = st.getPath.getName
        ((st.isDirectory && n.startsWith(".ckpt-")) ||
          (st.isFile && n.startsWith(".tmp-"))) && !treeHasYoung(st)
      }.foreach(st => f.delete(st.getPath, st.isDirectory))
    }
  }
}
