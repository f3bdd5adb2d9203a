package graft.sources

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Apache Iceberg TABLE-FORMAT interop, Iceberg-jar-free: a reader and a
  * metadata-only publisher for the open Iceberg table spec
  * (iceberg.apache.org/spec — versioned `metadata/v*.metadata.json`,
  * Avro manifest lists, Avro manifests, immutable parquet data files),
  * implemented over Hadoop `FileSystem` + Spark parquet + the Avro
  * container library Spark already ships (`org.apache.avro`, a public
  * Apache format library — no Iceberg runtime involved). This is the
  * second half of SURVEY.md §2.1 S4's production mapping ("MERGE INTO on
  * Delta/Iceberg"): [[DeltaLake]] covers the Delta protocol in both
  * directions; this module adds the Iceberg side:
  *
  *  - '''read''': [[Iceberg.readTable]] resolves the current metadata
  *    (version-hint, falling back to listing), replays the current
  *    snapshot's manifest list → manifests → live data files, and
  *    reconstructs the table as a DataFrame under the Iceberg schema.
  *    Snapshot and timestamp travel ride the same path
  *    ([[Iceberg.readSnapshot]], [[Iceberg.snapshotAtTime]]), each
  *    snapshot resolving under its own schema-id when recorded. v2
  *    merge-on-read POSITION deletes are applied at scan time as a
  *    distributed anti-join on (`_metadata.file_path`,
  *    `_metadata.row_index`) — the common modern-writer shape.
  *    Unsupported constructs fail LOUDLY, never return wrong rows:
  *    format-version 3+, EQUALITY delete files, non-parquet data
  *    files, unknown schema types.
  *  - '''publish''': [[Iceberg.publish]] makes an existing
  *    [[TxnParquet.TxnParquetSink]] table ALSO a valid Iceberg table by
  *    synthesizing `metadata/` at the same root from the live manifest —
  *    metadata only, zero data movement (chunk files carry `p_date` as a
  *    data column, so the export is an unpartitioned Iceberg v1 table).
  *    Each publish is a new self-contained snapshot (one manifest
  *    listing every live file) + a new `vN.metadata.json` committed with
  *    the [[AtomicFs]] put-if-absent primitive, so concurrent publishers
  *    lose loudly and old snapshots stay time-travelable.
  *
  * == Scale posture ==
  * Metadata replay is driver-side over KB-sized JSON + Avro files — the
  * same design Iceberg itself uses (manifests exist precisely so no
  * engine ever lists data directories); the data plane stays fully
  * distributed. Snapshot state on the driver is the live-file list,
  * ~100 bytes/file — a 100 TB table at 1 GB/file is ~10^5 entries. Each
  * publish writes ONE manifest for the whole live set: fine at the
  * TxnParquet sink's file counts (thousands); a native multi-manifest
  * incremental writer is the documented growth path, not a correctness
  * gap (readers here already consume any number of manifests).
  *
  * == Column resolution caveat (documented, loud where checkable) ==
  * Iceberg resolves columns by FIELD ID; Spark's parquet reader resolves
  * by NAME. The two agree unless a column was RENAMED in Iceberg
  * metadata after data was written. This reader is therefore safe for
  * tables whose parquet column names match the current schema (all
  * tables this engine writes, and any table never renamed) — the
  * common interop case — and verifiable by the caller via
  * `spark.read.parquet(file).schema` against [[Iceberg.tableSchema]].
  */
object Iceberg {

  private val mapper = new ObjectMapper()
  private val MetaDir = "metadata"
  private val VersionHint = "version-hint.text"
  private val VMetaRe = "v(\\d+)\\.metadata\\.json".r

  // ------------------------------------------------------------- metadata

  /** Parsed table metadata (one `vN.metadata.json`). `snapshots` maps
    * snapshot-id → (timestamp-ms, manifest-list path, schema-id);
    * `schemasById` carries EVERY retained schema so time travel can
    * resolve a snapshot under the schema it was committed with;
    * `schemaNodesById` keeps the raw schema JSON per id so
    * field-id-addressed metadata (equality-delete `equality_ids`)
    * resolves to names under the same schema (field ids survive JSON
    * parsing; StructType does not carry them). */
  final case class TableMeta(
      version: Int,
      formatVersion: Int,
      tableUuid: String,
      location: String,
      schema: StructType,
      schemaJson: JsonNode,
      lastColumnId: Int,
      currentSnapshotId: Option[Long],
      snapshots: Seq[SnapshotRef],
      schemasById: Map[Int, StructType],
      schemaNodesById: Map[Int, JsonNode] = Map.empty)

  final case class SnapshotRef(snapshotId: Long, timestampMs: Long,
                               manifestList: String,
                               schemaId: Option[Int])

  private def fs(spark: SparkSession, path: String): (FileSystem, Path) =
    FsUtil.fs(spark, path)

  private def slurp(f: FileSystem, p: Path): String = FsUtil.slurp(f, p)

  /** Highest committed metadata version at `root`, None for a non-
    * Iceberg path. The `version-hint.text` convention (HadoopTables) is
    * exactly a HINT — listing `metadata/` is the truth, so a torn or
    * stale hint can only slow resolution, never serve an old table. */
  def latestMetaVersion(spark: SparkSession, root: String): Option[Int] = {
    val (f, r) = fs(spark, root)
    val md = new Path(r, MetaDir)
    if (!f.exists(md)) return None
    f.listStatus(md).toSeq.flatMap(_.getPath.getName match {
      case VMetaRe(v) => Some(v.toInt)
      case _ => None
    }).maxOption
  }

  def currentMeta(spark: SparkSession, root: String): Option[TableMeta] =
    latestMetaVersion(spark, root).map(v => metaAt(spark, root, v))

  /** Parse `metadata/v{v}.metadata.json`. Format versions 1 and 2 are
    * supported; anything newer fails loudly (v3 adds row lineage and
    * new types this reader would silently mangle). */
  def metaAt(spark: SparkSession, root: String, v: Int): TableMeta = {
    val (f, r) = fs(spark, root)
    val p = new Path(new Path(r, MetaDir), s"v$v.metadata.json")
    require(f.exists(p), s"Iceberg: metadata version $v not present at $root")
    val n = mapper.readTree(slurp(f, p))
    val fv = n.get("format-version").asInt()
    require(fv == 1 || fv == 2,
      s"Iceberg: format-version $fv is not supported (reader handles 1 and 2)")
    // current schema: v2 carries schemas[] + current-schema-id; v1 may
    // carry only the legacy single "schema"
    val schemaNode =
      if (n.hasNonNull("schemas")) {
        val cur = n.get("current-schema-id").asInt()
        n.get("schemas").elements().asScala
          .find(s => s.get("schema-id").asInt() == cur)
          .getOrElse(throw new IllegalStateException(
            s"Iceberg: current-schema-id $cur not found in schemas[]"))
      } else n.get("schema")
    // every retained schema, by id — snapshot reads resolve through
    // this so a post-evolution time travel keeps its OWN shape
    val schemaNodesById: Map[Int, JsonNode] =
      Option(n.get("schemas")).filter(!_.isNull).map {
        _.elements().asScala.map(s =>
          s.get("schema-id").asInt() -> s).toMap
      }.getOrElse(Map.empty)
    val schemasById: Map[Int, StructType] =
      schemaNodesById.map { case (id, s) => id -> structFromIceberg(s) }
    val snaps = Option(n.get("snapshots")).filter(!_.isNull).map {
      _.elements().asScala.map { s =>
        SnapshotRef(s.get("snapshot-id").asLong(),
          s.get("timestamp-ms").asLong(),
          s.get("manifest-list").asText(),
          Option(s.get("schema-id")).filter(!_.isNull).map(_.asInt()))
      }.toSeq
    }.getOrElse(Nil)
    val curSnap = Option(n.get("current-snapshot-id")).filter(!_.isNull)
      .map(_.asLong()).filter(_ != -1L)
    TableMeta(v, fv,
      Option(n.get("table-uuid")).filter(!_.isNull).map(_.asText())
        .getOrElse(""), // optional in format v1
      n.get("location").asText(),
      structFromIceberg(schemaNode), schemaNode,
      n.get("last-column-id").asInt(), curSnap, snaps, schemasById,
      schemaNodesById)
  }

  /** The current Iceberg schema as a Spark StructType. */
  def tableSchema(spark: SparkSession, root: String): StructType =
    currentMeta(spark, root).map(_.schema).getOrElse(
      throw new IllegalStateException(s"Iceberg: no table at $root"))

  // ----------------------------------------------- schema json <-> spark

  /** Iceberg schema JSON → Spark StructType. Every spec v1/v2 type is
    * mapped or rejected loudly — silent coercion would corrupt rows. */
  private[sources] def structFromIceberg(n: JsonNode): StructType = {
    require(n.get("type").asText() == "struct",
      s"Iceberg: schema root must be a struct, got ${n.get("type")}")
    StructType(n.get("fields").elements().asScala.map { fn =>
      StructField(fn.get("name").asText(), typeFromIceberg(fn.get("type")),
        nullable = !fn.get("required").asBoolean())
    }.toSeq)
  }

  private def typeFromIceberg(t: JsonNode): DataType =
    if (t.isTextual) {
      val s = t.asText()
      val Dec = "decimal\\((\\d+),\\s*(\\d+)\\)".r
      val Fix = "fixed\\[(\\d+)\\]".r
      s match {
        case "boolean" => BooleanType
        case "int" => IntegerType
        case "long" => LongType
        case "float" => FloatType
        case "double" => DoubleType
        case "date" => DateType
        case "string" => StringType
        case "uuid" => StringType // 16-byte logical uuid reads as text
        case "binary" => BinaryType
        case "timestamp" => TimestampNTZType // no tz, per spec
        case "timestamptz" => TimestampType
        case Dec(p, sc) => DecimalType(p.toInt, sc.toInt)
        case Fix(_) => BinaryType
        case other => throw new IllegalArgumentException(
          s"Iceberg: unsupported type '$other' (time/timestamp_ns/" +
            "variant/geometry need a newer reader)")
      }
    } else t.get("type").asText() match {
      case "struct" => structFromIceberg(t)
      case "list" => ArrayType(typeFromIceberg(t.get("element")),
        containsNull = !t.get("element-required").asBoolean())
      case "map" => MapType(typeFromIceberg(t.get("key")),
        typeFromIceberg(t.get("value")),
        valueContainsNull = !t.get("value-required").asBoolean())
      case other => throw new IllegalArgumentException(
        s"Iceberg: unsupported nested type '$other'")
    }

  /** Spark StructType → Iceberg schema JSON with sequential field ids
    * (publish path — fresh table, ids are ours to assign). Nested types
    * are rejected loudly: the TxnParquet tables publish flattens are
    * scalar-columned; silently inventing nested ids risks colliding
    * with a future real writer. */
  private def icebergSchemaJson(schema: StructType): ObjectNode = {
    val root = mapper.createObjectNode()
    root.put("type", "struct")
    root.put("schema-id", 0)
    val fields = mapper.createArrayNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fn = mapper.createObjectNode()
      fn.put("id", i + 1)
      fn.put("name", f.name)
      fn.put("required", !f.nullable)
      fn.put("type", f.dataType match {
        case BooleanType => "boolean"
        case IntegerType => "int"
        case LongType => "long"
        case FloatType => "float"
        case DoubleType => "double"
        case DateType => "date"
        case StringType => "string"
        case BinaryType => "binary"
        case TimestampType => "timestamptz"
        case TimestampNTZType => "timestamp"
        case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
        case other => throw new IllegalArgumentException(
          s"Iceberg.publish: unsupported column type ${other.simpleString} " +
            s"for '${f.name}' — publish handles scalar columns")
      })
      fields.add(fn)
    }
    root.set[JsonNode]("fields", fields)
    root
  }

  /** Top-level field-id → column-name map of an Iceberg schema JSON
    * node (equality-delete resolution). Nested field ids are absent on
    * purpose: an equality id addressing a nested field fails the
    * lookup and rejects loudly rather than matching the wrong column. */
  private def fieldIdToName(schemaNode: JsonNode): Map[Int, String] =
    schemaNode.get("fields").elements().asScala
      .map(fn => fn.get("id").asInt() -> fn.get("name").asText()).toMap

  /** Recursively drop StructField metadata so schema equality is
    * structural (name, type, nullability) — see the publish
    * idempotence check. */
  private def stripFieldMetadata(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      StructField(f.name, stripFieldMetadata(f.dataType), f.nullable)))
    case a: ArrayType => a.copy(elementType = stripFieldMetadata(a.elementType))
    case m: MapType => m.copy(keyType = stripFieldMetadata(m.keyType),
      valueType = stripFieldMetadata(m.valueType))
    case other => other
  }

  // --------------------------------------------------------- avro replay

  /** Decode every record of an Avro container file into GenericRecords
    * (driver-side; manifests are KB–MB metadata files by design). */
  private def readAvro(f: FileSystem, p: Path): Seq[GenericRecord] = {
    val in = f.open(p)
    try {
      val reader = new DataFileStream[GenericRecord](in,
        new GenericDatumReader[GenericRecord]())
      try {
        val out = mutable.ArrayBuffer.empty[GenericRecord]
        while (reader.hasNext) out += reader.next()
        out.toSeq
      } finally reader.close()
    } finally in.close()
  }

  private def str(r: GenericRecord, field: String): String =
    Option(r.get(field)).map(_.toString).orNull

  private def longOr(r: GenericRecord, field: String, dflt: Long): Long =
    if (r.getSchema.getField(field) == null) dflt
    else Option(r.get(field)).map(_.asInstanceOf[Number].longValue())
      .getOrElse(dflt)

  /** A snapshot's live file sets (absolute paths), via manifest list →
    * manifests: data files plus v2 POSITION- and EQUALITY-delete files
    * (both applied at scan time by [[readSnapshot]]'s anti-joins).
    * Rejects loudly what a naive scan would silently get wrong:
    * equality deletes missing their `equality_ids` (spec-invalid) and
    * non-parquet files. */
  /** One live data file: its path, its data sequence number (v2
    * merge-on-read ordering; 0 for v1 / seq-less manifests), and, when
    * the manifest carried a `p_date` partition tuple, that value —
    * `pDate` outer None = no partition info (never prune), inner None
    * = null date. */
  private final case class DataFileRef(path: String, seq: Long,
                                       pDate: Option[Option[Int]])

  /** One equality-delete file: its rows delete every data row, in data
    * files with sequence number STRICTLY BELOW `seq`, whose
    * `equalityIds`-addressed columns null-safe-equal a delete row. */
  private final case class EqDeleteRef(path: String, seq: Long,
                                       equalityIds: Seq[Int])

  private final case class SnapshotFiles(data: Seq[DataFileRef],
                                         posDeletes: Seq[String],
                                         eqDeletes: Seq[EqDeleteRef])

  private def liveFiles(spark: SparkSession, root: Path, f: FileSystem,
                        snap: SnapshotRef): SnapshotFiles = {
    val mlPath = resolve(root, snap.manifestList)
    val manifests = readAvro(f, mlPath)
    val data = mutable.ArrayBuffer.empty[DataFileRef]
    val posDel = mutable.ArrayBuffer.empty[String]
    val eqDel = mutable.ArrayBuffer.empty[EqDeleteRef]
    manifests.foreach { m =>
      // manifest-list content: 0 = data manifest, 1 = delete manifest.
      // v2 sequence-number inheritance: an entry whose sequence_number
      // is null/absent takes the manifest's (manifest-list) sequence
      // number; v1 manifest lists carry neither → everything is seq 0,
      // which is exactly the "all data predates all deletes" ordering
      // a v1→v2 upgrade wants.
      val mSeq = longOr(m, "sequence_number", 0L)
      val entries = readAvro(f, resolve(root, str(m, "manifest_path")))
      entries.foreach { e =>
        val status = e.get("status").asInstanceOf[Number].intValue()
        if (status != 2) { // 2 = DELETED in this snapshot
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          val fmt = str(df, "file_format")
          require(fmt != null && fmt.equalsIgnoreCase("parquet"),
            s"Iceberg: data file format '$fmt' is not supported (parquet only)")
          val path = resolve(root, str(df, "file_path")).toString
          val eSeq = longOr(e, "sequence_number", mSeq)
          // data_file content: 0 = data, 1 = position deletes,
          // 2 = equality deletes
          longOr(df, "content", 0L) match {
            case 0L => data += DataFileRef(path, eSeq, pDateOf(df))
            case 1L => posDel += path
            case 2L =>
              val ids: Seq[Int] = (df.getSchema.getField("equality_ids")
                match {
                  case null => Nil
                  case _ => Option(df.get("equality_ids")) match {
                    case Some(l: java.util.List[_]) =>
                      l.asScala.map(_.asInstanceOf[Number].intValue()).toSeq
                    case _ => Nil
                  }
                })
              if (ids.isEmpty) throw new IllegalArgumentException(
                s"Iceberg: snapshot ${snap.snapshotId} carries an EQUALITY " +
                  s"delete file ($path) with no equality_ids — " +
                  "spec-invalid; cannot apply")
              eqDel += EqDeleteRef(path, eSeq, ids)
            case other => throw new IllegalArgumentException(
              s"Iceberg: unknown data_file content $other in $path")
          }
        }
      }
    }
    SnapshotFiles(data.toSeq, posDel.toSeq, eqDel.toSeq)
  }

  /** The `p_date` identity-partition value of a manifest data_file
    * record, when present (days since epoch; inner None = null). */
  private def pDateOf(df: GenericRecord): Option[Option[Int]] = {
    val pf = df.getSchema.getField("partition")
    if (pf == null) return None
    val part = df.get("partition").asInstanceOf[GenericRecord]
    if (part == null || part.getSchema.getField("p_date") == null) None
    else Some(Option(part.get("p_date"))
      .map(_.asInstanceOf[Number].intValue()))
  }

  /** Canonicalize a file URI for position-delete matching: delete files
    * record the data file's path AS THE WRITER SPELLED IT, while
    * Spark's `_metadata.file_path` reports the qualified URI — the two
    * can differ only in scheme spelling (`file:/x` vs `file:///x`).
    * Stripping the scheme and collapsing the authority slashes gives
    * one canonical form on both sides (both inputs name the same
    * filesystem — a snapshot's files live on one store). */
  private def canonPath(c: org.apache.spark.sql.Column)
  : org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.regexp_replace(
      c, "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")

  /** Manifest/data paths may be absolute URIs (what Iceberg writers
    * produce) or table-relative (tolerated for relocated tables). */
  private def resolve(root: Path, p: String): Path = {
    val path = new Path(p)
    if (path.isAbsolute || p.contains("://")) path else new Path(root, path)
  }

  // ---------------------------------------------------------------- read

  /** The current table as a DataFrame (empty-but-typed for a table with
    * no current snapshot). */
  def readTable(spark: SparkSession, root: String): DataFrame = {
    val meta = currentMeta(spark, root).getOrElse(
      throw new IllegalStateException(s"Iceberg: no table at $root"))
    meta.currentSnapshotId match {
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], meta.schema)
      case Some(id) => readSnapshot(spark, root, id)
    }
  }

  /** Time travel: the table as of snapshot `snapshotId` (must still be
    * listed in the current metadata — expired snapshots fail loudly).
    *
    * The snapshot resolves under ITS OWN schema when the metadata
    * records a per-snapshot `schema-id` (Iceberg time-travel
    * semantics: a post-evolution read of an old snapshot keeps the old
    * shape), falling back to the current schema for v1 logs that never
    * recorded one — this publisher never evolves schema ids, so the
    * fallback only ever fires on foreign tables that predate the
    * field.
    *
    * v2 merge-on-read: POSITION deletes (`file_path`, `pos`) are
    * applied at scan time as a distributed anti-join of the data scan
    * (extended with the parquet source's `_metadata.file_path` /
    * `_metadata.row_index` columns) against the delete-file rows — the
    * deletes frame stays a DataFrame end to end, so a snapshot with
    * millions of deleted positions never lands on the driver, and AQE
    * broadcasts it when it is small (the common case). EQUALITY
    * deletes are applied the same way: one anti-join per distinct
    * `equality_ids` set, null-safe on the addressed columns (a NULL in
    * a delete row matches NULL data values, per spec) and scoped by
    * the strict sequence-number rule — the delete hits only data files
    * whose data sequence number is BELOW the delete file's. Equality
    * deletes without `equality_ids` stay a loud rejection
    * (spec-invalid). */
  def readSnapshot(spark: SparkSession, root: String,
                   snapshotId: Long): DataFrame = {
    val (f, r) = fs(spark, root)
    val meta = currentMeta(spark, root).getOrElse(
      throw new IllegalStateException(s"Iceberg: no table at $root"))
    val snap = meta.snapshots.find(_.snapshotId == snapshotId).getOrElse(
      throw new IllegalStateException(
        s"Iceberg: snapshot $snapshotId not in retained history at $root " +
          s"(have ${meta.snapshots.map(_.snapshotId).mkString(", ")})"))
    val schema = snap.schemaId.flatMap(meta.schemasById.get)
      .getOrElse(meta.schema)
    val schemaNode = snap.schemaId.flatMap(meta.schemaNodesById.get)
      .getOrElse(meta.schemaJson)
    val files = liveFiles(spark, r, f, snap)
    assemble(spark, schema, files.data, files.posDeletes, files.eqDeletes,
      fieldIdToName(schemaNode))
  }

  /** Build the snapshot DataFrame from resolved file sets: the data
    * scan, with v2 merge-on-read deletes applied when present —
    * position deletes as a (file, pos) anti-join, equality deletes as
    * one anti-join per distinct `equality_ids` set, null-safe on the
    * addressed columns and scoped by the spec's STRICT sequence-number
    * rule (a delete applies only to data files with a lower data
    * sequence number, so rows committed in the delete's own snapshot
    * survive). The delete frames stay DataFrames end to end (AQE
    * broadcasts the typical small case); the only driver-side piece is
    * the per-FILE sequence map — manifest metadata the reader already
    * holds, one short row per file, shipped as a broadcast join. */
  private def assemble(spark: SparkSession, schema: StructType,
                       data: Seq[DataFileRef],
                       posDeletes: Seq[String],
                       eqDeletes: Seq[EqDeleteRef],
                       idToName: Map[Int, String]): DataFrame = {
    if (data.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else {
      import org.apache.spark.sql.functions.{broadcast, col, lit}
      val dataPaths = data.map(_.path)
      val base = spark.read.schema(schema).parquet(dataPaths: _*)
      if (posDeletes.isEmpty && eqDeletes.isEmpty) return base
      val cols = schema.fieldNames.map(col).toSeq
      var cur = base
        .withColumn("__ice_path", canonPath(col("_metadata.file_path")))
      if (posDeletes.nonEmpty) {
        val dels = spark.read.parquet(posDeletes: _*)
          .select(canonPath(col("file_path")).as("__ice_path"),
            col("pos").cast("long").as("__ice_pos"))
        cur = cur.withColumn("__ice_pos", col("_metadata.row_index"))
          .join(dels, Seq("__ice_path", "__ice_pos"), "left_anti")
          .drop("__ice_pos")
      }
      if (eqDeletes.nonEmpty) {
        // per-file data sequence numbers, keyed by the same canonical
        // path form the scan-side column uses
        import spark.implicits._
        val seqDf = broadcast(
          data.map(d => (canonPathStr(d.path), d.seq))
            .toDF("__ice_path", "__ice_seq"))
        cur = cur.join(seqDf, Seq("__ice_path"), "left")
        eqDeletes.groupBy(_.equalityIds).foreach { case (ids, refs) =>
          val names = ids.map(id => idToName.getOrElse(id,
            throw new IllegalArgumentException(
              s"Iceberg: equality_ids field id $id does not resolve to a " +
                "top-level column of the snapshot schema — cannot apply " +
                "EQUALITY deletes")))
          names.foreach(n => require(schema.fieldNames.contains(n),
            s"Iceberg: equality-delete column '$n' missing from snapshot " +
              "schema"))
          // files sharing a sequence number read in one scan
          val delFrame = refs.groupBy(_.seq).map { case (seq, g) =>
            spark.read.parquet(g.map(_.path): _*)
              .select(names.map(n => col(n).as(s"__del_$n")) :+
                lit(seq).as("__del_seq"): _*)
          }.reduce(_ unionByName _)
          val cond = names.map(n => col(n) <=> col(s"__del_$n"))
            .reduce(_ && _) && col("__del_seq") > col("__ice_seq")
          cur = cur.join(delFrame, cond, "left_anti")
        }
      }
      cur.select(cols: _*)
    }
  }

  /** Driver-side twin of [[canonPath]] for manifest-recorded paths. */
  private def canonPathStr(s: String): String =
    s.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")

  /** Date-pruned read of the current snapshot: `p_date BETWEEN minDate
    * AND maxDate` (inclusive ISO dates), with the FILE LIST pruned
    * driver-side from the manifests' identity-partition tuples before
    * Spark ever lists or opens data — the Iceberg metadata pruning
    * story at work (a one-day read of a year-long table plans 1/365th
    * of the files). Files without partition info are kept (no false
    * pruning on foreign/legacy manifests); files with a NULL partition
    * date are pruned (BETWEEN never selects NULL). The row-level
    * filter is applied regardless, so the result is exactly the
    * filtered relation even when pruning was impossible. Position
    * deletes apply as in [[readSnapshot]]. */
  def readTableForDates(spark: SparkSession, root: String,
                        minDate: String, maxDate: String): DataFrame = {
    val (f, r) = fs(spark, root)
    val meta = currentMeta(spark, root).getOrElse(
      throw new IllegalStateException(s"Iceberg: no table at $root"))
    require(meta.schema.fieldNames.contains("p_date"),
      s"Iceberg.readTableForDates: table at $root has no p_date column")
    val lo = java.time.LocalDate.parse(minDate).toEpochDay.toInt
    val hi = java.time.LocalDate.parse(maxDate).toEpochDay.toInt
    require(lo <= hi, s"empty date range: $minDate > $maxDate")
    import org.apache.spark.sql.functions.{col, lit}
    val pred = col("p_date").between(
      lit(minDate).cast("date"), lit(maxDate).cast("date"))
    meta.currentSnapshotId match {
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], meta.schema).filter(pred)
      case Some(id) =>
        val snap = meta.snapshots.find(_.snapshotId == id).get
        val files = liveFiles(spark, r, f, snap)
        val kept = files.data.filter(d => d.pDate match {
          case None => true // no partition info — never prune
          case Some(None) => false // NULL date can't satisfy BETWEEN
          case Some(Some(days)) => days >= lo && days <= hi
        })
        assemble(spark, meta.schema, kept, files.posDeletes,
          files.eqDeletes, fieldIdToName(meta.schemaJson))
          .filter(pred)
    }
  }

  /** Does metadata version `v` at `root` declare the p_date identity
    * partition spec? (Publish never EVOLVES a spec — an existing
    * unpartitioned table stays unpartitioned.) */
  private def specIsPartitioned(spark: SparkSession, root: String,
                                v: Int): Boolean = {
    val (f, r) = fs(spark, root)
    val p = new Path(new Path(r, MetaDir), s"v$v.metadata.json")
    if (!f.exists(p)) return false
    val n = mapper.readTree(slurp(f, p))
    Option(n.get("partition-specs")).filter(!_.isNull)
      .flatMap(_.elements().asScala.find(s =>
        s.get("spec-id").asInt() == Option(n.get("default-spec-id"))
          .map(_.asInt()).getOrElse(0)))
      .map(_.get("fields").size() > 0)
      .orElse(Option(n.get("partition-spec")).filter(!_.isNull)
        .map(_.size() > 0))
      .getOrElse(false)
  }

  /** `TIMESTAMP AS OF` resolution: the newest snapshot whose committed
    * `timestamp-ms` is at or before `tsMicros` (snapshot timestamps are
    * IN the metadata — no mtime heuristics needed on this format). */
  def snapshotAtTime(spark: SparkSession, root: String,
                     tsMicros: Long): Option[Long] =
    currentMeta(spark, root).flatMap(_.snapshots
      .filter(_.timestampMs * 1000L <= tsMicros)
      .sortBy(s => (s.timestampMs, s.snapshotId)).lastOption
      .map(_.snapshotId))

  // ------------------------------------------------------------- publish

  // Avro schemas for the v1 manifest list / manifest, with the spec's
  // field-ids attached so real Iceberg readers resolve them by id.
  private val ManifestFileSchema = new AvroSchema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null,"field-id":503},
      |{"name":"added_data_files_count","type":["null","int"],"default":null,"field-id":504},
      |{"name":"existing_data_files_count","type":["null","int"],"default":null,"field-id":505},
      |{"name":"deleted_data_files_count","type":["null","int"],"default":null,"field-id":506},
      |{"name":"added_rows_count","type":["null","long"],"default":null,"field-id":512},
      |{"name":"existing_rows_count","type":["null","long"],"default":null,"field-id":513},
      |{"name":"deleted_rows_count","type":["null","long"],"default":null,"field-id":514}
      |]}""".stripMargin.replace("\n", ""))

  private val ManifestEntrySchema = new AvroSchema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104},
      |{"name":"block_size_in_bytes","type":"long","field-id":105}
      |]}}]}""".stripMargin.replace("\n", ""))

  // Partitioned twin: the data_file.partition record carries the
  // identity-transformed `p_date` value (Iceberg date = int days since
  // epoch; field-id 1000 matches the metadata's partition-spec), so
  // spec-compliant engines prune manifest entries by date without
  // touching data files. TxnParquet's layout guarantees the invariant
  // a partition tuple asserts — every row of a chunk's `p_dir=<date>`
  // file carries exactly that p_date.
  private val ManifestEntrySchemaPart = new AvroSchema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[
      |{"name":"p_date","type":["null",{"type":"int","logicalType":"date"}],"default":null,"field-id":1000}
      |]}},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104},
      |{"name":"block_size_in_bytes","type":"long","field-id":105}
      |]}}]}""".stripMargin.replace("\n", ""))

  private def writeAvro(f: FileSystem, p: Path, schema: AvroSchema,
                        meta: Map[String, String],
                        rows: Seq[GenericRecord]): Long = {
    val out = f.create(p, false)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, out) // closes `out` on w.close()
    try rows.foreach(w.append)
    finally w.close()
    f.getFileStatus(p).getLen
  }

  /** Make the TxnParquet table at `txnPath` ALSO a valid Iceberg v1
    * table by synthesizing `metadata/` at the same root from its live
    * manifest — metadata only, zero data movement. The export is
    * PARTITIONED on `p_date` (identity transform) when the committed
    * schema carries it as a DATE: the TxnParquet layout already holds
    * exactly one date per file, so each manifest entry's partition
    * tuple is true by construction and spec-compliant engines (and
    * [[readTableForDates]]) prune by date from the KB-sized manifests
    * without touching data. An EXISTING table published unpartitioned
    * by an earlier version keeps its empty spec — partition-spec
    * EVOLUTION is out of scope, and silently redefining spec-id 0
    * would contradict the old snapshots' manifests. Idempotent:
    * re-publishing an unchanged file set commits nothing. Returns the
    * metadata version now live. Mirrors [[DeltaLake.publish]]; the two
    * logs coexist at one root. `preCommit` is a test seam modeling a
    * concurrent publisher landing between snapshot read and metadata
    * publication. */
  def publish(spark: SparkSession, txnPath: String,
              preCommit: () => Unit = () => ()): Int = {
    val m = TxnParquet.currentManifest(spark, txnPath).getOrElse(
      throw new IllegalStateException(
        s"Iceberg.publish: no committed TxnParquet table at $txnPath"))
    val (f, root) = fs(spark, txnPath)
    val qualifiedRoot = f.makeQualified(root)
    val liveDirs = m._2.values.toSeq.distinct
    // (absolute path, byte size, exact row count, dateKey). Row counts
    // come from the parquet FOOTERS (driver-side, one KB-read per live
    // file, bounded by the sink's chunk counts) because real Iceberg
    // engines trust `record_count` for stats and count(*) shortcuts —
    // writing a wrong value would corrupt THEIR results, not just
    // ours. The dateKey rides along from the TxnParquet manifest (one
    // date per live dir) to become the file's partition tuple.
    val live: Seq[(String, Long, Long, String)] =
      m._2.toSeq.flatMap { case (dateKey, rel) =>
        val dir = new Path(root, rel)
        if (!f.exists(dir)) Nil
        else f.listStatus(dir).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map { st =>
            val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
              org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                st.getPath, f.getConf))
            val rows = try rd.getRecordCount finally rd.close()
            (s"$qualifiedRoot/$rel/${st.getPath.getName}", st.getLen, rows,
              dateKey)
          }
      }.sortBy(_._1)
    val schema = m._3.getOrElse(
      spark.read.parquet(liveDirs.map(r => s"$txnPath/$r"): _*).schema)

    val cur = currentMeta(spark, txnPath)
    val curFiles: Option[SnapshotFiles] = cur.flatMap { meta =>
      meta.currentSnapshotId.flatMap(id =>
        meta.snapshots.find(_.snapshotId == id))
        .map(s => liveFiles(spark, root, f, s))
    }
    // STRUCTURAL schema compare (names/types/nullability), not raw
    // StructType.json equality: the Iceberg JSON round-trip drops
    // StructField metadata, so a source schema carrying any metadata
    // would otherwise read back "changed" forever and every publish of
    // an unchanged table would commit a spurious snapshot
    val schemaChanged = !cur.exists(m =>
      stripFieldMetadata(m.schema) == stripFieldMetadata(schema))
    val filesUnchanged = curFiles.exists(sf =>
      sf.posDeletes.isEmpty && sf.eqDeletes.isEmpty &&
        sf.data.map(_.path).sorted == live.map(_._1))
    if (cur.isDefined && filesUnchanged && !schemaChanged)
      return cur.get.version

    val md = new Path(root, MetaDir)
    f.mkdirs(md)
    val nextV = cur.map(_.version + 1).getOrElse(1)
    val snapId = nextV.toLong // deterministic, strictly increasing
    val nowMs = System.currentTimeMillis()
    val uid = java.util.UUID.randomUUID().toString

    // partition on p_date when the schema carries it as a DATE — but
    // NEVER redefine an existing table's spec (see scaladoc): a table
    // first published unpartitioned stays unpartitioned
    val pDateIdx = schema.fields.indexWhere(fl =>
      fl.name == "p_date" && fl.dataType == DateType)
    val partitioned = pDateIdx >= 0 &&
      cur.forall(c => specIsPartitioned(spark, txnPath, c.version))
    val entrySchema =
      if (partitioned) ManifestEntrySchemaPart else ManifestEntrySchema
    val specFieldsJson =
      if (partitioned)
        s"""[{"name":"p_date","transform":"identity","source-id":${pDateIdx + 1},"field-id":1000}]"""
      else "[]"

    // 1. ONE manifest for the whole live set (self-contained snapshot)
    val entries = live.map { case (path, size, rows, dateKey) =>
      val dfr = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      dfr.put("file_path", path)
      dfr.put("file_format", "PARQUET")
      val part = new GenericData.Record(
        dfr.getSchema.getField("partition").schema())
      if (partitioned && dateKey != "null")
        part.put("p_date", java.time.LocalDate.parse(dateKey)
          .toEpochDay.toInt)
      dfr.put("partition", part)
      dfr.put("record_count", rows)
      dfr.put("file_size_in_bytes", size)
      dfr.put("block_size_in_bytes", 64L * 1024 * 1024)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED (self-contained snapshot)
      e.put("snapshot_id", snapId)
      e.put("data_file", dfr)
      e
    }
    val schemaJson = icebergSchemaJson(schema)
    val manifestPath = new Path(md, s"manifest-$uid.avro")
    val manifestLen = writeAvro(f, manifestPath, entrySchema,
      Map("schema" -> mapper.writeValueAsString(schemaJson),
        "partition-spec" -> specFieldsJson, "partition-spec-id" -> "0",
        "format-version" -> "1", "content" -> "data"), entries)

    // 2. the snapshot's manifest list
    val mf = new GenericData.Record(ManifestFileSchema)
    mf.put("manifest_path", s"$qualifiedRoot/$MetaDir/${manifestPath.getName}")
    mf.put("manifest_length", manifestLen)
    mf.put("partition_spec_id", 0)
    mf.put("added_snapshot_id", snapId)
    mf.put("added_data_files_count", live.size)
    mf.put("existing_data_files_count", 0)
    mf.put("deleted_data_files_count", 0)
    mf.put("added_rows_count", live.map(_._3).sum)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", 0L)
    val mlPath = new Path(md, s"snap-$snapId-$uid.avro")
    writeAvro(f, mlPath, ManifestFileSchema,
      Map("snapshot-id" -> snapId.toString,
        "parent-snapshot-id" -> cur.flatMap(_.currentSnapshotId)
          .map(_.toString).getOrElse("null"),
        "format-version" -> "1"), Seq(mf))

    // 3. vN.metadata.json — atomic put-if-absent commit
    val meta = mapper.createObjectNode()
    meta.put("format-version", 1)
    meta.put("table-uuid",
      cur.map(_.tableUuid).getOrElse(java.util.UUID.randomUUID().toString))
    meta.put("location", qualifiedRoot.toString)
    meta.put("last-updated-ms", nowMs)
    meta.put("last-column-id", schema.fields.length)
    meta.set[JsonNode]("schema", schemaJson)
    val schemas = mapper.createArrayNode(); schemas.add(schemaJson)
    meta.set[JsonNode]("schemas", schemas)
    meta.put("current-schema-id", 0)
    val specFields = mapper.readTree(specFieldsJson)
    val spec = mapper.createObjectNode()
    spec.put("spec-id", 0)
    spec.set[JsonNode]("fields", specFields)
    // v1 legacy key carries the same fields; v2-era readers use
    // partition-specs/default-spec-id
    meta.set[JsonNode]("partition-spec", mapper.readTree(specFieldsJson))
    val specs = mapper.createArrayNode(); specs.add(spec)
    meta.set[JsonNode]("partition-specs", specs)
    meta.put("default-spec-id", 0)
    meta.put("last-partition-id", if (partitioned) 1000 else 999)
    // schema.name-mapping.default: the data files are pre-existing
    // parquet WITHOUT Iceberg field ids (publish moves no data), and
    // the spec's column-projection rule says a spec-compliant reader
    // resolves id-less files through the table's name mapping — without
    // it, engines that don't fall back to positional ids (e.g. Trino)
    // would project every column as NULL. Maps each column name to the
    // field id icebergSchemaJson assigned it (sequential, 1-based).
    val props = mapper.createObjectNode()
    val nameMapping = mapper.createArrayNode()
    schema.fields.zipWithIndex.foreach { case (fld, i) =>
      val e = mapper.createObjectNode()
      e.put("field-id", i + 1)
      val names = mapper.createArrayNode(); names.add(fld.name)
      e.set[JsonNode]("names", names)
      nameMapping.add(e)
    }
    props.put("schema.name-mapping.default",
      mapper.writeValueAsString(nameMapping))
    meta.set[JsonNode]("properties", props)
    meta.put("current-snapshot-id", snapId)
    val snaps = mapper.createArrayNode()
    def snapNode(s: SnapshotRef): ObjectNode = {
      val sn = mapper.createObjectNode()
      sn.put("snapshot-id", s.snapshotId)
      sn.put("timestamp-ms", s.timestampMs)
      sn.put("manifest-list", s.manifestList)
      s.schemaId.foreach(id => sn.put("schema-id", id))
      val sm = mapper.createObjectNode(); sm.put("operation", "overwrite")
      sn.set[JsonNode]("summary", sm)
      sn
    }
    cur.toSeq.flatMap(_.snapshots).foreach(s => snaps.add(snapNode(s)))
    snaps.add(snapNode(SnapshotRef(snapId, nowMs,
      s"$qualifiedRoot/$MetaDir/${mlPath.getName}", schemaId = Some(0))))
    meta.set[JsonNode]("snapshots", snaps)
    val slog = mapper.createArrayNode()
    cur.toSeq.flatMap(_.snapshots).foreach { s =>
      val e = mapper.createObjectNode()
      e.put("timestamp-ms", s.timestampMs); e.put("snapshot-id", s.snapshotId)
      slog.add(e)
    }
    val slogE = mapper.createObjectNode()
    slogE.put("timestamp-ms", nowMs); slogE.put("snapshot-id", snapId)
    slog.add(slogE)
    meta.set[JsonNode]("snapshot-log", slog)

    val tmp = new Path(md, s".tmp-$uid.metadata.json")
    val out = f.create(tmp, false)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(meta)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    preCommit() // test seam: a concurrent publisher lands here
    if (!AtomicFs.putIfAbsent(f, tmp, new Path(md, s"v$nextV.metadata.json"))) {
      f.delete(manifestPath, false); f.delete(mlPath, false)
      throw new IllegalStateException(
        s"Iceberg: concurrent commit detected — metadata version $nextV " +
          s"already exists at $txnPath (optimistic-concurrency loser)")
    }
    // version-hint is a HINT (readers fall back to listing); last write
    // wins is acceptable by the HadoopTables convention
    val hint = new Path(md, VersionHint)
    val ho = f.create(hint, true)
    try ho.write(nextV.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally ho.close()
    nextV
  }

  // ---------------------------------- v2 merge-on-read fixture (interop)

  // v2 twins of the v1 writer schemas: the manifest-list record grows
  // `content` (0 = data, 1 = deletes) and the manifest entry's
  // data_file grows `content` (0 = data, 1 = position deletes).
  private val ManifestFileSchemaV2 = new AvroSchema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"added_snapshot_id","type":["null","long"],"default":null,"field-id":503},
      |{"name":"added_data_files_count","type":["null","int"],"default":null,"field-id":504},
      |{"name":"existing_data_files_count","type":["null","int"],"default":null,"field-id":505},
      |{"name":"deleted_data_files_count","type":["null","int"],"default":null,"field-id":506}
      |]}""".stripMargin.replace("\n", ""))

  private val ManifestEntrySchemaV2 = new AvroSchema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
      |{"name":"content","type":"int","field-id":134},
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"partition","field-id":102,"type":{"type":"record","name":"r102","fields":[]}},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104},
      |{"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null,"field-id":135}
      |]}}]}""".stripMargin.replace("\n", ""))

  /** FOREIGN-WRITER FIXTURE: graft a v2 position-delete commit onto an
    * existing table, synthesizing exactly the artifacts a modern engine
    * writer (Flink, Spark+Iceberg ≥ 3.4 defaults) leaves behind — a
    * position-delete parquet file (`file_path` STRING, `pos` LONG), its
    * delete manifest, a manifest list carrying the existing data
    * manifests plus the delete manifest, and a new format-version-2
    * metadata version. Exists so the spec and the q317 probe can
    * exercise [[readSnapshot]]'s merge-on-read replay without the
    * Iceberg runtime on the classpath; it is NOT part of the publish
    * surface (this library's own commits stay copy-on-write).
    * `deletes` = (absolute data-file path as spelled in the manifest,
    * 0-based row position). Returns the new metadata version. */
  private[graft] def stageForeignPositionDeletes(
      spark: SparkSession, root: String,
      deletes: Seq[(String, Long)]): Int = {
    require(deletes.nonEmpty, "stageForeignPositionDeletes: empty delete set")
    val delSchema = StructType(Seq(
      StructField("file_path", StringType, nullable = false),
      StructField("pos", LongType, nullable = false)))
    stageForeignDeleteCommit(spark, root,
      deletes.map { case (p, pos) => Row(p, pos) }, delSchema,
      content = 1, equalityIds = Nil, deleteSeq = None)
  }

  /** FOREIGN-WRITER FIXTURE, equality flavor: graft a v2
    * EQUALITY-delete commit onto an existing table — the shape a
    * Flink CDC / upsert writer leaves behind (a parquet file of
    * equality-column values plus a delete manifest whose entry carries
    * `equality_ids` and a data sequence number above every live data
    * file's). `rows` carry values for exactly `eqCols` (order
    * matters); a NULL value matches NULL data values, per spec.
    * `deleteSeq` overrides the commit's data sequence number — pass
    * the CURRENT last-sequence-number to model a delete that
    * sequences with (and therefore, under the spec's strict-inequality
    * rule, does NOT hit) the live data files. Returns the new
    * metadata version. */
  private[graft] def stageForeignEqualityDeletes(
      spark: SparkSession, root: String, eqCols: Seq[String],
      rows: Seq[Row], deleteSeq: Option[Long] = None): Int = {
    require(eqCols.nonEmpty, "stageForeignEqualityDeletes: no columns")
    require(rows.nonEmpty, "stageForeignEqualityDeletes: empty delete set")
    val cur = currentMeta(spark, root).getOrElse(
      throw new IllegalStateException(s"Iceberg: no table at $root"))
    val idByName = fieldIdToName(cur.schemaJson).map(_.swap)
    val ids = eqCols.map(c => idByName.getOrElse(c,
      throw new IllegalArgumentException(
        s"stageForeignEqualityDeletes: '$c' is not a top-level column")))
    val delSchema = StructType(eqCols.map(c =>
      cur.schema(cur.schema.fieldIndex(c)).copy(nullable = true)))
    stageForeignDeleteCommit(spark, root, rows, delSchema,
      content = 2, equalityIds = ids, deleteSeq = deleteSeq)
  }

  /** Shared fixture plumbing: write the delete parquet, its delete
    * manifest (entry content = `content`, explicit sequence number),
    * a manifest list carrying the existing data manifests, and a new
    * format-v2 metadata version whose snapshot/last sequence numbers
    * advance past the live data files'. */
  private def stageForeignDeleteCommit(
      spark: SparkSession, root: String, delRows: Seq[Row],
      delSchema: StructType, content: Int, equalityIds: Seq[Int],
      deleteSeq: Option[Long]): Int = {
    val (f, r) = fs(spark, root)
    val qualifiedRoot = f.makeQualified(r)
    val cur = currentMeta(spark, root).getOrElse(
      throw new IllegalStateException(s"Iceberg: no table at $root"))
    val curSnap = cur.currentSnapshotId
      .flatMap(id => cur.snapshots.find(_.snapshotId == id)).getOrElse(
        throw new IllegalStateException(
          s"Iceberg: no current snapshot to delete from at $root"))
    val md = new Path(r, MetaDir)
    val uid = java.util.UUID.randomUUID().toString
    val snapId = cur.snapshots.map(_.snapshotId).max + 1L
    val nowMs = System.currentTimeMillis()

    // 1. the delete parquet file (written by Spark, moved to a
    // stable name — the manifest records the final absolute path)
    val stage = new Path(r, s".delstage-$uid")
    spark.createDataFrame(delRows.asJava, delSchema)
      .coalesce(1).write.parquet(stage.toString)
    val part = f.listStatus(stage).toSeq.map(_.getPath)
      .find(p => p.getName.startsWith("part-") &&
        p.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(
        s"Iceberg fixture: no parquet part written under $stage"))
    val delFile = new Path(r, s"delete-$uid.parquet")
    require(f.rename(part, delFile),
      s"Iceberg fixture: rename $part -> $delFile failed")
    f.delete(stage, true)
    val delLen = f.getFileStatus(delFile).getLen

    // 2. the delete manifest (one entry, data_file content = 1 or 2,
    // explicit data sequence number — deletes must sequence AFTER the
    // live data files, whose v1-upgraded entries inherit seq 0)
    val treePath = new Path(md, s"v${cur.version}.metadata.json")
    val tree = mapper.readTree(slurp(f, treePath)).asInstanceOf[ObjectNode]
    val lastSeq = Option(tree.get("last-sequence-number"))
      .filterNot(_.isNull).map(_.asLong()).getOrElse(0L)
    val newSeq = deleteSeq.getOrElse(lastSeq + 1L)
    val dfr = new GenericData.Record(
      ManifestEntrySchemaV2.getField("data_file").schema())
    dfr.put("content", content)
    dfr.put("file_path", f.makeQualified(delFile).toString)
    dfr.put("file_format", "PARQUET")
    dfr.put("partition", new GenericData.Record(
      dfr.getSchema.getField("partition").schema()))
    dfr.put("record_count", delRows.size.toLong)
    dfr.put("file_size_in_bytes", delLen)
    if (equalityIds.nonEmpty)
      dfr.put("equality_ids", equalityIds.map(Int.box).asJava)
    val entry = new GenericData.Record(ManifestEntrySchemaV2)
    entry.put("status", 1)
    entry.put("snapshot_id", snapId)
    entry.put("sequence_number", java.lang.Long.valueOf(newSeq))
    entry.put("data_file", dfr)
    val delManifest = new Path(md, s"manifest-$uid-deletes.avro")
    val delManifestLen = writeAvro(f, delManifest, ManifestEntrySchemaV2,
      Map("schema" -> mapper.writeValueAsString(cur.schemaJson),
        "partition-spec" -> "[]", "partition-spec-id" -> "0",
        "format-version" -> "2", "content" -> "deletes"), Seq(entry))

    // 3. the manifest list: existing data manifests carried over
    // (content preserved) + the new delete manifest
    val carried = readAvro(f, resolve(r, curSnap.manifestList)).map { m =>
      val rec = new GenericData.Record(ManifestFileSchemaV2)
      rec.put("manifest_path", str(m, "manifest_path"))
      rec.put("manifest_length", longOr(m, "manifest_length", 0L))
      rec.put("partition_spec_id",
        longOr(m, "partition_spec_id", 0L).toInt)
      rec.put("content", longOr(m, "content", 0L).toInt)
      rec.put("added_snapshot_id", longOr(m, "added_snapshot_id", snapId))
      rec
    }
    val delMf = new GenericData.Record(ManifestFileSchemaV2)
    delMf.put("manifest_path",
      s"$qualifiedRoot/$MetaDir/${delManifest.getName}")
    delMf.put("manifest_length", delManifestLen)
    delMf.put("partition_spec_id", 0)
    delMf.put("content", 1)
    delMf.put("added_snapshot_id", snapId)
    val mlPath = new Path(md, s"snap-$snapId-$uid.avro")
    writeAvro(f, mlPath, ManifestFileSchemaV2,
      Map("snapshot-id" -> snapId.toString, "format-version" -> "2"),
      carried :+ delMf)

    // 4. new metadata version: the old tree upgraded to format v2 with
    // the new snapshot appended and made current
    tree.put("format-version", 2)
    tree.put("last-sequence-number", math.max(lastSeq, newSeq))
    tree.put("last-updated-ms", nowMs)
    tree.put("current-snapshot-id", snapId)
    if (!tree.hasNonNull("sort-orders")) {
      val so = mapper.createObjectNode()
      so.put("order-id", 0)
      so.set[JsonNode]("fields", mapper.createArrayNode())
      val sos = mapper.createArrayNode(); sos.add(so)
      tree.set[JsonNode]("sort-orders", sos)
      tree.put("default-sort-order-id", 0)
    }
    val sn = mapper.createObjectNode()
    sn.put("snapshot-id", snapId)
    sn.put("sequence-number", newSeq)
    sn.put("timestamp-ms", nowMs)
    sn.put("manifest-list", s"$qualifiedRoot/$MetaDir/${mlPath.getName}")
    curSnap.schemaId.foreach(id => sn.put("schema-id", id))
    val sm = mapper.createObjectNode(); sm.put("operation", "delete")
    sn.set[JsonNode]("summary", sm)
    tree.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("snapshots")
      .add(sn)
    val sl = mapper.createObjectNode()
    sl.put("timestamp-ms", nowMs); sl.put("snapshot-id", snapId)
    tree.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("snapshot-log")
      .add(sl)

    val nextV = cur.version + 1
    val tmp = new Path(md, s".tmp-$uid.metadata.json")
    val out = f.create(tmp, false)
    try out.write(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(tree)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!AtomicFs.putIfAbsent(f, tmp, new Path(md, s"v$nextV.metadata.json")))
      throw new IllegalStateException(
        s"Iceberg fixture: concurrent commit at $root (v$nextV exists)")
    val hint = new Path(md, VersionHint)
    val ho = f.create(hint, true)
    try ho.write(nextV.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally ho.close()
    nextV
  }

  /** Reclaim crashed-publisher debris under `metadata/`: `.tmp-*`
    * commit files and `*.avro` manifests/manifest-lists referenced by
    * NO retained `vN.metadata.json` — a publisher that dies between
    * staging its Avro files and the metadata put-if-absent leaves
    * exactly these orphans (the [[DeltaLake.DeltaDateSink.vacuum]]
    * counterpart). Age-gated (`debrisMs`) so an IN-FLIGHT publisher's
    * staging is never swept; committed metadata versions are kept (KBs,
    * and they are the time-travel history). */
  def vacuum(spark: SparkSession, root: String,
             debrisMs: Long = 60L * 60 * 1000): Unit = {
    val (f, r) = fs(spark, root)
    val md = new Path(r, MetaDir)
    if (!f.exists(md)) return
    val versions = f.listStatus(md).toSeq.flatMap(_.getPath.getName match {
      case VMetaRe(v) => Some(v.toInt)
      case _ => None
    })
    val referenced = mutable.Set.empty[String]
    versions.foreach { v =>
      metaAt(spark, root, v).snapshots.foreach { s =>
        val ml = resolve(r, s.manifestList)
        referenced += ml.getName
        if (f.exists(ml))
          readAvro(f, ml).foreach(m =>
            referenced += new Path(str(m, "manifest_path")).getName)
      }
    }
    val cutoff = System.currentTimeMillis() - debrisMs
    f.listStatus(md).foreach { st =>
      val n = st.getPath.getName
      val orphan = st.isFile && st.getModificationTime < cutoff &&
        (n.startsWith(".tmp-") ||
          (n.endsWith(".avro") && !referenced.contains(n)))
      if (orphan) f.delete(st.getPath, false)
    }
  }
}
