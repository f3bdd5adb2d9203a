package graft.sources

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnParquet.TxnParquetSink

/** Iceberg table-format interop (Iceberg.scala): metadata resolution,
  * manifest-list/manifest Avro replay, snapshot + timestamp travel, the
  * TxnParquet publish round-trip, and the loud unsupported-feature
  * rejections (format v3, delete files, non-parquet, unknown types). */
class IcebergSpec extends AnyFunSuite {

  // the JVM-wide shared session (a per-suite extension-less
  // getOrCreate here would poison later suites that need the graft
  // extensions — getOrCreate returns whichever session was built first)
  private lazy val spark: SparkSession = graft.SharedSpark.spark

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def df(rows: Seq[(Int, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "dt_s", "v").withColumn("dt", to_timestamp(col("dt_s")))
      .drop("dt_s").select("k", "dt", "v")
  }

  private def asSet(d: DataFrame): Set[(Int, String, Double)] =
    d.select(col("k"), date_format(col("dt"), "yyyy-MM-dd HH:mm:ss"), col("v"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet

  test("publish: a TxnParquet table becomes a readable Iceberg table, zero data movement") {
    val dir = tmp("iceberg_publish")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq(
      (1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-02 10:00:00", 2.0))))
    val v1 = Iceberg.publish(spark, dir)
    assert(v1 === 1)
    // spec-conformant bits on disk
    val md = new java.io.File(dir, "metadata")
    assert(md.isDirectory)
    assert(new java.io.File(md, "v1.metadata.json").isFile)
    assert(new java.io.File(md, "version-hint.text").isFile)
    assert(md.listFiles().exists(_.getName.startsWith("snap-")))
    assert(md.listFiles().exists(_.getName.startsWith("manifest-")))
    // the Iceberg view equals the native view (p_date is a data column)
    val ice = Iceberg.readTable(spark, dir).drop("p_date")
    assert(asSet(ice) === asSet(txn.read(spark)))
    // schema came from metadata, not inference
    assert(Iceberg.tableSchema(spark, dir).fieldNames.toSeq
      .containsSlice(Seq("k", "dt", "v")))
    // idempotent: unchanged file set commits nothing
    assert(Iceberg.publish(spark, dir) === 1)
  }

  test("snapshot + timestamp travel: old snapshots stay pinned after republish") {
    val dir = tmp("iceberg_travel")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq((1, "2024-01-01 10:00:00", 1.0))))
    assert(Iceberg.publish(spark, dir) === 1)
    txn.mergeLastWins(df(Seq((1, "2024-01-01 10:00:00", 9.0),
      (2, "2024-01-02 10:00:00", 2.0))), Seq("k", "dt"))
    assert(Iceberg.publish(spark, dir) === 2)

    val meta = Iceberg.currentMeta(spark, dir).get
    assert(meta.snapshots.map(_.snapshotId) === Seq(1L, 2L))
    assert(meta.currentSnapshotId === Some(2L))
    // current = post-merge; snapshot 1 = pre-merge, still readable
    assert(asSet(Iceberg.readTable(spark, dir).drop("p_date")) === Set(
      (1, "2024-01-01 10:00:00", 9.0), (2, "2024-01-02 10:00:00", 2.0)))
    assert(asSet(Iceberg.readSnapshot(spark, dir, 1L).drop("p_date")) === Set(
      (1, "2024-01-01 10:00:00", 1.0)))
    // timestamp travel resolves on the metadata's own timestamp-ms
    val t1 = meta.snapshots.head.timestampMs
    assert(Iceberg.snapshotAtTime(spark, dir, t1 * 1000L) === Some(1L))
    assert(Iceberg.snapshotAtTime(spark, dir,
      System.currentTimeMillis() * 1000L + 1000000L) === Some(2L))
    assert(Iceberg.snapshotAtTime(spark, dir, (t1 - 10000) * 1000L) === None)
    // an expired/unknown snapshot id fails loudly
    val ex = intercept[IllegalStateException] {
      Iceberg.readSnapshot(spark, dir, 99L)
    }
    assert(ex.getMessage.contains("not in retained history"))
  }

  test("concurrent publish: same next version loses loudly (AtomicFs)") {
    val dir = tmp("iceberg_race")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq((1, "2024-01-01 10:00:00", 1.0))))
    assert(Iceberg.publish(spark, dir) === 1)
    txn.mergeLastWins(df(Seq((2, "2024-01-02 10:00:00", 2.0))), Seq("k", "dt"))
    // a racer lands v2 BETWEEN this publisher's snapshot read and its
    // metadata publication (the preCommit seam): the put-if-absent on
    // v2.metadata.json must make this publisher lose loudly instead of
    // clobbering the racer's commit
    val md = new java.io.File(dir, "metadata")
    val ex = intercept[IllegalStateException] {
      Iceberg.publish(spark, dir, preCommit = () =>
        assert(new java.io.File(md, "v2.metadata.json").createNewFile()))
    }
    assert(ex.getMessage.contains("concurrent commit"))
  }

  test("reader rejects format-version 3 and equality-delete files loudly") {
    val dir = tmp("iceberg_reject")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq((1, "2024-01-01 10:00:00", 1.0))))
    Iceberg.publish(spark, dir)
    val md = new java.io.File(dir, "metadata")

    // format-version 3 → loud
    val v1 = new String(Files.readAllBytes(
      new java.io.File(md, "v1.metadata.json").toPath))
    Files.write(new java.io.File(md, "v2.metadata.json").toPath,
      v1.replace("\"format-version\" : 1", "\"format-version\" : 3").getBytes)
    val e1 = intercept[IllegalArgumentException] {
      Iceberg.readTable(spark, dir)
    }
    assert(e1.getMessage.contains("format-version 3"))
    assert(new java.io.File(md, "v2.metadata.json").delete())

    // an EQUALITY-delete manifest entry (data_file content = 2) with
    // NO equality_ids → loud. Position AND well-formed equality
    // deletes are APPLIED since round 13 (see the merge-on-read tests
    // below); an ids-less equality delete is spec-invalid and stays a
    // rejection — silently skipping it would resurrect deleted rows.
    val entrySchema = new AvroSchema.Parser().parse(
      """{"type":"record","name":"manifest_entry","fields":[
        |{"name":"status","type":"int"},
        |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
        |{"name":"content","type":"int"},
        |{"name":"file_path","type":"string"},
        |{"name":"file_format","type":"string"},
        |{"name":"record_count","type":"long"},
        |{"name":"file_size_in_bytes","type":"long"}
        |]}}]}""".stripMargin.replace("\n", ""))
    val dfr = new GenericData.Record(
      entrySchema.getField("data_file").schema())
    dfr.put("content", 2) // EQUALITY deletes
    dfr.put("file_path", s"$dir/eq-del.parquet")
    dfr.put("file_format", "PARQUET")
    dfr.put("record_count", 1L)
    dfr.put("file_size_in_bytes", 1L)
    val entry = new GenericData.Record(entrySchema)
    entry.put("status", 1)
    entry.put("data_file", dfr)
    val eqManifest = new java.io.File(md, "manifest-eqdel.avro")
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](entrySchema))
    w.create(entrySchema, eqManifest)
    w.append(entry); w.close()

    val mlName = md.listFiles().map(_.getName).filter(_.startsWith("snap-")).head
    val v2MlSchema = new AvroSchema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string"},
        |{"name":"manifest_length","type":"long"},
        |{"name":"partition_spec_id","type":"int"},
        |{"name":"content","type":"int"},
        |{"name":"added_snapshot_id","type":["null","long"],"default":null}
        |]}""".stripMargin.replace("\n", ""))
    val delMf = new GenericData.Record(v2MlSchema)
    delMf.put("manifest_path", eqManifest.getAbsolutePath)
    delMf.put("manifest_length", eqManifest.length())
    delMf.put("partition_spec_id", 0)
    delMf.put("content", 1) // DELETES manifest
    delMf.put("added_snapshot_id", 1L)
    val mlFile = new java.io.File(md, mlName)
    assert(mlFile.delete())
    // the original was written through ChecksumFileSystem — drop the
    // stale .crc sidecar or the re-written bytes fail checksum, masking
    // the rejection under test
    new java.io.File(md, s".$mlName.crc").delete()
    val w2 = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](v2MlSchema))
    w2.create(v2MlSchema, mlFile)
    w2.append(delMf); w2.close()
    val e2 = intercept[IllegalArgumentException] {
      Iceberg.readTable(spark, dir).collect()
    }
    assert(e2.getMessage.contains("EQUALITY"))
  }

  test("v2 merge-on-read: position deletes are applied at scan time; old snapshot stays whole") {
    val dir = tmp("iceberg_posdel")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq(
      (1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 11:00:00", 2.0),
      (3, "2024-01-02 10:00:00", 3.0), (4, "2024-01-02 11:00:00", 4.0))))
    assert(Iceberg.publish(spark, dir) === 1)

    // find the physical (file, pos) of the k ∈ {2, 3} rows — the
    // fixture deletes by position, exactly like a foreign v2 writer
    val meta = Iceberg.currentMeta(spark, dir).get
    val full = Iceberg.readTable(spark, dir)
    val withPos = full
      .withColumn("__p", col("_metadata.file_path"))
      .withColumn("__i", col("_metadata.row_index"))
      .filter(col("k").isin(2, 3))
      .select("__p", "__i").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(withPos.size === 2)
    val v2 = Iceberg.stageForeignPositionDeletes(spark, dir, withPos)
    assert(v2 === 2)

    // current read suppresses exactly the deleted positions
    assert(asSet(Iceberg.readTable(spark, dir).drop("p_date")) === Set(
      (1, "2024-01-01 10:00:00", 1.0), (4, "2024-01-02 11:00:00", 4.0)))
    // metadata is now v2 with two snapshots; the PRE-delete snapshot
    // still reads whole (time travel unaffected by later deletes)
    val m2 = Iceberg.currentMeta(spark, dir).get
    assert(m2.formatVersion === 2)
    val firstSnap = m2.snapshots.map(_.snapshotId).min
    assert(Iceberg.readSnapshot(spark, dir, firstSnap).count() === 4L)
    // a publish on top of a deletes-bearing snapshot is NOT treated as
    // idempotent (the data-file set alone no longer describes the
    // table): it commits a fresh copy-on-write snapshot of the live
    // TxnParquet rows — which still include the k ∈ {2,3} rows, since
    // the deletes exist only on the Iceberg side
    val v3 = Iceberg.publish(spark, dir)
    assert(v3 === 3)
    assert(Iceberg.readTable(spark, dir).count() === 4L)
    assert(meta.formatVersion === 1)
  }

  test("v2 merge-on-read: equality deletes apply by key; old snapshot stays whole") {
    val dir = tmp("iceberg_eqdel")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq(
      (1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 11:00:00", 2.0),
      (3, "2024-01-02 10:00:00", 3.0), (4, "2024-01-02 11:00:00", 4.0))))
    assert(Iceberg.publish(spark, dir) === 1)
    // a foreign CDC writer retracts k ∈ {2, 3} BY VALUE — no file/pos
    // resolution, just the keys (the upsert-writer shape)
    val v2 = Iceberg.stageForeignEqualityDeletes(spark, dir,
      Seq("k"), Seq(org.apache.spark.sql.Row(2), org.apache.spark.sql.Row(3)))
    assert(v2 === 2)
    assert(asSet(Iceberg.readTable(spark, dir).drop("p_date")) === Set(
      (1, "2024-01-01 10:00:00", 1.0), (4, "2024-01-02 11:00:00", 4.0)))
    // the PRE-delete snapshot still reads whole (sequence scoping:
    // the delete's seq is above the data's, so time travel to the
    // data snapshot never sees it — it is not in that manifest list)
    val m2 = Iceberg.currentMeta(spark, dir).get
    assert(m2.formatVersion === 2)
    val firstSnap = m2.snapshots.map(_.snapshotId).min
    assert(Iceberg.readSnapshot(spark, dir, firstSnap).count() === 4L)
    // metadata sequence bookkeeping: last-sequence-number advanced
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(
      new java.io.File(dir, s"metadata/v$v2.metadata.json"))
    assert(tree.get("last-sequence-number").asLong() === 1L)
  }

  test("equality deletes: NULL matches NULL; multi-column ids hit exact tuples") {
    val dir = tmp("iceberg_eqnull")
    val schema = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("dt", TimestampType, nullable = true),
      StructField("v", DoubleType, nullable = true)))
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      org.apache.spark.sql.Row(1, ts("2024-01-01 10:00:00"), 1.0),
      org.apache.spark.sql.Row(2, ts("2024-01-01 11:00:00"), null),
      org.apache.spark.sql.Row(2, ts("2024-01-02 10:00:00"), 5.0),
      org.apache.spark.sql.Row(3, ts("2024-01-02 11:00:00"), null))
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(spark.createDataFrame(rows.asJava, schema))
    assert(Iceberg.publish(spark, dir) === 1)
    // delete (k=2, v=NULL): per spec, a NULL delete value matches NULL
    // data values — the (2, 5.0) row must SURVIVE, the (2, null) row
    // must go; (3, null) survives (k mismatch)
    Iceberg.stageForeignEqualityDeletes(spark, dir, Seq("k", "v"),
      Seq(org.apache.spark.sql.Row(2, null)))
    val got = Iceberg.readTable(spark, dir).drop("p_date")
      .select("k", "v").collect()
      .map(r => (r.getInt(0), Option(r.get(1)))).toSet
    assert(got === Set((1, Some(1.0)), (2, Some(5.0)), (3, None)))
  }

  test("equality deletes: STRICT sequence scoping — a delete at the data's own sequence number hits nothing") {
    val dir = tmp("iceberg_eqseq")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq(
      (1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 11:00:00", 2.0))))
    assert(Iceberg.publish(spark, dir) === 1)
    // v1-upgraded data files inherit sequence number 0; a delete
    // pinned to seq 0 sequences WITH them, and the spec's rule is
    // strictly-less-than — so it deletes nothing (this is what keeps
    // rows added in the delete's own snapshot alive in real tables)
    Iceberg.stageForeignEqualityDeletes(spark, dir, Seq("k"),
      Seq(org.apache.spark.sql.Row(2)), deleteSeq = Some(0L))
    assert(Iceberg.readTable(spark, dir).count() === 2L)
    // and the same delete one sequence later hits
    Iceberg.stageForeignEqualityDeletes(spark, dir, Seq("k"),
      Seq(org.apache.spark.sql.Row(2)))
    assert(asSet(Iceberg.readTable(spark, dir).drop("p_date")) === Set(
      (1, "2024-01-01 10:00:00", 1.0)))
  }

  test("equality + position deletes coexist in one table") {
    val dir = tmp("iceberg_eqpos")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq(
      (1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 11:00:00", 2.0),
      (3, "2024-01-02 10:00:00", 3.0), (4, "2024-01-02 11:00:00", 4.0))))
    assert(Iceberg.publish(spark, dir) === 1)
    val pos = Iceberg.readTable(spark, dir)
      .withColumn("__p", col("_metadata.file_path"))
      .withColumn("__i", col("_metadata.row_index"))
      .filter(col("k") === 1)
      .select("__p", "__i").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    Iceberg.stageForeignPositionDeletes(spark, dir, pos)
    Iceberg.stageForeignEqualityDeletes(spark, dir, Seq("k"),
      Seq(org.apache.spark.sql.Row(4)))
    assert(asSet(Iceberg.readTable(spark, dir).drop("p_date")) === Set(
      (2, "2024-01-01 11:00:00", 2.0), (3, "2024-01-02 10:00:00", 3.0)))
  }

  test("partitioned publish: p_date identity spec, manifest tuples, date-pruned read") {
    val dir = tmp("iceberg_part")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq(
      (1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-02 10:00:00", 2.0),
      (3, "2024-01-03 10:00:00", 3.0), (4, "2024-01-03 11:00:00", 4.0))))
    assert(Iceberg.publish(spark, dir) === 1)
    // the metadata declares the identity spec on p_date with the
    // schema's field id as source-id and partition field-id 1000
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(
      new java.io.File(dir, "metadata/v1.metadata.json"))
    val fields = tree.get("partition-specs").get(0).get("fields")
    assert(fields.size() === 1)
    assert(fields.get(0).get("name").asText() === "p_date")
    assert(fields.get(0).get("transform").asText() === "identity")
    assert(fields.get(0).get("field-id").asInt() === 1000)
    val srcId = tree.get("schema").get("fields").elements().asScala
      .find(_.get("name").asText() == "p_date").get.get("id").asInt()
    assert(fields.get(0).get("source-id").asInt() === srcId)
    // pruned read = filtered relation, over FEWER files (driver-side
    // manifest pruning, before Spark lists anything)
    val full = Iceberg.readTable(spark, dir)
    val pruned = Iceberg.readTableForDates(spark, dir,
      "2024-01-03", "2024-01-03")
    assert(asSet(pruned.drop("p_date")) === Set(
      (3, "2024-01-03 10:00:00", 3.0), (4, "2024-01-03 11:00:00", 4.0)))
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"pruning must plan fewer files (${pruned.inputFiles.length} vs " +
        s"${full.inputFiles.length})")
    // spec NEVER evolves: a table whose committed metadata declares an
    // EMPTY spec (published by an earlier version) stays unpartitioned
    // on republish
    val v1File = new java.io.File(dir, "metadata/v1.metadata.json")
    val edited = mapper.readTree(v1File)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    edited.set[com.fasterxml.jackson.databind.JsonNode]("partition-spec",
      mapper.createArrayNode())
    val spec0 = edited.get("partition-specs").get(0)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    spec0.set[com.fasterxml.jackson.databind.JsonNode]("fields",
      mapper.createArrayNode())
    Files.write(v1File.toPath, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(edited).getBytes)
    new java.io.File(dir, "metadata/.v1.metadata.json.crc").delete()
    txn.mergeLastWins(df(Seq((5, "2024-01-05 10:00:00", 5.0))),
      Seq("k", "dt"))
    assert(Iceberg.publish(spark, dir) === 2)
    val tree2 = mapper.readTree(
      new java.io.File(dir, "metadata/v2.metadata.json"))
    assert(tree2.get("partition-specs").get(0).get("fields").size() === 0,
      "an unpartitioned table must not be retro-partitioned on republish")
    assert(Iceberg.readTable(spark, dir).count() === 5L)
  }

  test("publish writes a schema.name-mapping.default property (id-less parquet interop)") {
    val dir = tmp("iceberg_namemap")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq((1, "2024-01-01 10:00:00", 1.0))))
    Iceberg.publish(spark, dir)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(new java.io.File(dir, "metadata/v1.metadata.json"))
    val nm = tree.get("properties").get("schema.name-mapping.default")
    assert(nm != null, "name mapping property missing")
    val arr = mapper.readTree(nm.asText())
    val byName = arr.elements().asScala.toSeq
      .map(e => e.get("names").get(0).asText() -> e.get("field-id").asInt())
      .toMap
    // ids must match the schema's sequential assignment
    val schemaIds = tree.get("schema").get("fields").elements().asScala.toSeq
      .map(f => f.get("name").asText() -> f.get("id").asInt()).toMap
    assert(byName === schemaIds)
    assert(byName.keySet.contains("k") && byName.keySet.contains("v"))
  }

  test("schema json mapping: every spec type lands on the right Spark type; unknown is loud") {
    val json =
      """{"type":"struct","schema-id":0,"fields":[
        |{"id":1,"name":"b","required":true,"type":"boolean"},
        |{"id":2,"name":"i","required":false,"type":"int"},
        |{"id":3,"name":"l","required":false,"type":"long"},
        |{"id":4,"name":"fl","required":false,"type":"float"},
        |{"id":5,"name":"d","required":false,"type":"double"},
        |{"id":6,"name":"dt","required":false,"type":"date"},
        |{"id":7,"name":"s","required":false,"type":"string"},
        |{"id":8,"name":"u","required":false,"type":"uuid"},
        |{"id":9,"name":"bin","required":false,"type":"binary"},
        |{"id":10,"name":"ts","required":false,"type":"timestamp"},
        |{"id":11,"name":"tsz","required":false,"type":"timestamptz"},
        |{"id":12,"name":"dec","required":false,"type":"decimal(18, 2)"},
        |{"id":13,"name":"fx","required":false,"type":"fixed[16]"},
        |{"id":14,"name":"lst","required":false,"type":
        |  {"type":"list","element-id":15,"element":"long","element-required":true}},
        |{"id":16,"name":"mp","required":false,"type":
        |  {"type":"map","key-id":17,"key":"string","value-id":18,
        |   "value":"double","value-required":false}},
        |{"id":19,"name":"st","required":false,"type":
        |  {"type":"struct","fields":[
        |    {"id":20,"name":"x","required":true,"type":"int"}]}}
        |]}""".stripMargin
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val st = Iceberg.structFromIceberg(mapper.readTree(json))
    assert(st("b").dataType === BooleanType && !st("b").nullable)
    assert(st("i").dataType === IntegerType && st("i").nullable)
    assert(st("l").dataType === LongType)
    assert(st("fl").dataType === FloatType)
    assert(st("d").dataType === DoubleType)
    assert(st("dt").dataType === DateType)
    assert(st("s").dataType === StringType)
    assert(st("u").dataType === StringType)
    assert(st("bin").dataType === BinaryType)
    assert(st("ts").dataType === TimestampNTZType)
    assert(st("tsz").dataType === TimestampType)
    assert(st("dec").dataType === DecimalType(18, 2))
    assert(st("fx").dataType === BinaryType)
    assert(st("lst").dataType ===
      ArrayType(LongType, containsNull = false))
    assert(st("mp").dataType ===
      MapType(StringType, DoubleType, valueContainsNull = true))
    assert(st("st").dataType ===
      StructType(Seq(StructField("x", IntegerType, nullable = false))))
    val bad = json.replace("\"boolean\"", "\"geometry\"")
    val e = intercept[IllegalArgumentException] {
      Iceberg.structFromIceberg(mapper.readTree(bad))
    }
    assert(e.getMessage.contains("unsupported type"))
  }

  test("version-hint is only a hint: stale or missing, listing still resolves") {
    val dir = tmp("iceberg_hint")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq((1, "2024-01-01 10:00:00", 1.0))))
    Iceberg.publish(spark, dir)
    txn.mergeLastWins(df(Seq((2, "2024-01-02 10:00:00", 2.0))), Seq("k", "dt"))
    Iceberg.publish(spark, dir)
    val hint = new java.io.File(dir, "metadata/version-hint.text")
    Files.write(hint.toPath, "1".getBytes) // stale
    assert(Iceberg.latestMetaVersion(spark, dir) === Some(2))
    assert(hint.delete())
    assert(Iceberg.latestMetaVersion(spark, dir) === Some(2))
    assert(Iceberg.readTable(spark, dir).count() === 2L)
  }

  test("delta and iceberg logs coexist at one TxnParquet root") {
    val dir = tmp("iceberg_coexist")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq(
      (1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-02 10:00:00", 2.0))))
    DeltaLake.publish(spark, dir)
    Iceberg.publish(spark, dir)
    val viaDelta = asSet(DeltaLake.readTable(spark, dir).drop("p_date"))
    val viaIceberg = asSet(Iceberg.readTable(spark, dir).drop("p_date"))
    val native = asSet(txn.read(spark))
    assert(viaDelta === native && viaIceberg === native)
  }

  test("vacuum reclaims aged unreferenced metadata debris, keeps history + young staging") {
    val dir = tmp("iceberg_vacuum")
    val txn = TxnParquetSink(dir, tsCol = "dt")
    txn.overwriteAll(df(Seq((1, "2024-01-01 10:00:00", 1.0))))
    Iceberg.publish(spark, dir)
    txn.mergeLastWins(df(Seq((2, "2024-01-02 10:00:00", 2.0))), Seq("k", "dt"))
    Iceberg.publish(spark, dir)
    val md = new java.io.File(dir, "metadata")
    val old = System.currentTimeMillis() - 3 * 60 * 60 * 1000L
    def mk(name: String, stale: Boolean): java.io.File = {
      val f = new java.io.File(md, name)
      assert(f.createNewFile())
      if (stale) assert(f.setLastModified(old))
      f
    }
    val staleOrphan = mk("manifest-deadbeef-orphan.avro", stale = true)
    val freshOrphan = mk("manifest-cafebabe-young.avro", stale = false)
    val staleTmp = mk(".tmp-deadbeef.metadata.json", stale = true)
    // age everything REFERENCED too, proving the keep is by reference,
    // not by youth (the young orphan keeps its fresh mtime)
    md.listFiles().filter(f => f.getName.endsWith(".avro") && f != freshOrphan)
      .foreach(f => f.setLastModified(old))
    Iceberg.vacuum(spark, dir)
    assert(!staleOrphan.exists() && !staleTmp.exists(), "aged orphans reclaimed")
    assert(freshOrphan.exists(), "young (possibly in-flight) staging survives")
    // both snapshots still read — referenced avros survived the sweep
    assert(Iceberg.readTable(spark, dir).count() === 2L)
    assert(Iceberg.readSnapshot(spark, dir, 1L).count() === 1L)
  }
}
