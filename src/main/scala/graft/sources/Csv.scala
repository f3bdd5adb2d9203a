package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Robust CSV ingestion with a QUARANTINE surface — the flat-file
  * sibling of [[Http]]'s bad-record envelope (reference analogue: the
  * CSV-shaped exports `dags/etl.py`'s Postgres tables feed to BI; any
  * real corpus drop includes delimited files with broken rows, and a
  * loader that silently drops them fails the "every record accounted
  * for" contract the ingest tier keeps everywhere else).
  *
  * PERMISSIVE parse: schema-conforming rows land typed; malformed rows
  * (wrong arity, uncastable cells, broken quoting) surface through
  * Spark's corrupt-record column and are returned as a SEPARATE frame
  * holding the raw line — count them, sample them, alert on them;
  * never lose them.
  *
  * The known Spark footgun is handled here so callers can't hit it:
  * filtering on the corrupt-record column of a LAZY csv scan throws
  * (the parser prunes the column away unless the row is materialized
  * first — see SPARK-21610), so the raw frame is cached before the
  * good/bad split. The cache is row-sized and feeds both outputs one
  * scan.
  *
  * Scale posture: the csv scan is splittable per file (multiLine stays
  * OFF — a multiline CSV is one task per file, the classic ingest
  * bottleneck); the split is two narrow filters over the cached scan.
  */
object Csv {

  val CorruptCol = "_graft_corrupt"

  /** (typed rows, quarantined raw lines). `schema` is the EXPECTED
    * data schema — the corrupt-record column is managed internally and
    * must not appear in it. */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType, header: Boolean = true,
                         delimiter: String = ","): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"$CorruptCol is reserved for the quarantine surface")
    val raw = spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema.add(CorruptCol, StringType))
      .csv(path)
      .cache() // SPARK-21610: the corrupt column is only filterable on
               // a materialized frame; also lets good+bad share one scan
    val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_record"))
    (good, bad)
  }
}
