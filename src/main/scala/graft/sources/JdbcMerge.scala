package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.jdbc.JdbcDialects

/** JDBC [[MergeSink]] — the reference's actual load path
  * (dags/etl.py:66-121 `INSERT … ON CONFLICT`) re-expressed for Spark's
  * execution model:
  *
  *  1. executors bulk-write the batch into a STAGING table
  *     (`df.write.jdbc`, parallel over the frame's partitions — the data
  *     never funnels through the driver);
  *  2. the driver issues ONE set-based `MERGE INTO target USING staging`
  *     statement, which the database executes set-wise inside a single
  *     transaction (vs the reference's per-row executemany loop);
  *  3. staging is dropped.
  *
  * This is the standard warehouse load pattern (stage + merge): the only
  * driver-side work is two DDL/DML statements, so it scales with the
  * database, not the driver. Works against any dialect with SQL:2003
  * `MERGE` (Derby, Postgres 15+, Oracle, SQL Server…); the unit tests run
  * it against embedded Derby.
  *
  * Notes:
  *  - the batch is deduplicated on `keys` first — SQL MERGE raises an
  *    error when two source rows hit the same target row;
  *  - `null` merge keys never match (SQL equality), so null-keyed rows
  *    always insert; the parquet sinks group null keys instead — use
  *    non-null keys (as the weather schema does) for identical behavior;
  *  - Derby maps StringType to CLOB, which it refuses to compare — pass
  *    `createTableColumnTypes` in `options` if a merge KEY is a string.
  */
final case class JdbcMergeSink(
    url: String,
    table: String,
    options: Map[String, String] = Map.empty) extends MergeSink {

  override def mergeLastWins(updates: DataFrame, keys: Seq[String]): Unit =
    merge(updates, keys, updateOnMatch = true)

  override def mergeIfAbsent(updates: DataFrame, keys: Seq[String]): Unit =
    merge(updates, keys, updateOnMatch = false)

  override def read(spark: SparkSession): DataFrame =
    spark.read.options(options).jdbc(url, table, props)

  private def props: Properties = {
    val p = new Properties()
    options.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Table names in the driver-issued MERGE/DROP must match the objects
    * Spark's `write.jdbc` created, and Spark interpolates `dbtable` raw
    * (so unquoted simple names fold per the DB's rules). Quoting a
    * simple name here would break that match on fold-sensitive dialects
    * (Derby/Postgres fold unquoted names), so: simple identifier parts
    * stay raw, a part the caller already double-quoted passes through
    * verbatim (that's also how to use a reserved word like `order`:
    * pass it pre-quoted, exactly as `write.jdbc` needs it), and any
    * other part is quoted with the dialect helper — which closes the
    * injection surface for config-supplied names. Parts split on dots
    * OUTSIDE quotes, so `sch."my.table"` stays two parts. */
  private[sources] def quoteTable(dialect: org.apache.spark.sql.jdbc.JdbcDialect, name: String): String = {
    // a dot is a separator iff followed by an even number of remaining quotes
    val parts = name.split("\\.(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)")
    require(parts.forall(p => p.count(_ == '"') % 2 == 0),
      s"unbalanced quotes in table name: $name")
    parts.map { part =>
      // verbatim pass-through ONLY for a well-formed delimited identifier:
      // quote, body with interior quotes exclusively as doubled pairs,
      // quote. Anything looser (e.g. `"a" b "c"`) would flow raw into the
      // driver-issued MERGE — an injection, not a name.
      if (part.matches("[A-Za-z_][A-Za-z0-9_]*")) part
      else if (part.matches("\"([^\"]|\"\")*\"")) part
      else dialect.quoteIdentifier(part)
    }.mkString(".")
  }

  private def merge(updates: DataFrame, keys: Seq[String], updateOnMatch: Boolean): Unit = {
    require(keys.nonEmpty, "JdbcMergeSink: merge keys must be non-empty")
    val dialect = JdbcDialects.get(url)
    def q(id: String) = dialect.quoteIdentifier(id)

    // MERGE forbids two source rows matching one target row; within-batch
    // ties have no defined order (the reference's loop kept whichever the
    // API returned last), so collapse them deterministically by key
    val deduped = updates.dropDuplicates(keys)
    val stage = s"${table}_stage_${java.util.UUID.randomUUID().toString.take(8)}"

    // 1. ensure target exists BEFORE anything is staged (empty create on
    //    first run) — a failure here (schema clash, permissions) must not
    //    leave an orphaned staging copy of the batch behind
    updates.limit(0).write.mode("append").options(options).jdbc(url, table, props)

    try {
      // 2. parallel bulk load into staging (overwrite creates it)
      deduped.write.mode("overwrite").options(options).jdbc(url, stage, props)

      val cols = deduped.columns.toSeq
      val nonKeys = cols.filterNot(keys.contains)
      val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      val setClause = nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ")
      val insertCols = cols.map(q).mkString(", ")
      val insertVals = cols.map(c => s"s.${q(c)}").mkString(", ")
      val whenMatched =
        if (updateOnMatch && nonKeys.nonEmpty) s" WHEN MATCHED THEN UPDATE SET $setClause"
        else ""
      val mergeSql =
        s"MERGE INTO ${quoteTable(dialect, table)} t USING ${quoteTable(dialect, stage)} s ON $on$whenMatched" +
          s" WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"

      val conn: Connection = DriverManager.getConnection(url, props)
      try {
        conn.setAutoCommit(false)
        try {
          val st = conn.createStatement()
          try { st.executeUpdate(mergeSql); conn.commit() }
          finally st.close()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        }
      } finally conn.close()
    } finally dropStage(stage) // scratch must not outlive the batch, even on failure
  }

  /** Best-effort staging drop on a fresh connection — runs whether the
    * staging load or the MERGE failed, so a retrying job never
    * accumulates orphaned copies of past batches. */
  private def dropStage(stage: String): Unit =
    try {
      val conn = DriverManager.getConnection(url, props)
      try {
        val st = conn.createStatement()
        try st.executeUpdate(s"DROP TABLE ${quoteTable(JdbcDialects.get(url), stage)}")
        finally st.close()
      } finally conn.close()
    } catch { case _: java.sql.SQLException => () } // never created / already gone
}
