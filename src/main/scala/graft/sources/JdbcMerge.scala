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

  private def merge(updates: DataFrame, keys: Seq[String], updateOnMatch: Boolean): Unit = {
    require(keys.nonEmpty, "JdbcMergeSink: merge keys must be non-empty")
    val dialect = JdbcDialects.get(url)
    def q(id: String) = dialect.quoteIdentifier(id)

    // MERGE forbids two source rows matching one target row; within-batch
    // ties have no defined order (the reference's loop kept whichever the
    // API returned last), so collapse them deterministically by key
    val deduped = updates.dropDuplicates(keys)
    val stage = s"${table}_stage_${java.util.UUID.randomUUID().toString.take(8)}"

    // 1. parallel bulk load into staging (overwrite creates it)
    deduped.write.mode("overwrite").options(options).jdbc(url, stage, props)

    // 2. ensure target exists (empty create on first run), then one
    //    set-based MERGE on the driver connection
    updates.limit(0).write.mode("append").options(options).jdbc(url, table, props)

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
      s"MERGE INTO $table t USING $stage s ON $on$whenMatched" +
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
      } finally {
        // 3. staging is per-batch scratch — always drop it
        val st = conn.createStatement()
        try { st.executeUpdate(s"DROP TABLE $stage"); conn.commit() }
        catch { case _: java.sql.SQLException => () } // already gone / never created
        finally st.close()
      }
    } finally conn.close()
  }
}
