package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Probes
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join (orders⋈customer⋈nation⋈region) + grouped revenue — the
    * dashboard's J1/A2 shape (SURVEY.md §3.3).
    */
  def entry(spark: SparkSession): DataFrame =
    Probes.joinDim.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Probes.all.map(p => p.name -> p.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (those
    * get the driver's weaker rows-only check). */
  def oracleSql: Map[String, String] =
    Probes.all.flatMap(p => p.oracle.map(p.name -> _)).toMap
}
