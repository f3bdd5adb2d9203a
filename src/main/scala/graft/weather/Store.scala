package graft.weather

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Table maintenance for plain-parquet storage: the reference's two upsert
  * policies (SURVEY.md §2.1 S4/S5, §2.4 J2/J3) without a transactional
  * table format — dedup-merge + partition overwrite (§7.4 risk 1).
  *
  * Layout decisions (SURVEY.md §4): facts partitioned by `date(dt)` so the
  * dashboard's date-range filters prune partitions; the cities dim is tiny
  * and unpartitioned (always broadcast in J1). Writes repartition by the
  * upsert key so each output partition is written by one task.
  */
object Store {

  /** ON CONFLICT DO UPDATE (last-write-wins, etl.py:71-76,97-114): merge
    * `updates` into `existing` keyed by `keys`; on conflict the update row
    * wins. Idempotent under replay: applying the same batch twice is a
    * no-op (ScalaTest property). */
  def upsertLastWins(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    Relational.lastWins(existing, updates, keys, lit(0))

  /** ON CONFLICT DO NOTHING (first-write-wins, notebook cell 19): existing
    * rows kept verbatim, only absent keys appended. */
  def upsertDoNothing(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(Relational.insertIfAbsent(updates, existing, keys))

  /** Write a fact table partitioned by event date with dynamic partition
    * overwrite: only the partitions present in `df` are replaced, so an
    * hourly upsert run rewrites one day, not the table — the property that
    * keeps the merge O(touched partitions) at 100 TB. */
  def writeFactPartitioned(df: DataFrame, path: String, tsCol: String = "dt"): Unit = {
    val spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.withColumn("p_date", to_date(col(tsCol)))
      .repartition(col("p_date"))
      .write
      .partitionBy("p_date")
      .mode("overwrite")
      .parquet(path)
  }

  def readFact(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("p_date")

  /** Bucketed table write: pre-shuffles once at write time so every
    * subsequent equi-join/aggregation on `bucketCol` between co-bucketed
    * tables runs with NO exchange — the classic amortization for fact⋈fact
    * joins that repeat across a workload (SURVEY.md §4: "repartition/
    * bucketing for co-located joins"). Requires a session catalog
    * (saveAsTable); bucket counts must match across join partners.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** FK-style referential check (S7: Spark enforces no constraints — this
    * is the validation-job equivalent): fact rows whose key is missing
    * from the dimension. Empty result = constraint holds. */
  def orphanedFacts(fact: DataFrame, dim: DataFrame, key: String): DataFrame =
    fact.join(dim.select(col(key)).distinct(), Seq(key), "left_anti")

  /** ON DELETE CASCADE as a maintenance job: remove dim rows by predicate
    * and return (newDim, newFact) with the cascade applied. */
  def cascadeDelete(dim: DataFrame, fact: DataFrame, key: String,
                    deletePredicate: org.apache.spark.sql.Column): (DataFrame, DataFrame) = {
    val keepDim = dim.filter(!deletePredicate)
    val keepFact = fact.join(keepDim.select(col(key)).distinct(), Seq(key), "left_semi")
    (keepDim, keepFact)
  }
}
