package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table storage: the DURABLE form of co-located joins.
  *
  * The in-memory clustered caches (`repartition(col).persist()` in the
  * graph tier) guarantee a layout only for the lifetime of one session;
  * `bucketBy` writes the layout INTO the table, so every later job —
  * tomorrow's incremental merge, next week's pagerank — reads it back
  * pre-partitioned and pre-sorted and joins/aggregates on the bucket
  * key WITHOUT an Exchange. At 100 TB, the shuffle this removes from
  * every downstream join of two co-bucketed facts is the single
  * largest line item in the query's cost; the price is paid once, at
  * write time.
  *
  * Spark only supports bucketing through the catalog (`saveAsTable` —
  * plain `.parquet(path)` silently drops bucket metadata), so these
  * helpers are catalog-first by design. Bucket counts must MATCH on
  * both sides of a join for the exchange-free plan (Spark does not
  * coalesce mismatched bucket counts by default); pick the count from
  * the target post-shuffle partition size (~128 MB per bucket per the
  * usual guidance), and keep it a power of two so a future split/merge
  * stays aligned.
  *
  * BucketedSpec asserts the contract the docs claim: a self-join and a
  * two-table join of co-bucketed tables plan with ZERO Exchange
  * operators, and the same join over plain parquet plans with them.
  */
object Bucketed {

  /** Write `df` as a bucketed (and bucket-sorted) catalog table.
    * Overwrites an existing table of the same name. `sortCols` defaults
    * to the bucket keys — sorted buckets additionally enable
    * exchange-AND-sort-free sort-merge joins. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String],
                    sortCols: Seq[String] = Nil,
                    path: Option[String] = None): Unit = {
    require(buckets >= 1, "buckets must be >= 1")
    require(bucketCols.nonEmpty, "need at least one bucket column")
    val sorts = if (sortCols.nonEmpty) sortCols else bucketCols
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorts.head, sorts.tail: _*)
    // external table when a path is given (keeps the warehouse dir out
    // of the picture for tests and ad-hoc layouts)
    path.fold(w.saveAsTable(table))(p => w.option("path", p).saveAsTable(table))
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Number of shuffle Exchange operators in the df's executed plan —
    * the assertion surface for "this join is exchange-free". Counted on
    * the plan STRING because AQE wraps the physical tree in an
    * AdaptiveSparkPlanExec whose children aren't reachable through
    * collect() until materialization. */
  def countExchanges(df: DataFrame): Int =
    "Exchange (hash|range)partitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
}
