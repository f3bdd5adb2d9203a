package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage seam for MERGE-style upserts (SURVEY.md §2.1 S4/S5 — the
  * reference's `INSERT … ON CONFLICT` load path, dags/etl.py:66-121).
  *
  * Pipeline code (Ingest, Streams) writes through this trait, not a
  * concrete store, so backends are drop-ins:
  *  - [[graft.weather.Store.ParquetDateSink]] — date-partitioned parquet,
  *    partition-pruned incremental merge (the plain-parquet default;
  *    single-writer, not crash-atomic — see its scaladoc);
  *  - [[TxnParquet.TxnParquetSink]] — the same incremental merge behind
  *    a manifest + atomic-rename commit protocol: crash-atomic (pre- or
  *    post-state, never partial), the plain-parquet parity for the
  *    reference's one-transaction-per-run Postgres load;
  *  - [[graft.weather.Store.ParquetSnapshotSink]] — unpartitioned snapshot
  *    for small dimension tables;
  *  - [[JdbcMergeSink]] — staging table + driver-issued MERGE against a
  *    JDBC database (the reference's actual Postgres path);
  *  - a transactional table format (Delta/Iceberg MERGE INTO) would slot
  *    in the same way on a cluster with those catalogs.
  */
/** Thrown by a sink to signal that the INCREMENTAL merge form cannot be
  * applied to this (batch, keys) shape — e.g. a date-partitioned sink
  * whose merge keys do not pin the partition timestamp. The SQL MERGE
  * lowering (graft.plans.SqlMerge) catches EXACTLY this type to fall back
  * to the always-correct full-table rewrite; any other exception from a
  * sink (schema mismatch, bad state) propagates loudly instead of being
  * masked as a performance downgrade. Extends IllegalArgumentException so
  * direct DataFrame-API callers keep the familiar contract-violation
  * type. */
final class IncrementalMergeDeclined(msg: String)
    extends IllegalArgumentException(msg)

/** A [[MergeSink]] that retains committed versions and can serve the
  * table exactly as an earlier commit wrote it — the seam behind SQL
  * time travel (`graft_version('name', v)` and the native
  * `VERSION AS OF` spelling, graft.plans.SqlMerge.versionPlan). Both
  * transactional backends implement it: [[TxnParquet.TxnParquetSink]]
  * (manifest numbers, 1-based) and [[DeltaLake.DeltaDateSink]]
  * (Delta-protocol commit versions, 0-based). Implementations must fail
  * LOUDLY for a version outside the retention window — never silently
  * serve different data. */
trait VersionedSink {
  /** Live committed version, None before the first commit. */
  def version(spark: SparkSession): Option[Long]

  /** The table exactly as version `v` committed it. */
  def readVersion(spark: SparkSession, v: Long): DataFrame

  /** Latest version committed at or before wall-clock `tsMicros`
    * (epoch microseconds) — the resolution step behind
    * `TIMESTAMP AS OF`. Resolution uses the commit artifacts'
    * filesystem modification times (the same convention Delta Lake
    * documents for its timestamp travel): monotone with version for a
    * single-writer table. None when nothing RETAINED was committed by
    * then — a timestamp older than the retention window fails loudly
    * at the caller rather than silently serving a later version. */
  def versionAt(spark: SparkSession, tsMicros: Long): Option[Long]
}

trait MergeSink {

  /** `ON CONFLICT DO UPDATE` — merge the batch keyed by `keys`; on
    * conflict the incoming row wins (last-write-wins). Must be idempotent
    * under replay of the same batch. */
  def mergeLastWins(updates: DataFrame, keys: Seq[String]): Unit

  /** `ON CONFLICT DO NOTHING` — insert only rows whose key is absent
    * (first-write-wins); existing rows are kept verbatim. */
  def mergeIfAbsent(updates: DataFrame, keys: Seq[String]): Unit

  /** Current table contents. */
  def read(spark: SparkSession): DataFrame

  /** Replace the ENTIRE table with `merged` — the write-back for general
    * SQL MERGE shapes (conditional UPDATE/DELETE, WHEN NOT MATCHED BY
    * SOURCE) whose effects cannot be partition-pruned. `merged` may read
    * from this sink's current files; implementations must stage or
    * materialize before swapping. O(table) by design — the incremental
    * mergeLastWins/mergeIfAbsent paths stay the scale path. */
  def overwriteAll(merged: DataFrame): Unit =
    throw new UnsupportedOperationException(
      s"${getClass.getSimpleName} does not support full-table rewrite " +
        "(general MERGE shapes); use the DO UPDATE / DO NOTHING forms")
}

/** A [[MergeSink]] whose storage is partitioned by `date(tsCol)` and can
  * therefore replace a SUBSET of dates without touching the rest — the
  * seam that makes SQL UPDATE/DELETE partition-pruned: rewrite only the
  * dates the predicate touches, O(touched dates), never O(table)
  * (graft.plans.SqlMerge routes row-level DML here when it can). */
trait DatePartitionedSink extends MergeSink {

  /** The timestamp column whose date is the partition key. */
  def tsCol: String

  /** The table restricted to `dates` — a partition/manifest-PRUNED read
    * (only those dates' files are listed and scanned). A null entry
    * selects the null-date partition. */
  def prunedRead(spark: SparkSession, dates: Seq[java.sql.Date]): DataFrame

  /** Atomically replace EXACTLY the given dates' contents with `kept` —
    * the full post-operation rows of those dates (rows of other dates
    * must not appear; a date with no rows in `kept` is REMOVED from the
    * table). Untouched dates' files stay byte-identical. `kept` may
    * read from this sink's current files. */
  def replaceDates(dates: Seq[java.sql.Date], kept: DataFrame): Unit
}
