package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension maintenance — the warehouse-standard
  * "keep every historical version" upsert (Kimball SCD2), the missing
  * sibling of the engine's last-wins / if-absent merges
  * (reference `dags/etl.py:66-121` upserts overwrite in place; SCD2 is
  * what a dimension that must answer as-of questions needs instead).
  *
  * Bookkeeping columns: `valid_from` (version start), `valid_to` (version
  * end, NULL while current), `is_current`. An as-of lookup is then a
  * plain range predicate (`valid_from <= t AND (valid_to IS NULL OR
  * valid_to > t)`) — which composes with the engine's interval/as-of
  * joins.
  *
  * Scale posture: [[merge]] is ONE outer join between the CURRENT slice
  * and the update batch, keyed on the dimension key — history rows never
  * enter the join (they're unioned back untouched), and each joined row
  * expands to its 1–2 output versions through a single generator, so no
  * branch of the plan re-executes the join. Update batches are small in
  * practice → Catalyst/AQE broadcasts the join; a 100 TB dimension
  * history costs only its current-slice scan per merge.
  */
object Scd2 {

  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"
  val IsCurrent = "is_current"

  /** Turn a plain snapshot into an SCD2 dimension: every row becomes the
    * current version as of `asOf`. */
  def initialize(snapshot: DataFrame, asOf: Column): DataFrame =
    snapshot
      .withColumn(ValidFrom, asOf.cast("timestamp"))
      .withColumn(ValidTo, lit(null).cast("timestamp"))
      .withColumn(IsCurrent, lit(true))

  /** Apply an update batch at time `asOf`:
    *  - key present, any `tracked` attribute changed (null-safe) → the
    *    current row closes (`valid_to = asOf`) and the update becomes the
    *    new current version;
    *  - key present, attributes identical → current row unchanged (no
    *    spurious versions);
    *  - key absent from updates → current row unchanged;
    *  - new key → inserted as current.
    * History rows pass through untouched.
    *
    * `updates` must carry exactly `keys ++ tracked` and at most one row
    * per key (dedupe upstream with e.g. `Relational.latestPerKey` — this
    * operator cannot pick a winner for you deterministically). */
  def merge(dim: DataFrame, updates: DataFrame, keys: Seq[String],
            tracked: Seq[String], asOf: Column): DataFrame = {
    require(keys.nonEmpty, "SCD2 merge needs at least one key column")
    val at = asOf.cast("timestamp")
    val history = dim.filter(!col(IsCurrent))
    val current = dim.filter(col(IsCurrent))

    // Presence on each side of the full-outer join is decided by literal
    // marker columns, NOT by key nullability — the join deliberately uses
    // <=> so all-NULL keys are legal, and such rows must still emit.
    val u = updates.select(
      keys.map(k => col(k).as(s"__u_$k")) ++
        tracked.map(t => col(t).as(s"__u_$t")) :+
        lit(true).as("__u_present"): _*)
    val cur = current.withColumn("__c_present", lit(true))
    val joinCond = keys.map(k => col(k) <=> col(s"__u_$k")).reduce(_ && _)
    val joined = cur.join(u, joinCond, "full_outer")

    val hasOld = col("__c_present").isNotNull
    val hasNew = col("__u_present").isNotNull
    // no tracked attributes → matched rows are never "changed" (key-only
    // membership dimension: existing keys keep their version)
    val changed =
      if (tracked.isEmpty) lit(false)
      else tracked.map(t => !(col(t) <=> col(s"__u_$t"))).reduce(_ || _)

    val outCols = dim.columns.toSeq // keys ++ tracked ++ bookkeeping, dim order
    def version(fields: String => Column): Column =
      struct(outCols.map(c => fields(c).as(c)): _*)

    // the old row, closed if the update changed it
    val oldVersion = version {
      case ValidTo   => when(hasNew && changed, at).otherwise(col(ValidTo))
      case IsCurrent => !(hasNew && changed)
      case c         => col(c)
    }
    // the update as the new current version (new key, or changed attrs)
    val newVersion = version {
      case ValidFrom => at
      case ValidTo   => lit(null).cast("timestamp")
      case IsCurrent => lit(true)
      case c         =>
        if (keys.contains(c) || tracked.contains(c)) col(s"__u_$c")
        else lit(null) // untracked payload columns start empty on inserts
    }

    val emitted = joined.select(explode(array(
      when(hasOld, oldVersion),
      when(hasNew && (!hasOld || changed), newVersion))).as("__v"))
      .filter(col("__v").isNotNull)
      .select(outCols.map(c => col(s"__v.$c").as(c)): _*)

    history.unionByName(emitted)
  }

  /** Point-in-time lookup against an SCD2 dimension: the version of each
    * key that was in effect at `t` (a plain pushdown-able range filter —
    * no join, no window). */
  def asOf(dim: DataFrame, t: Column): DataFrame = {
    val ts = t.cast("timestamp")
    dim.filter(col(ValidFrom) <= ts && (col(ValidTo).isNull || col(ValidTo) > ts))
  }

  /** Temporal lookup JOIN: attach to every fact row the dim version
    * that was in effect at the fact's own event time — the query every
    * SCD2 dimension exists to answer ("what was this customer's segment
    * WHEN the order happened", not "what is it now"). [[asOf]] answers
    * it for one global timestamp; this answers it per row.
    *
    * Shape: ONE key equi-join (broadcast when the dim is small, hash
    * otherwise) followed by a narrow interval filter
    * `valid_from <= ts < valid_to` — fanout per fact is that key's
    * VERSION count (bounded by update cadence, never row count), so no
    * range-join explosion and no window. Versions are half-open and
    * non-overlapping by [[merge]]'s construction, so at most one
    * version survives per fact; facts older than their key's first
    * version (or with no dim key at all) keep NULL dim columns when
    * `keepUnmatched` — the honest answer, never the current version.
    *
    * `factTs` must be a timestamp-compatible column on `facts`; dim
    * columns arrive under their own names (collision-checked). */
  def temporalJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                   factTs: Column, keepUnmatched: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    val dup = dim.columns.toSet
      .intersect(facts.columns.toSet).diff(keys.toSet)
    require(dup.isEmpty, s"dim/fact column collision: $dup")
    val ts = factTs.cast("timestamp")
    // Rename dim's key + interval columns to internal aliases BEFORE the
    // join: a `facts(k) === dim(k)` condition misresolves when dim shares
    // lineage with facts (both frames carry the same attribute ids — the
    // self-join trap attributionPositional documents), whereas after the
    // rename each side of the condition has exactly one resolvable name.
    val dimA = dim.columns.foldLeft(dim) { (df, c) =>
      if (keys.contains(c) || c == ValidFrom || c == ValidTo)
        df.withColumnRenamed(c, s"__dim_$c")
      else df
    }
    val matched = facts.withColumn("__fact_ts", ts)
      .join(dimA,
        keys.map(k => col(k) === col(s"__dim_$k"))
          .reduce(_ && _) &&
          col(s"__dim_$ValidFrom") <= col("__fact_ts") &&
          (col(s"__dim_$ValidTo").isNull ||
            col(s"__dim_$ValidTo") > col("__fact_ts")),
        if (keepUnmatched) "left" else "inner")
    // drop the dim's copy of the key columns (values equal by the join);
    // interval columns surface back under their own names
    keys.foldLeft(matched)((df, k) => df.drop(s"__dim_$k"))
      .drop("__fact_ts")
      .withColumnRenamed(s"__dim_$ValidFrom", ValidFrom)
      .withColumnRenamed(s"__dim_$ValidTo", ValidTo)
  }
}
