package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join (SURVEY.md §4 / builder scale checklist): AQE's
  * skew-join handles most cases at runtime, but a *known* hot key (a
  * power-law user, a null-heavy FK) can still drown one task. Salting
  * fixes the plan shape statically:
  *
  *  - the skewed (large) side gets a random salt in [0, buckets);
  *  - the small side is replicated `buckets` times (explode of a literal
  *    range — cost = |small| · buckets rows, bounded by construction);
  *  - the join key becomes (key, salt), spreading each hot key over
  *    `buckets` tasks.
  *
  * Works for inner and left-outer (skewed side preserved) joins — each
  * skewed row exists exactly once, matched against the one replica with
  * its salt.
  */
object Skew {

  def saltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      "salting preserves multiplicity only for inner/left joins")
    val salted = skewed.withColumn("__salt",
      (rand(seed = 42) * buckets).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Skew DIAGNOSIS — the measurement that decides between AQE,
    * [[saltedJoin]], and a schema fix: per hot key its row count and
    * integer-ppm share of the table, alongside the global
    * (rows, distinct keys) context on every row. share_ppm is exact
    * integer arithmetic (count·10⁶ DIV total) so the report is
    * engine-reproducible; `suggested_salt` is the bucket count that
    * would level the key to the mean task size (⌈share·K⌉ capped), a
    * starting point, not an oracle.
    *
    * Shape: one map-side-combined count aggregate (shuffle = distinct
    * keys), a TakeOrderedAndProject top-k (never a global sort), and
    * two one-row broadcasts. NULL keys report as a key — they are the
    * most common hot key in real tables. */
  def diagnose(df: DataFrame, key: Column, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("__n"),
      count(lit(1)).as("__k"))
    // Products are widened to DECIMAL(38,0) before the integral divide
    // (cnt·10⁶ and cnt·k overflow LONG once the table passes ~10¹² rows);
    // DIV lands back in LONG. suggested_salt is an exact integer ceil-div
    // ⌈cnt·k/n⌉ = (cnt·k + n − 1) DIV n, not a float ceil — a half-ulp in
    // the double quotient must never flip the reported salt.
    counts.orderBy(col("cnt").desc, col("key").asc_nulls_last)
      .limit(topK)
      .crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"),
        expr("CAST(cnt AS DECIMAL(38,0)) * 1000000 DIV __n").as("share_ppm"),
        col("__n").as("n_rows"), col("__k").as("n_keys"),
        least(expr("(CAST(cnt AS DECIMAL(38,0)) * __k + __n - 1) DIV __n"),
          lit(1024L)).as("suggested_salt"))
  }
}
