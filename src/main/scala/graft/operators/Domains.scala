package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-level corpus curation (the RefinedWeb/C4 shape): web corpora
  * are filtered and BALANCED by source host — blocklists, per-domain
  * quality rollups, and per-domain caps that stop a single crawler-
  * friendly site from dominating the training mix.
  *
  * Scale posture (100 TB): host extraction is a narrow regex over the
  * scan; stats and caps are one shuffle keyed by host. Hosts are
  * Zipf-skewed by nature, and a rank window over every host would
  * sort the whole corpus — so [[capPerDomain]]'s default `prunedWindow`
  * first finds the hosts whose COUNT exceeds the cap (a tiny
  * map-side-combined aggregate) and only those rows enter the rank
  * sort; the long tail of well-behaved hosts is kept wholesale via an
  * anti-join, never sorted.
  */
object Domains {

  /** Host part of a URL (`scheme://host/...`) — RE2-safe skeleton, ''
    * when the URL does not parse (both engines agree on no-match). */
  def host(url: Column): Column =
    regexp_extract(url, "^[a-z]+://([^/]+)", 1)

  /** Per-host rollup: (`host`, `n_docs`, `sum_chars`) — count and
    * exact integer volume per domain, one map-side-combining shuffle. */
  def domainStats(docs: DataFrame, hostCol: Column, nChars: Column): DataFrame =
    docs.groupBy(hostCol.as("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(nChars.cast("long")).as("sum_chars"))

  /** Keep-flag for a per-domain document cap: at most `cap` docs per
    * host, lowest `id` first (deterministic). With `prunedWindow` the
    * rank window only runs over hosts that actually exceed the cap —
    * everything else is kept without entering a sort (the mega-host
    * guard; default on). Appends `kept`. */
  def capPerDomain(docs: DataFrame, hostCol: Column, id: Column, cap: Int,
                   prunedWindow: Boolean = true): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val base = docs.withColumn("__h", hostCol).withColumn("__id", id)
    val w = Window.partitionBy(col("__h")).orderBy(col("__id"))
    if (!prunedWindow) {
      base.withColumn("kept", row_number().over(w) <= cap)
        .drop("__h", "__id")
    } else {
      // split the frames so ONLY over-cap hosts enter the rank sort —
      // a conditional around the window column would not help (window
      // expressions evaluate for every row regardless of the branch)
      val over = base.groupBy(col("__h")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > cap).select(col("__h"))
      val ranked = base.join(over, Seq("__h"))
        .withColumn("kept", row_number().over(w) <= cap)
      base.join(over, Seq("__h"), "left_anti")
        .withColumn("kept", lit(true))
        .unionByName(ranked)
        .drop("__h", "__id")
    }
  }
}
