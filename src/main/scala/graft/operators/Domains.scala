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

  /** Canonical URL — the web-corpus dedup pre-pass (URL-level dedup
    * runs before any content hashing because it needs no document
    * bytes at all): lowercase scheme+host, strip the fragment, drop
    * default ports (:80 http / :443 https), remove tracking params
    * (`utm_*`, `fbclid`, `gclid`, `msclkid`) and clean up the
    * separators they leave behind, empty path → `/`. Paths and
    * non-tracking params keep their case (they are case-sensitive on
    * real servers). Returns NULL when the URL has no parsable
    * `scheme://host` — callers decide policy for those.
    *
    * Everything is built-in `regexp_*`/`concat` (whole-stage codegen,
    * no UDF), and every pattern is RE2-safe (no lookaround) so the
    * DuckDB oracle replays the identical steps. */
  def canonicalUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rest = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+(.*)$", 1)
    // drop tracking params but KEEP the captured separator, then
    // normalize the debris: && runs, ?& starts, trailing separators
    val q1 = regexp_replace(rest,
      "([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid)=[^&#]*", "$1")
    val q2 = regexp_replace(q1, "&&+", "&")
    val q3 = regexp_replace(q2, "\\?&", "?")
    val q4 = regexp_replace(q3, "[?&]+$", "")
    val path = when(q4 === "", lit("/")).otherwise(q4)
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path))
  }

  /** URL-level dedup keep-flag: `kept` = this row has the smallest `id`
    * for its canonical URL (deterministic winner). Rows whose canonical
    * URL is NULL (unparsable) are ALL kept — a missing URL is not
    * evidence of duplication; content-level dedup owns those. One hash
    * shuffle keyed by the canonical URL. Appends `curl` and `kept`. */
  def dedupByUrl(docs: DataFrame, url: Column, id: Column): DataFrame = {
    val w = Window.partitionBy(col("curl"))
    docs.withColumn("curl", canonicalUrl(url))
      .withColumn("kept",
        col("curl").isNull || id === min(id).over(w))
  }

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
