package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Single-pass column profiling — the discovery step that precedes a
  * [[Quality]] constraint suite: before you can declare "l_quantity in
  * [1, 50]" you have to LEARN the ranges, null rates, and cardinalities,
  * and at 100 TB you want all of that from ONE scan, not one job per
  * column.
  *
  * [[profile]] compiles every requested column's statistics into a
  * single aggregation (Catalyst plans the multiple exact
  * `countDistinct`s through one Expand; still one scan, one
  * partial+final aggregate) and explodes the result into a tidy
  * (column, stat) report frame — same materialization pattern as
  * `Quality.check`, so it composes with sinks and joins.
  *
  * [[histogram]] is the numeric follow-up: exact equi-width bucket
  * counts (floor arithmetic, no sampling), one groupBy over codegen'd
  * arithmetic — deterministic in any engine, unlike approximate
  * `percentile_approx`-style summaries.
  */
object Profile {

  /** One report row per column: n_rows, n_nulls, n_distinct (exact),
    * numeric min/max (NULL for non-numeric columns), and avg string
    * length (NULL for non-strings). Exact by construction — counts and
    * extrema only, no doubles summed across rows except avg_len whose
    * numerator is an exact integer sum. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c), s"no such column: $c"))

    // index-based internal aliases (the Quality.check pattern): raw
    // column names inside alias strings break on dotted names when
    // re-resolved, and duplicate requested columns would alias-collide
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val f = schema(c)
      val base = Seq(
        count(lit(1)).as(s"__n$i"),
        count(col(c)).as(s"__nn$i"),
        countDistinct(col(c)).as(s"__ndv$i"))
      val numeric = f.dataType match {
        case _: NumericType => Seq(
          min(col(c)).cast("double").as(s"__min$i"),
          max(col(c)).cast("double").as(s"__max$i"))
        case _ => Seq(
          lit(null).cast("double").as(s"__min$i"),
          lit(null).cast("double").as(s"__max$i"))
      }
      val strLen = f.dataType match {
        case StringType => Seq(
          try_divide(sum(length(col(c))).cast("double"), count(col(c)))
            .as(s"__len$i"))
        case _ => Seq(lit(null).cast("double").as(s"__len$i"))
      }
      base ++ numeric ++ strLen
    }
    val agg = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column"),
        col(s"__n$i").as("n_rows"),
        (col(s"__n$i") - col(s"__nn$i")).as("n_nulls"),
        col(s"__ndv$i").as("n_distinct"),
        col(s"__min$i").as("min_num"),
        col(s"__max$i").as("max_num"),
        col(s"__len$i").as("avg_len"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select("r.column", "r.n_rows", "r.n_nulls", "r.n_distinct",
        "r.min_num", "r.max_num", "r.avg_len")
      .orderBy("column")
  }

  /** Candidate-key discovery / uniqueness audit: for each requested
    * column combination, exact row count, distinct-combination count,
    * incomplete-row count (any null member), and the key verdict —
    * `is_key` iff every row is complete and no combination repeats
    * (the PK test you run before declaring a merge key or a dedup
    * identity). `uniq_ppm` = n_distinct·10⁶ DIV n_rows gives the
    * near-key score for profiling.
    *
    * Distinctness counts combinations as STRUCT values, so a null
    * member is a value (two (NULL, 1) rows are duplicates of each
    * other) — matching SQL row-value semantics (`count(DISTINCT
    * ROW(a,b))`), not single-column `count(DISTINCT a)` null-skipping.
    * `is_key` additionally requires zero incomplete rows, per SQL PK
    * semantics.
    *
    * Scale posture: ONE Aggregate over ONE scan — each combo adds a
    * distinct-aggregate branch to the Expand (map-side dedup per
    * branch), so the cost is #combos partial dedups in a single pass,
    * never #combos scans. Audit a handful of candidate combos at a
    * time, not the power set. */
  def uniqueness(df: DataFrame, combos: Seq[Seq[String]]): DataFrame = {
    require(combos.nonEmpty, "need at least one column combination")
    combos.foreach(c => require(c.nonEmpty, "empty column combination"))
    val aggs = combos.zipWithIndex.flatMap { case (cs, i) =>
      val s = struct(cs.map(col): _*)
      Seq(
        countDistinct(s).as(s"__ndv$i"),
        count(when(cs.map(col(_).isNull).reduce(_ || _), 1)).as(s"__inc$i"))
    }
    val agg = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = combos.zipWithIndex.map { case (cs, i) =>
      struct(
        lit(cs.mkString(",")).as("combo"),
        col("__n").as("n_rows"),
        col(s"__ndv$i").as("n_distinct"),
        col(s"__inc$i").as("n_incomplete"),
        (col(s"__inc$i") === 0L && col(s"__ndv$i") === col("__n")).as("is_key"),
        when(col("__n") > 0L,
          expr(s"(__ndv$i * 1000000L) DIV __n")).as("uniq_ppm"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select("r.combo", "r.n_rows", "r.n_distinct", "r.n_incomplete",
        "r.is_key", "r.uniq_ppm")
      .orderBy("combo")
  }

  /** Exact equi-width histogram of a numeric column over [lo, hi):
    * (bucket, lo_edge, hi_edge, n). Values outside the range clamp into
    * the end buckets (so the counts always sum to the non-null row
    * count); bucket = floor((x-lo)/(hi-lo)·nb) clamped to [0, nb). All
    * integer/floor arithmetic — bit-deterministic cross-engine. */
  def histogram(df: DataFrame, c: Column, lo: Double, hi: Double,
                nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"need at least one bucket, got $nBuckets")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val width = (hi - lo) / nBuckets
    val raw = floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(nBuckets))
    val bucket = greatest(lit(0L), least(lit(nBuckets - 1L), raw.cast("long")))
    df.filter(c.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(lo) + col("bucket") * width).as("lo_edge"),
        (lit(lo) + (col("bucket") + 1) * width).as("hi_edge"),
        col("n"))
      .orderBy("bucket")
  }

  /** 1-D Earth Mover's Distance between two snapshots of an integer
    * measure, over equal-width integer bins — the drift metric that
    * SEES ORDER ([[driftChi2]] scores "these bins differ"; EMD scores
    * "the mass moved three bins to the right", which is what a price
    * or latency shift actually does). For unit-width bins,
    * EMD = Σ_k |cumA(k) − cumB(k)| — exact in integer ppm shares.
    *
    * Both sides bin with clamp((v − lo)·bins DIV (hi − lo)) — all
    * integer; shares are truncating ppm; the cumulative runs over the
    * BINS-sized frame. Output (one row): `n_a`, `n_b` LONG,
    * `emd_ppm` LONG (Σ |cumΔ| in ppm·bin units — divide by bins
    * locally for a [0, 1e6] normalization).
    */
  def histogramEmd(a: DataFrame, b: DataFrame, value: Column,
                   lo: Long, hi: Long, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    def binned(df: DataFrame, n: String): DataFrame = df
      .select(value.cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("bin",
        greatest(lit(0L), least(lit(bins - 1L),
          expr(s"((__v - ${lo}L) * ${bins}L) DIV ${hi - lo}L"))))
      .groupBy(col("bin")).agg(count(lit(1)).as(n))
    val ja = binned(a, "__na")
    val jb = binned(b, "__nb")
    val spark = a.sparkSession
    import spark.implicits._
    val spine = (0L until bins.toLong).toDF("bin")
    val joined = broadcast(spine)
      .join(ja, Seq("bin"), "left_outer")
      .join(jb, Seq("bin"), "left_outer")
      .withColumn("__na", coalesce(col("__na"), lit(0L)))
      .withColumn("__nb", coalesce(col("__nb"), lit(0L)))
    val totals = joined.agg(
      coalesce(sum(col("__na")), lit(0L)).as("n_a"),
      coalesce(sum(col("__nb")), lit(0L)).as("n_b"))
    val w = BoundedWindow.ordered(col("bin"), col("bin"))
      .rowsBetween(Window.unboundedPreceding, 0) // bins-sized frame
    joined.crossJoin(broadcast(totals))
      .withColumn("__sa",
        when(col("n_a") > 0L, expr("(1000000L * __na) DIV n_a"))
          .otherwise(lit(0L)))
      .withColumn("__sb",
        when(col("n_b") > 0L, expr("(1000000L * __nb) DIV n_b"))
          .otherwise(lit(0L)))
      .withColumn("__ca", sum(col("__sa")).over(w))
      .withColumn("__cb", sum(col("__sb")).over(w))
      .groupBy(col("n_a"), col("n_b"))
      .agg(coalesce(sum(abs(col("__ca") - col("__cb"))), lit(0L))
        .as("emd_ppm"))
      .select(col("n_a"), col("n_b"), col("emd_ppm"))
  }

  /** Exact mode per group: the most frequent value, ties to the
    * LOWEST value (deterministic on any engine/layout) — the
    * categorical imputation default and the "dominant variant" readout.
    * One (group, value) aggregate with map-side combine, then a rank
    * window over the distinct-pairs-sized frame (WindowGroupLimit
    * under rank = 1).
    *
    * Output: `group`, `mode_value`, `n_mode` LONG, `n_distinct` LONG,
    * `n_total` LONG, `mode_share_ppm` LONG (truncating), total order
    * by group. Null values are absence, not a candidate mode.
    */
  def modeByGroup(df: DataFrame, group: Column, value: Column): DataFrame = {
    val counts = df
      .select(group.cast("string").as("group"),
        value.cast("string").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("group"), col("__v")).agg(count(lit(1)).as("__n"))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("__n").desc, col("__v"))
    counts
      .withColumn("__r", row_number().over(w))
      .withColumn("n_distinct",
        count(lit(1)).over(Window.partitionBy(col("group"))))
      .withColumn("n_total",
        sum(col("__n")).over(Window.partitionBy(col("group"))))
      .filter(col("__r") === 1)
      .select(col("group"), col("__v").as("mode_value"),
        col("__n").as("n_mode"), col("n_distinct"), col("n_total"),
        expr("(1000000L * __n) DIV n_total").as("mode_share_ppm"))
      .orderBy("group")
  }

  /** Value-pattern profile: collapse each string to its character-class
    * signature (uppercase runs → A, lowercase → a, digits → 9, all
    * else verbatim) and count signatures — the schema-inference mask
    * analysis that spots "this id column has three formats" before a
    * parser does. One narrow codegen'd projection into a
    * signatures-sized aggregate; the example value is the MINIMUM
    * (deterministic, never "whichever row we saw first").
    *
    * Output: top `topK` signatures by (n DESC, signature): `signature`,
    * `n` LONG, `example` STRING, total order (n DESC, signature).
    */
  def patternProfile(df: DataFrame, column: Column,
                     topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK >= 1")
    df.select(column.cast("string").as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("signature",
        regexp_replace(regexp_replace(regexp_replace(
          col("__v"), "[A-Z]+", "A"), "[a-z]+", "a"), "[0-9]+", "9"))
      .groupBy(col("signature"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("example"))
      .orderBy(col("n").desc, col("signature"))
      .limit(topK)
  }

  /** Per-group min-max scaling to ppm — the feature-normalization
    * staple ([[quantileNormalize]]'s rank-free sibling): scaled =
    * 1e6·(x − min) DIV (max − min), exact integers; degenerate groups
    * (max = min) scale to NULL, never a fake 0 or ÷0. One group
    * min/max aggregate + an equi-join back (AQE broadcasts sane group
    * tables). Output: `id`, `group`, `value` LONG, `scaled_ppm`
    * LONG-or-NULL, total order by id.
    */
  def minMaxScale(df: DataFrame, id: Column, group: Column,
                  value: Column): DataFrame = {
    val base = df.select(id.as("id"), group.cast("string").as("group"),
        value.cast("long").as("value"))
      .filter(col("value").isNotNull)
    val stats = base.groupBy(col("group"))
      .agg(min(col("value")).as("__lo"), max(col("value")).as("__hi"))
    base.join(stats, "group")
      .withColumn("scaled_ppm",
        when(col("__hi") > col("__lo"),
          expr("CAST((1000000L * CAST(value - __lo AS DECIMAL(38,0))) DIV (__hi - __lo) AS BIGINT)")))
      .select(col("id"), col("group"), col("value"), col("scaled_ppm"))
      .orderBy("id")
  }

  /** Per-partition MERGEABLE statistics — incremental profiling, the
    * aggregate-maintenance pattern: at 100 TB you profile each arriving
    * partition once, store the tiny partial rows, and answer any
    * whole-table (or any-subset) question by RE-AGGREGATING partials —
    * never rescanning history. Every statistic here is algebraic
    * (count/sum/min/max: agg(all) == re-agg(per-part aggs), exactly —
    * pass a DECIMAL-cast value for exact sums; IEEE double sums
    * re-aggregate approximately). One map-side-combined shuffle keyed
    * by the partition column; output is O(#partitions). */
  def statsByPartition(df: DataFrame, part: Column, value: Column): DataFrame =
    df.groupBy(part.as("part"))
      .agg(count(lit(1)).as("n_rows"),
        count(value).as("n_nonnull"),
        sum(value).as("sum_v"),
        min(value).as("min_v"),
        max(value).as("max_v"))

  /** Collapse [[statsByPartition]] partials (any subset, any union of
    * old + newly arrived) into one global row — bit-identical to a
    * direct scan for the algebraic stats above. */
  def mergeStats(partials: DataFrame): DataFrame =
    partials.agg(
      sum(col("n_rows")).as("n_rows"),
      sum(col("n_nonnull")).as("n_nonnull"),
      sum(col("sum_v")).as("sum_v"),
      min(col("min_v")).as("min_v"),
      max(col("max_v")).as("max_v"))

  /** The NON-algebraic companion to [[statsByPartition]]: exact distinct
    * counts cannot be maintained incrementally (distinct(a ∪ b) ≠
    * f(distinct(a), distinct(b))), so incremental profiling carries a
    * mergeable DataSketches HLL sketch per partition instead.
    * Sketch union is EXACT with respect to sketching — merging per-
    * partition sketches yields bit-identically the sketch (and thus the
    * estimate) a direct whole-table pass would build — so the stored
    * partials answer any-subset distinct questions forever with one
    * O(#partitions) re-union, error bounded by lgK (~1.6% at lgK=12). */
  def distinctSketchByPartition(df: DataFrame, part: Column, value: Column,
                                lgK: Int = 12): DataFrame =
    df.groupBy(part.as("part"))
      .agg(hll_sketch_agg(value, lit(lgK)).as("distinct_sketch"))

  /** Union [[distinctSketchByPartition]] partials (any subset) into one
    * estimated distinct count. */
  def mergeDistinctEstimate(partials: DataFrame): DataFrame =
    partials.agg(hll_sketch_estimate(
      hll_union_agg(col("distinct_sketch"), lit(false))).as("n_distinct_est"))

  /** Equi-DEPTH binning (quantile bucketing): assigns each row a bin in
    * [0, nb) such that bin populations differ by at most one — the
    * feature-engineering counterpart of [[histogram]]'s equi-width
    * buckets. bin = (rank−1)·nb DIV n over the GLOBAL order given by
    * `keys` (a total order — include a tiebreaker): pure integer
    * arithmetic, so any engine that can rank reproduces it exactly
    * (unlike `ntile`, whose remainder convention is engine-defined).
    *
    * The rank comes from [[Relational.globalRank]] — range exchange +
    * offset cumsum, never a single-partition `ORDER BY` window — so
    * the binning survives any table size. Appends `rank` and `bin`. */
  def equiDepthBins(df: DataFrame, keys: Seq[Column], nb: Int): DataFrame = {
    require(nb >= 1, s"need at least one bin, got $nb")
    val ranked = Relational.globalRank(df, keys)
    // n arrives as a 1-row broadcast cross join — cheaper and clearer
    // than a whole-frame window
    ranked.join(broadcast(df.groupBy().agg(count(lit(1)).as("__n"))))
      .withColumn("bin", expr(s"((rank - 1) * $nb) DIV __n").cast("int"))
      .drop("__n")
  }

  /** Per-group winsorization at EXACT order statistics — the robust
    * feature-cleaning step (clip outliers to the p-lo/p-hi quantiles)
    * with discrete quantiles, not interpolated ones: the bound is the
    * value at sorted position ⌈p·n⌉ (1-based) — equivalently the
    * SMALLEST value whose cumulative count reaches the position.
    * Interpolated quantiles (`percentile`/`quantile_cont`) average two
    * neighbors in engine-specific IEEE op order; position arithmetic is
    * bit-deterministic in any engine and keeps DECIMAL columns DECIMAL.
    *
    * Scale shape — never sorts the rows: a low-cardinality group column
    * would force the whole table through #groups sort partitions if
    * this used a rank window (the classic skew trap). Instead the
    * bounds come from per-(group, value) COUNTS: one map-side-combined
    * aggregate (shuffle volume = distinct pairs, not rows), a
    * cumulative-count window over DISTINCT VALUES only, a #groups-row
    * bounds frame joined back (broadcast at any sane group count), and
    * one clip projection. NULL values don't rank and stay NULL. */
  def winsorize(df: DataFrame, group: Column, value: Column,
                pLo: Double, pHi: Double): DataFrame = {
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(value.isNotNull)
      .groupBy(group.as("__g"), value.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val part = Window.partitionBy(col("__g"))
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(part.orderBy(col("__v"))))
      .withColumn("__n", sum(col("__c")).over(
        part.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val loPos = greatest(ceil(lit(pLo) * col("__n")), lit(1L))
    val hiPos = greatest(ceil(lit(pHi) * col("__n")), lit(1L))
    val bounds = cum.groupBy(col("__g"))
      .agg(min(when(col("__cum") >= loPos, col("__v"))).as("__lo"),
        min(when(col("__cum") >= hiPos, col("__v"))).as("__hi"))
    df.join(bounds, group <=> col("__g"), "left_outer")
      .withColumn("clipped",
        when(value.isNull, value)
          .when(value < col("__lo"), col("__lo"))
          .when(value > col("__hi"), col("__hi"))
          .otherwise(value))
      .drop("__g", "__lo", "__hi")
  }

  /** Distribution DRIFT between two corpus slices (release n vs n−1,
    * source A vs B): chi-squared statistic over shared equi-width bins
    * — the monitoring gate that catches "this release's length/score
    * distribution shifted" before training does. Laplace-smoothed
    * (+1 per bin on the reference side, so an empty reference bin is a
    * large finite signal, never a division blow-up) and computed in
    * DETERMINISTIC integer ppm: with o/r the bin counts and N/R the
    * (smoothed) totals, each bin contributes
    *
    *   term_ppm = ⌊(o·R − r'·N)² · 10⁶ / (r'·R·N)⌋,   r' = r + 1
    *
    * a fixed tree of exact-integer-seeded IEEE ops floored per bin and
    * then SUMMED AS INTEGERS — order-free, engine-exact (cross-
    * multiplied form of (o−e)²/e with e = r'·N/R, scaled by N).
    * chi2_ppm/10⁶ ≈ the classic χ² against expected-under-reference.
    *
    * Shape: one histogram aggregate per side (map-side combined, ≤ nb
    * rows out), a broadcast-sized bin join, integer arithmetic. Output:
    * one row per bin (bin, n_cur, n_ref, term_ppm) with the total
    * `chi2_ppm` repeated on each row (bins are few by contract). */
  def driftChi2(cur: DataFrame, ref: DataFrame, value: Column,
                lo: Double, hi: Double, nb: Int): DataFrame = {
    require(nb >= 1, s"need at least one bin, got $nb")
    val bins = cur.sparkSession.range(0, nb).select(col("id").as("bin"))
    def binned(df: DataFrame, out: String): DataFrame =
      histogram(df, value, lo, hi, nb)
        .select(col("bucket").as("bin"), col("n").as(out))
    val joined = bins
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .join(binned(ref, "n_ref"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"))
    val totals = joined.agg(sum(col("n_cur")).as("__n"),
      (sum(col("n_ref")) + nb).as("__r")) // smoothed reference total
    val o = col("n_cur"); val r1 = col("n_ref") + 1L
    val num = (o * col("__r") - r1 * col("__n")).cast("double")
    val den = (r1 * col("__r") * col("__n")).cast("double")
    joined.crossJoin(broadcast(totals))
      .withColumn("term_ppm",
        when(col("__n") > 0, floor(num * num / den * 1e6).cast("long"))
          .otherwise(lit(0L)))
      .withColumn("chi2_ppm", {
        import org.apache.spark.sql.expressions.Window
        // nb-row frame by contract — the single-partition window is
        // bin-sized (explicit, BoundedWindow-style)
        sum(col("term_ppm")).over(BoundedWindow.total(col("bin")))
      })
      .select(col("bin"), col("n_cur"), col("n_ref"), col("term_ppm"),
        col("chi2_ppm"))
  }

  /** Positional median per group over DISTINCT-VALUE COUNTS — the
    * value at 1-based sorted position ⌈n/2⌉ (same discrete-quantile
    * convention as [[winsorize]]): no interpolation, engine-exact,
    * and the rows themselves never sort — only distinct values do. */
  private def positionalMedian(df: DataFrame, group: Column,
                               value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(value.isNotNull)
      .groupBy(group.as("__g"), value.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val part = Window.partitionBy(col("__g"))
    counts
      .withColumn("__cum", sum(col("__c")).over(part.orderBy(col("__v"))))
      .withColumn("__n", sum(col("__c")).over(
        part.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .groupBy(col("__g"))
      // cum ≥ ⌈n/2⌉ ⇔ 2·cum ≥ n (both parities: 2·cum is even, so for
      // odd n the inequality self-tightens to n+1)
      .agg(min(when(col("__cum") * 2 >= col("__n"), col("__v"))).as("__med"))
  }

  /** Robust per-group z-score: distance from the positional median in
    * units of the MAD (median absolute deviation) — the outlier score
    * that one wild value cannot drag the way mean/stddev z-scores can
    * (Hampel q89 is the ROLLING variant; this is the global one a
    * corpus-stats audit wants). Both medians are discrete order
    * statistics over (group, value) COUNTS — exact, no interpolation,
    * no row sorts — and `z = dev/mad` is one IEEE division, NULL when
    * the MAD is 0 (≥ half the group at the median — deviation has no
    * robust unit) or the value is NULL. Appends `med`, `dev`, `mad`,
    * `z`. Two count-aggregate passes + two broadcast-sized joins. */
  /** Exact contingency table with chi-squared cell contributions — the
    * categorical-association audit (is event mix independent of user
    * segment; is language independent of source). For each (row, col)
    * cell: observed count, the expected count under independence in
    * truncating milli-units (row_total·col_total·1000 DIV grand), and
    * the cell's chi² contribution in micro-units computed from those
    * integers:
    *
    *   chi2_micro = (1000 · (1000·obs − exp_milli)²) DIV exp_milli
    *
    * — every step integer, so cells are engine- and layout-exact
    * (chi-squared against thresholds is the caller's last, local step;
    * [[driftChi2]] is the two-snapshot sibling over one dimension).
    *
    * Scale posture: ONE (row, col) aggregate with map-side combine;
    * marginals come from windows over that cells-sized frame — the
    * events table is never re-scanned. Null categories on either axis
    * are dropped. Output: `row_val`, `col_val`, `n` LONG, `exp_milli`
    * LONG, `chi2_micro` LONG, total order (row_val, col_val).
    */
  def contingency(df: DataFrame, rowC: Column, colC: Column): DataFrame = {
    val cells = df
      .select(rowC.cast("string").as("row_val"),
        colC.cast("string").as("col_val"))
      .filter(col("row_val").isNotNull && col("col_val").isNotNull)
      .groupBy(col("row_val"), col("col_val"))
      .agg(count(lit(1)).as("n"))
    val wr = Window.partitionBy(col("row_val"))
    val wc = Window.partitionBy(col("col_val"))
    val wg = BoundedWindow.all(col("row_val"))
    cells
      .withColumn("__rt", sum(col("n")).over(wr))
      .withColumn("__ct", sum(col("n")).over(wc))
      .withColumn("__g", sum(col("n")).over(wg))
      .withColumn("exp_milli",
        expr("(CAST(__rt AS DECIMAL(38,0)) * __ct * 1000L) DIV __g")
          .cast("long"))
      .withColumn("chi2_micro",
        when(col("exp_milli") > 0L,
          expr("""CAST((1000L * CAST(1000L * n - exp_milli AS DECIMAL(38,0)) *
                 (1000L * n - exp_milli)) DIV exp_milli AS BIGINT)"""))
          .otherwise(lit(0L)))
      .drop("__rt", "__ct", "__g")
      .orderBy("row_val", "col_val")
  }

  /** Join-cardinality forecast: the EXACT output size |A ⋈ B| on a key,
    * decomposed by contribution — Σ_k cA(k)·cB(k) — plus the top
    * explosive keys. The shuffle-planning audit you run BEFORE a
    * 100 TB join: a handful of hot keys carrying billions of output
    * rows is a salting decision, and this surfaces them for the cost
    * of two key-count aggregates (never the join itself).
    *
    * Output row 1 (`key` NULL): totals — `n_keys_both` LONG,
    * `est_rows` LONG (exact Σ products, DECIMAL-safe). Rows 2..k+1:
    * the top `topK` keys by contribution (`key`, `n_a`, `n_b`,
    * `est_rows`), selected under the total order (est_rows DESC, key).
    * Output total order: key ASC NULLS FIRST (the summary row leads).
    */
  def joinCardinality(a: DataFrame, aKey: Column, b: DataFrame,
                      bKey: Column, topK: Int = 10): DataFrame = {
    val ca = a.select(aKey.cast("string").as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("n_a"))
    val cb = b.select(bKey.cast("string").as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("n_b"))
    val both = ca.join(cb, "key")
      .withColumn("est_rows",
        (col("n_a").cast("decimal(38,0)") * col("n_b")).cast("long"))
    val summary = both.agg(
      lit(null).cast("string").as("key"),
      lit(null).cast("long").as("n_a"),
      lit(null).cast("long").as("n_b"),
      coalesce(count(lit(1)), lit(0L)).as("n_keys_both"),
      coalesce(sum(col("est_rows")), lit(0L)).as("est_total"))
    val top = both
      .orderBy(col("est_rows").desc, col("key")).limit(topK)
      .withColumn("n_keys_both", lit(null).cast("long"))
      .withColumn("est_total", lit(null).cast("long"))
      .select(col("key"), col("n_a"), col("n_b"), col("n_keys_both"),
        col("est_total"), col("est_rows"))
    summary
      .withColumn("est_rows", lit(null).cast("long"))
      .select(col("key"), col("n_a"), col("n_b"), col("n_keys_both"),
        col("est_total"), col("est_rows"))
      .unionByName(top)
      .orderBy(col("key").asc_nulls_first)
  }

  /** Mass-concentration (Lorenz) deciles over a keyed distribution:
    * "the top 10% of domains hold X% of the corpus" — the curation
    * readout behind [[graft.operators.Domains]]-style caps and crawl
    * rebalancing, exact and engine-portable (no float CDF).
    *
    * Keys are ranked by descending mass (ties by key); for each decile
    * d, the row reports the top ⌊d·K/10⌋ keys' cumulative mass and its
    * ppm share of the total. Both the rank and the running mass follow
    * the [[Relational.globalRank]] discipline — range exchange,
    * per-partition prefix sums, O(#partitions) broadcast offsets —
    * never a single-partition window over the key frame.
    *
    * Output: `decile` INT (1..10), `top_keys` LONG (⌊d·K/10⌋), `mass`
    * LONG (cumulative), `share_ppm` LONG (truncating); deciles whose
    * boundary is 0 keys (K < 10) are omitted. Total order by decile.
    */
  def concentrationCurve(df: DataFrame, key: Column,
                         weight: Column): DataFrame = {
    val counts = df
      .select(key.cast("string").as("__k"), weight.cast("long").as("__w"))
      .filter(col("__k").isNotNull && col("__w").isNotNull)
      .groupBy(col("__k")).agg(sum(col("__w")).as("__m"))
    val parted = counts.repartitionByRange(col("__m").desc, col("__k"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = parted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), coalesce(sum(col("__m")), lit(0L)).as("__pm"))
      .withColumn("__rank_off",
        coalesce(sum(col("__cnt")).over(BoundedWindow.ordered(col("__pid"), col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__mass_off",
        coalesce(sum(col("__pm")).over(BoundedWindow.ordered(col("__pid"), col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__rank_off"), col("__mass_off"))
    val wp = Window.partitionBy(col("__pid"))
      .orderBy(col("__m").desc, col("__k"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = parted.join(broadcast(offsets), "__pid")
      .withColumn("__rank", col("__rank_off") +
        row_number().over(Window.partitionBy(col("__pid"))
          .orderBy(col("__m").desc, col("__k"))))
      .withColumn("__cum", col("__mass_off") + sum(col("__m")).over(wp))
    val totals = counts.agg(count(lit(1)).as("__kk"),
      coalesce(sum(col("__m")), lit(0L)).as("__tt"))
    val spark = df.sparkSession
    import spark.implicits._
    val deciles = (1 to 10).toDF("decile")
    broadcast(deciles).crossJoin(broadcast(totals))
      .withColumn("top_keys", expr("(decile * __kk) DIV 10"))
      .filter(col("top_keys") >= 1L)
      .join(ranked.select(col("__rank"), col("__cum")),
        col("top_keys") === col("__rank"))
      .select(col("decile"), col("top_keys"), col("__cum").as("mass"),
        when(col("__tt") > 0L,
          expr("CAST((1000000L * CAST(__cum AS DECIMAL(38,0))) DIV __tt AS BIGINT)"))
          .otherwise(lit(0L)).as("share_ppm"))
      .orderBy("decile")
  }

  def madZscore(df: DataFrame, group: Column, value: Column): DataFrame = {
    val med = positionalMedian(df, group, value)
      .select(col("__g").as("__mg"), col("__med"))
    val withMed = df.join(med, group <=> col("__mg"), "left_outer")
      .withColumn("med", col("__med"))
      .withColumn("dev", abs(value - col("med")))
      .drop("__mg", "__med")
    val mad = positionalMedian(withMed, group, col("dev"))
      .select(col("__g").as("__mg"), col("__med").as("mad"))
    withMed.join(mad, group <=> col("__mg"), "left_outer")
      .withColumn("z",
        when(value.isNotNull && col("mad") > 0,
          col("dev").cast("double") / col("mad")))
      .drop("__mg")
  }

  /** Quantile (rank) normalization — the score-calibration step a
    * mixing pipeline runs before comparing quality scores from
    * different scorers/sources: map each row's score to its empirical
    * quantile `q = (rank−1)/(n−1)` in [0, 1] (n = 1 maps to 0.0). Two
    * calibrated columns are then directly comparable ("keep the top
    * 30% of each source") no matter how skewed either raw score is.
    *
    * Deterministic: `keys` must totally order rows (append the id as a
    * tiebreaker), rank is an exact integer from
    * [[Relational.globalRank]] — range exchange + offset cumsum, never
    * a single-partition ORDER BY window — and the quantile is one IEEE
    * division of integers. Appends `rank` and `quantile`. */
  def quantileNormalize(df: DataFrame, keys: Seq[Column]): DataFrame = {
    val ranked = Relational.globalRank(df, keys)
    ranked.join(broadcast(df.groupBy().agg(count(lit(1)).as("__n"))))
      .withColumn("quantile",
        when(col("__n") === 1L, lit(0.0))
          .otherwise((col("rank") - 1L).cast("double") / (col("__n") - 1L)))
      .drop("__n")
  }

  /** Exact Pearson correlation matrix over 2-decimal-quantized numeric
    * columns, in ONE scan — and deterministic to the bit across
    * engines, which the built-in `corr` (float accumulation in
    * partition order) can never be. Trick: every moment is an exact
    * integer — values scale to cents (LONG), and Σx, Σx², Σxy
    * accumulate as DECIMAL(38,0) (order-free integer sums); then
    *
    *   r = (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²))
    *
    * runs as a fixed tree of IEEE doubles whose inputs are identical
    * integers — and IEEE-754 sqrt/div/mul are CORRECTLY-ROUNDED
    * operations (unlike ln/exp/pow), so any compliant engine emits the
    * same bits. Headroom: cents² sums fit DECIMAL(38) up to ~10¹⁸ rows
    * for values ≤ 10⁶ in magnitude.
    *
    * One aggregate (map-side partial) computes all k + k(k+1)/2
    * moments; the pair explosion after it touches a 1-row frame.
    * Output: (col_x, col_y, n, r) for each pair x < y; r is NULL for a
    * zero-variance side (correlation undefined). */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.length >= 2, "need at least two columns")
    require(cols.distinct.length == cols.length, "duplicate column")
    def cents(c: String): Column =
      (col(c).cast("decimal(18,2)") * 100).cast("long")
    val d380 = "decimal(38,0)"
    val aggs =
      cols.map(c => sum(cents(c).cast(d380)).as(s"s_$c")) ++
      cols.map(c => sum((cents(c) * cents(c)).cast(d380)).as(s"ss_$c")) ++
      (for (i <- cols.indices; j <- cols.indices if i < j)
        yield sum((cents(cols(i)) * cents(cols(j))).cast(d380))
          .as(s"sp_${cols(i)}__${cols(j)}"))
    val m = df.agg(count(lit(1)).as("n"), aggs: _*)
    val pairs = for (i <- cols.indices; j <- cols.indices if i < j) yield {
      val (x, y) = (cols(i), cols(j))
      val varX = (col("n") * col(s"ss_$x") - col(s"s_$x") * col(s"s_$x")).cast("double")
      val varY = (col("n") * col(s"ss_$y") - col(s"s_$y") * col(s"s_$y")).cast("double")
      val cov = (col("n") * col(s"sp_${x}__${y}") - col(s"s_$x") * col(s"s_$y")).cast("double")
      struct(lit(x).as("col_x"), lit(y).as("col_y"), col("n").as("n"),
        when(varX > 0 && varY > 0, cov / (sqrt(varX) * sqrt(varY)))
          .as("r"))
    }
    m.select(explode(array(pairs: _*)).as("p")).select(col("p.*"))
  }

  /** Exact trimmed mean per group — the robust location estimate
    * between the mean (outlier-hostage) and the median (throws away
    * 98% of the data): drop the `trimPpm` fraction off EACH end by
    * rank and average what's left, all in integers.
    *
    * Rank-based, not value-based: `t = (n · trimPpm) DIV 10⁶` rows are
    * cut from each side under the total order (value, tiebreak) — so
    * ties at the cut line resolve deterministically and the result is
    * layout-independent on any engine. The kept-range mean is an exact
    * DECIMAL(38,0) sum with truncating DIV. Groups where trimming
    * would eat everything (n ≤ 2t) report NULL, never a fabricated
    * number; `mean_cents` (untrimmed) rides along as the contrast.
    *
    * Shape: ONE group exchange — the rank window and the conditional
    * aggregate share its sort. Output: `group`, `n`, `n_trim_side`,
    * `n_kept`, `mean_cents`, `trimmed_mean_cents`; total order by
    * group. */
  def trimmedMean(df: DataFrame, group: Column, valueCents: Column,
                  tieBreak: Column, trimPpm: Long = 100000L): DataFrame = {
    require(trimPpm >= 0 && trimPpm < 500000L,
      "trimPpm in [0, 500000) — trimming half off each side keeps nothing")
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("__v").asc, col("__tb").asc)
    val whole = Window.partitionBy(col("__g"))
    df.select(group.cast("string").as("__g"),
        valueCents.cast("long").as("__v"), tieBreak.as("__tb"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w).cast("long"))
      // group size as a whole-partition window — shares the one exchange
      .withColumn("__n", count(lit(1)).over(whole))
      .withColumn("__t", expr(s"(__n * ${trimPpm}L) DIV 1000000L"))
      .withColumn("__keep",
        col("__rn") > col("__t") && col("__rn") <= col("__n") - col("__t"))
      .groupBy(col("__g"))
      .agg(
        max(col("__n")).as("n"),
        max(col("__t")).as("n_trim_side"),
        expr("CAST(sum(CAST(__v AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
          .as("mean_cents"),
        sum(when(col("__keep"), expr("CAST(__v AS DECIMAL(38,0))")))
          .as("__ksum"),
        coalesce(sum(when(col("__keep"), 1L).otherwise(0L)), lit(0L))
          .as("n_kept"))
      .select(col("__g").as("group"), col("n"), col("n_trim_side"),
        col("n_kept"), col("mean_cents"),
        expr("CASE WHEN n_kept > 0 THEN CAST(__ksum DIV n_kept AS BIGINT) END")
          .as("trimmed_mean_cents"))
      .orderBy("group")
  }

  /** Population Stability Index between two corpus slices — the
    * credit-scoring-standard drift number ([[driftChi2]]'s
    * information-theoretic sibling; KS is the binning-free one):
    *
    *   PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)
    *
    * with p = current share, q = reference share. The conventional
    * read: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted. Both
    * sides are Laplace-smoothed (+1 per bin) so an empty bin on either
    * side is a large finite signal, never ±∞ — and smoothing BOTH
    * sides keeps PSI's defining symmetry property PSI(a,b) = PSI(b,a)
    * with the roles swapped (terms negate; the total is identical).
    *
    * Determinism: per bin one pinned IEEE sequence from exact long
    * counts — two divisions for p and q, one ln of their ratio
    * computed as (c'·R')/(r'·N') (products first, the BM25 ln
    * precedent), one multiply — floor-quantized to NANO (PSI terms of
    * stable bins live at 1e-4) and summed as longs, order-free.
    *
    * Shape: one histogram aggregate per side (map-side combined, ≤ nb
    * rows out), a bins-sized join, integer+pinned-IEEE arithmetic on
    * the bins frame. Output: one row per bin (`bin`, `n_cur`, `n_ref`
    * LONG, `term_nano` LONG) with the total `psi_nano` repeated per
    * row; total order by bin. */
  def psi(cur: DataFrame, ref: DataFrame, value: Column,
          lo: Double, hi: Double, nb: Int): DataFrame = {
    require(nb >= 1, s"need at least one bin, got $nb")
    val bins = cur.sparkSession.range(0, nb).select(col("id").as("bin"))
    def binned(df: DataFrame, out: String): DataFrame =
      histogram(df, value, lo, hi, nb)
        .select(col("bucket").as("bin"), col("n").as(out))
    val joined = bins
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .join(binned(ref, "n_ref"), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"))
    val wAll = BoundedWindow.total(col("bin"))
    joined
      // smoothed totals ride windows over the nb-row bins frame
      .withColumn("__nc", sum(col("n_cur") + 1L).over(wAll))
      .withColumn("__nr", sum(col("n_ref") + 1L).over(wAll))
      .withColumn("term_nano",
        floor((((col("n_cur") + 1L).cast("double") / col("__nc")) -
          ((col("n_ref") + 1L).cast("double") / col("__nr"))) *
          log(((col("n_cur") + 1L).cast("double") * col("__nr")) /
            ((col("n_ref") + 1L).cast("double") * col("__nc"))) *
          1000000000L + 0.5).cast("long"))
      .withColumn("psi_nano",
        coalesce(sum(col("term_nano")).over(wAll), lit(0L)))
      .select(col("bin"), col("n_cur"), col("n_ref"), col("term_nano"),
        col("psi_nano"))
      .orderBy("bin")
  }

  /** Per-column categorical entropy profile — "how concentrated is
    * this column": Shannon entropy in nano-nats over the value
    * distribution of each requested column, plus the ln(k) ceiling a
    * caller normalizes against. The schema-wide screen for
    * near-constant columns (entropy ≈ 0: drop or alert) and
    * key-like columns (entropy ≈ ln n). NULL is a VALUE here (a
    * 90%-null column IS concentrated — that's the signal), counted
    * separately in `n_null`.
    *
    * Determinism: per distinct value one pinned sequence — p = c/N
    * (one division), ln(c/N) as ln with products-first seeding, one
    * multiply, floor-nano-quantize — summed as longs (order-free);
    * `ln_k_nano` is one pinned ln of the exact distinct count.
    *
    * Shape: one (value)-counts aggregate PER COLUMN (map-side
    * combined; frames bounded by each column's value space), each
    * collapsed to a one-row rollup, results unioned — the input scans
    * once per column, embarrassingly independent. Output: `column`
    * STRING, `n`, `n_null`, `n_distinct` LONG, `entropy_nano` LONG
    * (−Σ p ln p ≥ 0), `ln_k_nano` LONG (ln n_distinct; 0 for a
    * constant column); total order by column. */
  def columnEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val parts = cols.map { c =>
      val counts = df.select(col(c).cast("string").as("__v"))
        .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
      // the value-count frame is O(distinct values) — corpus-sized for
      // an id-like column — so the grand total joins in as ONE
      // broadcast row instead of a single-partition window over the
      // whole frame (the one former window here that was NOT bounded
      // by construction)
      val total = counts.agg(coalesce(sum(col("__c")), lit(0L)).as("__n"))
      counts
        .crossJoin(broadcast(total))
        .withColumn("__t",
          floor((col("__c").cast("double") / col("__n")) *
            log(col("__c").cast("double") / col("__n")) *
            -1000000000L + 0.5).cast("long"))
        .agg(
          coalesce(sum(col("__c")), lit(0L)).as("n"),
          coalesce(sum(when(col("__v").isNull, col("__c"))
            .otherwise(0L)), lit(0L)).as("n_null"),
          count(lit(1)).as("n_distinct"),
          coalesce(sum(col("__t")), lit(0L)).as("entropy_nano"))
        .select(lit(c).as("column"), col("n"), col("n_null"),
          col("n_distinct"), col("entropy_nano"),
          when(col("n_distinct") > 0L,
            floor(log(col("n_distinct").cast("double")) * 1000000000L
              + 0.5).cast("long")).otherwise(0L).as("ln_k_nano"))
    }
    parts.reduce(_ unionByName _).orderBy("column")
  }

  /** Weighted per-group quantiles — order statistics where each row
    * carries a LONG weight (tokens, bytes, revenue): "the doc length
    * below which half the CORPUS TOKENS sit" is a weighted median, and
    * the unweighted one misestimates it badly when long docs dominate
    * mass. Definition (lower weighted quantile): the smallest value v
    * whose cumulative weight reaches ⌈q·W⌉, W = total weight — exact
    * ceil-division integer ranks, no float ever decides one, and tied
    * values are safe because the k-th smallest VALUE by weight is
    * order-independent.
    *
    * The NULL group is a real slice (the [[graft.operators.Classify]]
    * conformal/woeIv convention): NULL-keyed rows get their own
    * quantiles via a null-safe totals⋈cum join. Rows with NULL value
    * or NULL/non-positive weight are excluded (a zero weight cannot
    * move a rank; negative weight is a contract violation surfaced by
    * exclusion, not corruption).
    *
    * Shape: the winsorize/equidepth discipline — ROWS never sort. One
    * (group, value) weight-sum aggregate (map-side combined; the frame
    * is bounded by |distinct values| per group, which saturates as rows
    * replicate), a per-group cumulative over that counts frame, an
    * explode of the requested q's against the group totals (|groups|·|qs|
    * rows), and one null-safe join + min-when per rank. Output: `group`
    * STRING, `q_ppm` LONG, `n` LONG (rows), `w_total` LONG,
    * `rank_needed` LONG (the weight rank), `quantile` LONG; total order
    * (group NULLS FIRST, q_ppm). */
  def weightedQuantile(df: DataFrame, group: Column, value: Column,
                       weight: Column, qPpms: Seq[Long]): DataFrame = {
    require(qPpms.nonEmpty, "need at least one quantile")
    require(qPpms.forall(q => q > 0L && q <= 1000000L),
      s"q_ppm in (0, 1e6], got $qPpms")
    require(qPpms.distinct.size == qPpms.size, s"duplicate q_ppm in $qPpms")
    val base = df.select(group.cast("string").as("group"),
        value.cast("long").as("__v"), weight.cast("long").as("__w"))
      .filter(col("__v").isNotNull && col("__w").isNotNull &&
        col("__w") > 0L)
    val counts = base.groupBy(col("group"), col("__v"))
      .agg(sum(col("__w")).as("__c"), count(lit(1)).as("__nr"))
    val wv = Window.partitionBy(col("group")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("__cumw", sum(col("__c")).over(wv))
      .withColumnRenamed("group", "__g2")
    val ranks = counts.groupBy(col("group"))
      .agg(sum(col("__c")).as("w_total"), sum(col("__nr")).as("n"))
      .withColumn("q_ppm", explode(typedLit(qPpms.sorted)))
      // ⌈q·W⌉ exactly: the q·W product can pass 2^63 at corpus scale,
      // so it rides DECIMAL(38,0); the rank itself is ≤ W, a LONG
      .withColumn("rank_needed",
        expr("""CAST((CAST(q_ppm AS DECIMAL(38,0)) * w_total + 999999)
               | DIV 1000000 AS BIGINT)""".stripMargin))
    ranks.join(cum, col("group") <=> col("__g2"), "left_outer")
      .groupBy(col("group"), col("q_ppm"), col("n"), col("w_total"),
        col("rank_needed"))
      .agg(min(when(col("__cumw") >= col("rank_needed"), col("__v")))
        .as("quantile"))
      .select(col("group"), col("q_ppm"), col("n"), col("w_total"),
        col("rank_needed"), col("quantile"))
      .orderBy(col("group").asc, col("q_ppm").asc)
  }

  /** Two-sample Kolmogorov–Smirnov distance per group — the
    * distribution-drift readout in the SAME units for every metric:
    * D = sup_v |F_cur(v) − F_ref(v)|, the worst CDF gap. Where
    * [[driftChi2]] needs bin edges chosen up front and [[histogramEmd]]
    * weighs how FAR mass moved, KS is binning-free and answers "at
    * which value do the two samples disagree most" — the classic
    * pre-training drift gate between yesterday's and today's corpus
    * slice.
    *
    * Exact integer core: with cumulative counts cA, cB and sizes
    * nA, nB, the gap at v is |cA·nB − cB·nA| / (nA·nB); the numerator
    * rides DECIMAL(38,0) (cum·n passes 2^63 at corpus scale), the
    * supremum is an integer max, and only the published `d_ppm` does
    * ONE exact integer scale-and-divide. `ks_at` is the smallest value
    * attaining the supremum (deterministic under ties). Groups missing
    * a side publish NULL d_ppm — a one-sided KS is undefined, not 1.
    *
    * Shape: one (group, value) aggregate counting both sides at once
    * (map-side combined; frame bounded by |distinct values| per group —
    * the winsorize discipline), per-group cumulative + max windows over
    * that counts frame, one group-keyed rollup. NULL group is a real
    * slice. Output: `group`, `n_a`, `n_b` LONG, `d_ppm` LONG (NULL if
    * a side is empty), `ks_at` LONG (value attaining D; NULL with
    * d_ppm); total order by group NULLS FIRST. */
  def ksDistance(df: DataFrame, group: Column, sideA: Column,
                 value: Column): DataFrame = {
    val base = df.select(group.cast("string").as("group"),
        sideA.cast("boolean").as("__sa"), value.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__sa").isNotNull)
    val counts = base.groupBy(col("group"), col("__v"))
      .agg(coalesce(sum(when(col("__sa"), 1L).otherwise(0L)), lit(0L))
          .as("__ca"),
        coalesce(sum(when(!col("__sa"), 1L).otherwise(0L)), lit(0L))
          .as("__cb"))
    val wv = Window.partitionBy(col("group")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("group"))
    counts
      .withColumn("__cuma", sum(col("__ca")).over(wv))
      .withColumn("__cumb", sum(col("__cb")).over(wv))
      .withColumn("__na", sum(col("__ca")).over(whole))
      .withColumn("__nb", sum(col("__cb")).over(whole))
      .withColumn("__gap",
        expr("""abs(CAST(__cuma AS DECIMAL(38,0)) * __nb -
               | CAST(__cumb AS DECIMAL(38,0)) * __na)""".stripMargin))
      .withColumn("__gmax", max(col("__gap")).over(whole))
      .groupBy(col("group"), col("__na"), col("__nb"), col("__gmax"))
      .agg(min(when(col("__gap") === col("__gmax"), col("__v")))
        .as("__at"))
      .select(col("group"), col("__na").as("n_a"), col("__nb").as("n_b"),
        when(col("__na") > 0L && col("__nb") > 0L,
          expr("""CAST((1000000 * __gmax) DIV
                 | (CAST(__na AS DECIMAL(38,0)) * __nb) AS BIGINT)"""
            .stripMargin)).as("d_ppm"),
        when(col("__na") > 0L && col("__nb") > 0L, col("__at"))
          .as("ks_at"))
      .orderBy(col("group").asc)
  }

  /** Mann–Whitney U rank-sum test per group — the nonparametric
    * location-shift companion to [[ksDistance]] (KS asks "same
    * distribution?", MWU asks "is one side systematically larger?"):
    * side A vs side B of `sideA` within each `group` slice.
    *
    * The doubled U statistic is exact over the (group, value) counts
    * frame — with c_a/c_b the per-value side counts and cumB< the
    * B-mass strictly below:
    *
    *   u2 = Σ_v c_a(v) · (2·cumB<(v) + c_b(v))     (= 2·U_A, ties = ½)
    *
    * — the same credited-rank shape as `Classify.aucExact` (u2 there IS
    * 2·U; here it generalizes to per-group slices and adds the test).
    * The tie-corrected normal approximation is published as one pinned
    * IEEE sequence over exact integers (exactly [[ksDistance]]'s
    * posture for d_ppm, and `Graph.assortativity`'s for r):
    *
    *   var·(12·n·(n−1)) = n_a·n_b·((n+1)·n·(n−1) − T),  T = Σ_t t³−t
    *   z = (u2 − n_a·n_b) / (2·√(varNum/varDen))
    *
    * div → sqrt → mul → div, each correctly rounded — identical bits in
    * any engine. NULL z when either side is empty or every value is
    * tied (var 0 — the test is undefined, never ±∞).
    *
    * Scale posture: one (group, value) counts aggregate (map-side
    * combined) collapses rows to the value space; the cumulative and
    * the totals ride windows over THAT frame (the winsorize/KS
    * discipline — rows never sort). All products DECIMAL(38,0)-widened,
    * published BIGINT (t³ alone passes 2^63 once a single value repeats
    * ~2e6 times; the audit columns document the same bound as AUC's).
    *
    * Output: `group`, `n_a`, `n_b`, `u2`, `tie_term` LONG, `z`
    * DOUBLE-or-NULL — total order by group.
    */
  /** Quantile–quantile shift profile — WHERE two samples differ, not
    * just whether ([[ksDistance]] says "different", this says "the top
    * decile grew 40% while the median held"): for k = 1..nq the exact
    * k/nq-quantile of each side and the signed delta.
    *
    * Order statistics come off the (side, value) COUNTS frame (rows
    * never sort — the winsorize discipline): the k-th quantile is the
    * value whose cumulative count first reaches r_k = ⌈k·n/nq⌉. Each
    * counts row GENERATES exactly the k's it covers via integer bounds
    *
    *   k_lo = (cumBefore·nq) DIV n + 1,   k_hi = (cum·nq) DIV n
    *
    * (an in-row `sequence` explode — no range-condition join, so no
    * NestedLoop in the plan), all arithmetic exact positive integers.
    * A side with no rows yields NULL quantiles and deltas for every k
    * — visible, never a fake 0.
    *
    * Scale posture: one (side, value) counts aggregate, one window
    * over that frame for the cumulative, a ≤ nq-row generator per
    * counts row, and one nq-sized pivot aggregate.
    *
    * Output (nq rows): `k` INT, `n_a`, `n_b`, `q_a`, `q_b`,
    * `delta` LONG-or-NULL — total order by k.
    */
  def qqShift(df: DataFrame, sideA: Column, value: Column,
              nq: Int = 10): DataFrame = {
    require(nq >= 2, s"nq must be >= 2, got $nq")
    val base = df.select(sideA.cast("boolean").as("__sa"),
        value.cast("long").as("__v"))
      .filter(col("__sa").isNotNull && col("__v").isNotNull)
    val counts = base.groupBy(col("__sa"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val wIncl = Window.partitionBy(col("__sa")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("__sa"))
    val hits = counts
      .withColumn("__cum", sum(col("__c")).over(wIncl))
      .withColumn("__n", sum(col("__c")).over(whole))
      .withColumn("__klo",
        expr(s"((__cum - __c) * ${nq}L) DIV __n + 1L"))
      .withColumn("__khi", expr(s"(__cum * ${nq}L) DIV __n"))
      .filter(col("__khi") >= col("__klo"))
      .select(col("__sa"), col("__v"), col("__n"),
        explode(sequence(greatest(lit(1L), col("__klo")),
          least(lit(nq.toLong), col("__khi")))).as("k"))
    val kFrame = counts.sparkSession.range(1, nq + 1)
      .select(col("id").cast("long").as("k"))
    kFrame.join(hits, Seq("k"), "left_outer")
      .groupBy(col("k"))
      .agg(
        max(when(col("__sa"), col("__n"))).as("n_a"),
        max(when(!col("__sa"), col("__n"))).as("n_b"),
        min(when(col("__sa"), col("__v"))).as("q_a"),
        min(when(!col("__sa"), col("__v"))).as("q_b"))
      .withColumn("delta", col("q_b") - col("q_a"))
      .select(col("k").cast("int").as("k"), col("n_a"), col("n_b"),
        col("q_a"), col("q_b"), col("delta"))
      .orderBy(col("k"))
  }

  /** Spearman rank correlation per group — Pearson on MIDRANKS, the
    * monotone-association screen that outlier-heavy columns need
    * (Pearson q111 reads a single large doc pair as correlation;
    * Spearman caps any row's influence at its rank). Ties get average
    * ranks, kept integer by working in DOUBLED ranks: a tied block
    * occupying ranks a..b has midrank (a+b)/2, so
    *
    *   r2 = 2·cumBefore + cnt + 1          (= 2 · midrank, exact)
    *
    * computed per (group, value) on the COUNTS frame (the KS/winsorize
    * discipline — rows never sort) and joined back to rows. The moment
    * sums are exact DECIMAL(38,0); rho is one pinned IEEE sequence
    * num / (√denx · √deny) — `Graph.assortativity`'s exact posture,
    * NULL when either axis is constant (never 0/0). The doubling
    * cancels in rho (numerator and denominator each scale by 4).
    *
    * Scale posture: two (group, value) counts aggregates + two
    * value-keyed join-backs + one moment aggregate — the rank maps are
    * value-space sized. NULL x/y rows are dropped per pair (quarantine
    * upstream); a NULL group is a REAL slice (the join-back is
    * null-safe on group, so it ranks and correlates like any other). Moment audit columns publish as BIGINT (num ~ 4n⁴
    * passes 2^63 near n ≈ 40k per group — the AUC-style documented
    * bound; widen to hi/lo if that regime is ever gated).
    *
    * Output: `group`, `n` LONG, `num`, `den_x`, `den_y` LONG, `rho`
    * DOUBLE-or-NULL — total order by group.
    */
  def spearman(df: DataFrame, group: Column, x: Column,
               y: Column): DataFrame = {
    val base = df.select(group.cast("string").as("group"),
        x.cast("long").as("__x"), y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def rankMap(v: String): DataFrame = {
      val counts = base.groupBy(col("group"), col(v))
        .agg(count(lit(1)).as("__c"))
      val wb = Window.partitionBy(col("group")).orderBy(col(v).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      counts.withColumn("__cum", coalesce(sum(col("__c")).over(wb), lit(0L)))
        .select(col("group"), col(v),
          (col("__cum") * 2L + col("__c") + 1L).as(s"__r$v"))
    }
    // null-safe group equality: a NULL group is a real slice here (the
    // conformalThreshold lesson — equi-join keys silently drop it)
    val rx = rankMap("__x").withColumnRenamed("group", "__gx")
      .withColumnRenamed("__x", "__vx")
    val ry = rankMap("__y").withColumnRenamed("group", "__gy")
      .withColumnRenamed("__y", "__vy")
    base
      .join(rx, col("group") <=> col("__gx") && col("__x") === col("__vx"))
      .join(ry, col("group") <=> col("__gy") && col("__y") === col("__vy"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        sum(col("__r__x").cast("decimal(38,0)")).as("__sx"),
        sum(col("__r__y").cast("decimal(38,0)")).as("__sy"),
        sum(col("__r__x").cast("decimal(38,0)") * col("__r__x")).as("__sxx"),
        sum(col("__r__y").cast("decimal(38,0)") * col("__r__y")).as("__syy"),
        sum(col("__r__x").cast("decimal(38,0)") * col("__r__y")).as("__sxy"))
      .withColumn("__num", col("n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__dx", col("n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__dy", col("n") * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("rho",
        when(col("__dx") > 0 && col("__dy") > 0,
          col("__num").cast("double") /
            (sqrt(col("__dx").cast("double")) *
              sqrt(col("__dy").cast("double")))))
      .select(col("group"), col("n"), col("__num").cast("long").as("num"),
        col("__dx").cast("long").as("den_x"),
        col("__dy").cast("long").as("den_y"), col("rho"))
      .orderBy(col("group"))
  }

  def mannWhitney(df: DataFrame, group: Column, sideA: Column,
                  value: Column): DataFrame = {
    val base = df.select(group.cast("string").as("group"),
        sideA.cast("boolean").as("__sa"), value.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__sa").isNotNull)
    val counts = base.groupBy(col("group"), col("__v"))
      .agg(coalesce(sum(when(col("__sa"), 1L).otherwise(0L)), lit(0L))
          .as("__ca"),
        coalesce(sum(when(!col("__sa"), 1L).otherwise(0L)), lit(0L))
          .as("__cb"))
    val below = Window.partitionBy(col("group")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    counts
      .withColumn("__cumb", coalesce(sum(col("__cb")).over(below), lit(0L)))
      .groupBy(col("group"))
      .agg(
        coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
        coalesce(sum(col("__cb")), lit(0L)).as("n_b"),
        coalesce(sum(col("__ca").cast("decimal(38,0)") *
            (col("__cumb").cast("decimal(38,0)") * 2L + col("__cb"))),
          lit(0L).cast("decimal(38,0)")).as("__u2"),
        coalesce(sum({
          val t = (col("__ca") + col("__cb")).cast("decimal(38,0)")
          t * t * t - t
        }), lit(0L).cast("decimal(38,0)")).as("__tie"))
      .withColumn("__n", (col("n_a") + col("n_b")).cast("decimal(38,0)"))
      .withColumn("__varnum",
        col("n_a").cast("decimal(38,0)") * col("n_b") *
          ((col("__n") + 1L) * col("__n") * (col("__n") - 1L) - col("__tie")))
      .withColumn("__varden", col("__n") * (col("__n") - 1L) * 12L)
      .withColumn("z",
        when(col("n_a") > 0L && col("n_b") > 0L &&
            col("__varnum") > lit(0L).cast("decimal(38,0)"),
          (col("__u2") - col("n_a").cast("decimal(38,0)") * col("n_b"))
            .cast("double") /
            (sqrt(col("__varnum").cast("double") /
              col("__varden").cast("double")) * 2.0)))
      .select(col("group"), col("n_a"), col("n_b"),
        col("__u2").cast("long").as("u2"),
        col("__tie").cast("long").as("tie_term"), col("z"))
      .orderBy(col("group").asc)
  }

  /** Index of dispersion per group — variance-to-mean ratio of count
    * data, the overdispersion screen in front of any Poisson-ish
    * assumption ("events per user per day are NOT Poisson when D ≫ 1"
    * — burstiness/contagion; D ≪ 1 — regularity/rate limiting; both
    * break the model naive alert thresholds assume). Cleared of
    * denominators:
    *
    *   D·10⁶ = ((n·Σx² − (Σx)²) · 10⁶) DIV ((n−1) · Σx)
    *
    * — exact DECIMAL(38,0) moments over NON-NEGATIVE counts (negative
    * rows drop visibly into `n_dropped`; they would make Σx's sign — and
    * the truncating quotient — engine-divergent). NULL when n < 2 or
    * Σx = 0 (no events: dispersion undefined, never a fake 0).
    *
    * Scale posture: ONE (group)-keyed map-side-combined aggregate.
    *
    * Output: `group`, `n`, `n_dropped`, `sum_x`, `sum_x2`,
    * `dispersion_ppm` LONG, `overdispersed` BOOLEAN-or-NULL — total
    * order by group (NULLS FIRST; a NULL group is a real slice).
    */
  def dispersionIndex(df: DataFrame, group: Column,
                      x: Column): DataFrame = {
    val base = df.select(group.cast("string").as("group"),
        x.cast("long").as("__x"))
      .filter(col("__x").isNotNull)
    base.groupBy(col("group"))
      .agg(
        coalesce(sum(when(col("__x") >= 0L, 1L).otherwise(0L)), lit(0L))
          .as("n"),
        coalesce(sum(when(col("__x") < 0L, 1L).otherwise(0L)), lit(0L))
          .as("n_dropped"),
        coalesce(sum(when(col("__x") >= 0L, col("__x")).otherwise(0L)),
          lit(0L)).as("sum_x"),
        coalesce(sum(when(col("__x") >= 0L,
            col("__x").cast("decimal(38,0)") * col("__x"))
          .otherwise(lit(0L).cast("decimal(38,0)"))),
          lit(0L).cast("decimal(38,0)")).as("__sx2"))
      .withColumn("dispersion_ppm",
        when(col("n") >= 2L && col("sum_x") > 0L, expr(
          """CAST(((CAST(n AS DECIMAL(38,0)) * __sx2
            |  - CAST(sum_x AS DECIMAL(38,0)) * sum_x) * 1000000)
            | DIV ((n - 1) * CAST(sum_x AS DECIMAL(38,0)))
            | AS BIGINT)""".stripMargin)))
      .withColumn("overdispersed",
        when(col("dispersion_ppm").isNotNull,
          col("dispersion_ppm") > 1000000L))
      .select(col("group"), col("n"), col("n_dropped"), col("sum_x"),
        col("__sx2").cast("long").as("sum_x2"), col("dispersion_ppm"),
        col("overdispersed"))
      .orderBy(col("group").asc_nulls_first)
  }

  /** Missingness-association matrix — are NULLs independent, or does
    * one column's absence predict another's? (MCAR vs the "fields from
    * the same upstream join leg die together" pattern that silently
    * biases any complete-case analysis.) For every column pair the phi
    * coefficient of the null indicators:
    *
    *   φ = (n·n₁₁ − n₁·n₂) / √(n₁(n−n₁)) · √(n₂(n−n₂))
    *
    * with n₁, n₂ the per-column null counts and n₁₁ the co-null count —
    * all exact integers from ONE aggregate over one scan (k(k+1)/2
    * indicator-product sums ride the same pass; no per-pair jobs), φ
    * one pinned √·√ sequence per pair, NULL when a column never or
    * always nulls (φ undefined, never a fake 0).
    *
    * Output (one row per unordered pair, i < j by name): `col_a`,
    * `col_b`, `n`, `null_a`, `null_b`, `null_both` LONG, `phi`
    * DOUBLE-or-NULL — total order (col_a, col_b).
    */
  def missingnessMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 40,
      s"need 2..40 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val sorted = cols.sorted
    val ind = df.select(sorted.map(c =>
      col(c).isNull.cast("long").as(s"__m_$c")): _*)
    val pairs = for {
      i <- sorted.indices; j <- (i + 1) until sorted.size
    } yield (sorted(i), sorted(j))
    val aggs = Seq(count(lit(1)).as("n")) ++
      sorted.map(c => coalesce(sum(col(s"__m_$c")), lit(0L))
        .as(s"__n_$c")) ++
      pairs.map { case (a, b) =>
        coalesce(sum(col(s"__m_$a") * col(s"__m_$b")), lit(0L))
          .as(s"__b_${a}__$b")
      }
    val one = ind.agg(aggs.head, aggs.tail: _*)
    // unpivot the single aggregate row via explode-of-structs — a
    // unionByName of per-pair selects would re-run the aggregate (and
    // its scan) once per pair
    val pairStructs = array(pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__n_$a").as("null_a"), col(s"__n_$b").as("null_b"),
        col(s"__b_${a}__$b").as("null_both"))
    }: _*)
    one.select(col("n"), explode(pairStructs).as("__p"))
      .select(col("__p.col_a").as("col_a"), col("__p.col_b").as("col_b"),
        col("n"), col("__p.null_a").as("null_a"),
        col("__p.null_b").as("null_b"),
        col("__p.null_both").as("null_both"))
      .withColumn("__num",
        col("n").cast("decimal(38,0)") * col("null_both") -
          col("null_a").cast("decimal(38,0)") * col("null_b"))
      .withColumn("__da",
        col("null_a").cast("decimal(38,0)") * (col("n") - col("null_a")))
      .withColumn("__db",
        col("null_b").cast("decimal(38,0)") * (col("n") - col("null_b")))
      .withColumn("phi",
        when(col("__da") > 0 && col("__db") > 0,
          col("__num").cast("double") /
            (sqrt(col("__da").cast("double")) *
              sqrt(col("__db").cast("double")))))
      .select(col("col_a"), col("col_b"), col("n"), col("null_a"),
        col("null_b"), col("null_both"), col("phi"))
      .orderBy(col("col_a"), col("col_b"))
  }

  /** Top-k stability under half-sampling — is the leaderboard REAL or
    * sampling noise? H independent seeded 50% row-subsets each rank
    * their own top-k; each half reports its overlap with the full-data
    * top-k. Overlap near k on every half = the ranking is supported by
    * the data volume; overlap swinging low = the tail of the list is
    * noise and downstream decisions should not read past the stable
    * prefix. (The jackknife/subsampling idea, applied to the one
    * artifact dashboards actually ship — the top-k list.)
    *
    * Determinism: membership of row r in half h is a seeded md5 bit —
    * layout-independent and engine-replayable; ranking ties break to
    * the lexically smallest key (total order). Exact integer sums.
    *
    * Scale posture: one ×H explode with a (h, key)-keyed map-side
    * combined aggregate; per-half ranking is a window over the
    * (h, keys)-sized totals frame, never rows; the full top-k set
    * (≤ k rows) broadcasts back. Cost = H× one aggregation pass.
    *
    * Output (one row per half — an empty seeded subset still emits its
    * row with `n_rows` = 0): `half`, `n_rows`, `overlap`,
    * `overlap_ppm` LONG — total order by half. The ppm denominator is
    * least(k, |full top|): on a corpus with fewer than k distinct keys
    * a perfectly stable ranking still reads 10⁶, never a fake deficit;
    * NULL when the corpus is empty (no full top to overlap with).
    */
  def topkStability(df: DataFrame, id: Column, key: Column,
                    value: Column, k: Int, halves: Int,
                    seed: String = "42"): DataFrame = {
    require(k >= 1 && halves >= 2 && halves <= 64,
      s"need k >= 1 and halves in 2..64, got k=$k halves=$halves")
    val base = df.select(id.cast("string").as("__id"),
        key.cast("string").as("__k"), value.cast("long").as("__v"))
      .filter(col("__id").isNotNull && col("__k").isNotNull &&
        col("__v").isNotNull)
    def topOf(totals: DataFrame, part: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(part: _*)
        .orderBy(col("__s").desc, col("__k").asc)
      totals.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= k)
    }
    val fullTop = topOf(
      base.groupBy(col("__k")).agg(sum(col("__v")).as("__s"))
        .withColumn("__all", pmod(hash(col("__k")), lit(1))), Seq(col("__all")))
      .select(col("__k").as("__fk"))
    val halved = base
      .select(col("__id"), col("__k"), col("__v"),
        explode(sequence(lit(0), lit(halves - 1))).as("half"))
      .filter(conv(substring(md5(concat_ws("|", lit(seed), col("half"),
        col("__id"))), 1, 15), 16, 10).cast("long") % 2L === 0L)
    val perHalf = halved.groupBy(col("half"), col("__k"))
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
    val halfTops = topOf(perHalf, Seq(col("half")))
    val rows = halved.groupBy(col("half"))
      .agg(count(lit(1)).as("n_rows"))
    val overlaps = halfTops
      .join(broadcast(fullTop), col("__k") === col("__fk"), "left_semi")
      .groupBy(col("half")).agg(count(lit(1)).as("overlap"))
    // the full top has ≤ k rows, so least(k, |fullTop|) is the honest
    // ppm denominator (a corpus with < k distinct keys would otherwise
    // cap a perfectly stable ranking below 10⁶); one broadcast row
    val kEff = fullTop.agg(count(lit(1)).as("__keff"))
    // anchor on the exploded 0..halves-1 frame, not on the per-half
    // rows: an empty seeded subset must still emit its row (n_rows 0)
    val allHalves = base.sparkSession.range(halves.toLong)
      .select(col("id").cast("int").as("half"))
    allHalves
      .join(rows, Seq("half"), "left")
      .join(overlaps, Seq("half"), "left")
      .crossJoin(broadcast(kEff))
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
      .withColumn("overlap", coalesce(col("overlap"), lit(0L)))
      .withColumn("overlap_ppm",
        when(col("__keff") > 0L, expr(
          s"(overlap * 1000000L) DIV least(${k}L, __keff)")))
      .select(col("half").cast("long").as("half"), col("n_rows"),
        col("overlap"), col("overlap_ppm"))
      .orderBy(col("half"))
  }

  /** Log-domain stats per group — geometric mean and log-variance of a
    * POSITIVE measure, the right central tendency for multiplicative
    * data (latencies, file sizes, token counts): the arithmetic mean of
    * a log-normal-ish column tracks its outliers, the geometric mean
    * tracks its typical value. Per row the term is one pinned
    * nano-quantized ln ([[graft.operators.Classify.logLoss]]'s
    * posture), so sums are order-free longs; the geometric mean is ONE
    * pinned exp of the integer mean. Non-positive values drop VISIBLY
    * (`n_nonpos` — ln is undefined there and a silent skip would bias
    * the mean up).
    *
    * Scale posture: ONE (group)-keyed map-side-combined aggregate.
    *
    * Output: `group`, `n`, `n_nonpos`, `sum_ln_nano`, `mean_ln_nano`
    * LONG, `geo_micro` LONG (geometric mean ·10⁶; NULL when n = 0) —
    * total order by group (NULLS FIRST).
    */
  def logStats(df: DataFrame, group: Column, x: Column): DataFrame = {
    val base = df.select(group.cast("string").as("group"),
        x.cast("long").as("__x"))
      .filter(col("__x").isNotNull)
      .withColumn("__ln",
        when(col("__x") > 0L,
          floor(log(col("__x").cast("double")) * 1000000000L + 0.5)
            .cast("long")))
    base.groupBy(col("group"))
      .agg(
        coalesce(sum(when(col("__ln").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n"),
        coalesce(sum(when(col("__ln").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_nonpos"),
        coalesce(sum(col("__ln")), lit(0L)).as("sum_ln_nano"))
      .withColumn("mean_ln_nano",
        when(col("n") > 0L, expr("sum_ln_nano DIV n")))
      .withColumn("geo_micro",
        when(col("n") > 0L,
          floor(exp(col("mean_ln_nano").cast("double") / 1.0e9)
            * 1000000L + 0.5).cast("long")))
      .select(col("group"), col("n"), col("n_nonpos"),
        col("sum_ln_nano"), col("mean_ln_nano"), col("geo_micro"))
      .orderBy(col("group").asc_nulls_first)
  }

  /** Hellinger distance between two samples' categorical distributions
    * — the bounded [0, 1] divergence that PSI can't give (PSI explodes
    * on empty bins) and KS can't give for unordered categories. With
    * cell counts a_v, b_v and totals N_a, N_b, the Bhattacharyya
    * coefficient is BC = Σ_v √(a_v·b_v)/√(N_a·N_b) and H² = 1 − BC.
    *
    * Exactness: each cell contributes floor(√(a_v·b_v)·10⁹ + 0.5) — a
    * pinned per-cell IEEE sqrt of an EXACT integer product, quantized
    * BEFORE the sum so the total is an order-free long ([[graft
    * .operators.Classify.logLoss]]'s posture); the final BC is one
    * pinned √·√ division quantized to ppm, and `h2_ppm` = 10⁶ − bc_ppm
    * is integer arithmetic from there. i64 bound: a_v·b_v ≤ ~8·10¹⁸
    * needs cell counts below ~3·10⁹ — quantize heavier-tailed data
    * coarser first.
    *
    * Scale posture: one (side, value) counts aggregate, a value-keyed
    * FULL OUTER join of the two value-sized frames (absent cells
    * contribute 0 — √(a·0) = 0 keeps them harmless but they still
    * matter through the totals), one rollup row.
    *
    * Output (one row): `n_a`, `n_b`, `n_values`, `bc_num_nano` LONG
    * (Σ per-cell quantized √ products), `bc_ppm`, `h2_ppm` LONG —
    * NULL bc/h2 when either side is empty.
    */
  def hellinger(a: DataFrame, b: DataFrame, valA: Column,
                valB: Column): DataFrame = {
    def counts(df: DataFrame, v: Column, cn: String): DataFrame =
      df.select(v.cast("string").as("__v"))
        .filter(col("__v").isNotNull)
        .groupBy(col("__v")).agg(count(lit(1)).as(cn))
    val ca = counts(a, valA, "__ca")
    val cb = counts(b, valB, "__cb")
    ca.join(cb, Seq("__v"), "full_outer")
      .select(coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .agg(
        coalesce(sum(col("__ca")), lit(0L)).as("n_a"),
        coalesce(sum(col("__cb")), lit(0L)).as("n_b"),
        count(lit(1)).as("n_values"),
        coalesce(sum(floor(sqrt((col("__ca") * col("__cb"))
            .cast("double")) * 1000000000L + 0.5).cast("long")),
          lit(0L)).as("bc_num_nano"))
      .withColumn("bc_ppm",
        when(col("n_a") > 0L && col("n_b") > 0L,
          floor(col("bc_num_nano").cast("double") /
            (sqrt(col("n_a").cast("double")) *
              sqrt(col("n_b").cast("double")) * 1000.0) + 0.5)
            .cast("long")))
      .withColumn("h2_ppm",
        when(col("bc_ppm").isNotNull,
          greatest(lit(0L), lit(1000000L) - col("bc_ppm"))))
      .select(col("n_a"), col("n_b"), col("n_values"),
        col("bc_num_nano"), col("bc_ppm"), col("h2_ppm"))
  }

  /** Kendall's τ-b per group — concordance-based rank association, the
    * third leg of the correlation triad (Pearson q111 reads magnitudes,
    * Spearman q260 reads ranks; τ reads PAIR ORDERINGS, so it is the one
    * with a direct probabilistic meaning: P(concordant) − P(discordant),
    * tie-adjusted). The robust choice when the series are short and
    * tie-heavy — exactly the per-key daily-rollup frames it is meant for.
    *
    * Every count is exact: pairs are enumerated on the (x, y) CELLS
    * frame (V distinct cells → V² cell pairs weighted by c₁·c₂ — rows
    * never pair), tie terms n₁ = Σ t(t−1)/2 come straight from the x/y
    * MARGINAL counts (no pair join at all), and
    *
    *   τ_b = (C − D) / (√(n₀−n₁) · √(n₀−n₂)),   n₀ = n(n−1)/2
    *
    * is ONE pinned IEEE sequence over BIGINT-published integers
    * ([[spearman]]'s posture), NULL when either axis is constant.
    *
    * Scale posture: the cell pair join is EQUI on the null-safe group
    * key (a NULL group is a real slice) with the lexicographic (x, y)
    * dedup as a post-join filter — SortMergeJoin, never NestedLoop; cost
    * is Σ V_g² per group, so feed SERIES-SIZED frames (daily/hourly
    * rollups — the [[TimeSeries.changepoint]] contract), not raw rows:
    * quantize first if V_g is unbounded.
    *
    * Output: `group`, `n`, `conc`, `disc`, `tie_x`, `tie_y` LONG,
    * `tau` DOUBLE-or-NULL — total order by group.
    */
  def kendallTau(df: DataFrame, group: Column, x: Column,
                 y: Column): DataFrame = {
    val base = df.select(group.cast("string").as("group"),
        x.cast("long").as("__x"), y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val cells = base.groupBy(col("group"), col("__x"), col("__y"))
      .agg(count(lit(1)).as("__c"))
    def tiePairs(v: String): DataFrame =
      base.groupBy(col("group"), col(v)).agg(count(lit(1)).as("__t"))
        .groupBy(col("group"))
        .agg(coalesce(sum(expr(
            "CAST(__t AS DECIMAL(38,0)) * (__t - 1) DIV 2")),
          lit(0).cast("decimal(38,0)")).as(s"__tie$v"))
    val a = cells.select(col("group").as("__ga"), col("__x").as("__xa"),
      col("__y").as("__ya"), col("__c").as("__ca"))
    val b = cells.select(col("group").as("__gb"), col("__x").as("__xb"),
      col("__y").as("__yb"), col("__c").as("__cb"))
    val pairs = a.join(b, col("__ga") <=> col("__gb") &&
        (col("__xa") < col("__xb") ||
          (col("__xa") === col("__xb") && col("__ya") < col("__yb"))))
      .withColumn("__w", col("__ca").cast("decimal(38,0)") * col("__cb"))
      // the lexicographic dedup guarantees __xa <= __xb, so a pair is
      // concordant iff both axes strictly rise, discordant iff x rises
      // while y falls — pure integer predicates, no float sign
      .groupBy(col("__ga").as("group"))
      .agg(
        coalesce(sum(when(col("__xa") < col("__xb") &&
            col("__ya") < col("__yb"), col("__w"))),
          lit(0).cast("decimal(38,0)")).as("__conc"),
        coalesce(sum(when(col("__xa") < col("__xb") &&
            col("__ya") > col("__yb"), col("__w"))),
          lit(0).cast("decimal(38,0)")).as("__disc"))
    val totals = base.groupBy(col("group")).agg(count(lit(1)).as("n"))
      .withColumn("__n0",
        expr("CAST(n AS DECIMAL(38,0)) * (n - 1) DIV 2"))
    totals
      .join(tiePairs("__x").withColumnRenamed("group", "__gx"),
        col("group") <=> col("__gx"), "left_outer")
      .join(tiePairs("__y").withColumnRenamed("group", "__gy"),
        col("group") <=> col("__gy"), "left_outer")
      .join(pairs.withColumnRenamed("group", "__gp"),
        col("group") <=> col("__gp"), "left_outer")
      .withColumn("__c", coalesce(col("__conc"),
        lit(0).cast("decimal(38,0)")))
      .withColumn("__d", coalesce(col("__disc"),
        lit(0).cast("decimal(38,0)")))
      .withColumn("__dx", col("__n0") - col("__tie__x"))
      .withColumn("__dy", col("__n0") - col("__tie__y"))
      .withColumn("tau",
        when(col("__dx") > 0 && col("__dy") > 0,
          (col("__c") - col("__d")).cast("double") /
            (sqrt(col("__dx").cast("double")) *
              sqrt(col("__dy").cast("double")))))
      .select(col("group"), col("n"),
        col("__c").cast("long").as("conc"),
        col("__d").cast("long").as("disc"),
        col("__tie__x").cast("long").as("tie_x"),
        col("__tie__y").cast("long").as("tie_y"), col("tau"))
      .orderBy(col("group").asc_nulls_first)
  }
}
