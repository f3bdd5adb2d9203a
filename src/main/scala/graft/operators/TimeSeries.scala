package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators: exponential smoothing and calendar gap
  * filling. Together with the rolling RANGE window (q44), as-of joins
  * (q19/q39), sessionization (q49), and cohort/funnel analytics
  * (q73/q74) these complete the engine's temporal tier.
  *
  * EWMA is a sequential recurrence — the one shape a window function
  * cannot express — so [[ewmaInt]] runs it as typed group iteration
  * (`flatMapGroups`): ONE hash shuffle on the series key, then an
  * in-memory pass per group. Per-group state is CALENDAR-BOUNDED (one
  * row per day), the same argument that bounds q73's per-user state —
  * a 100-year daily series is 36,525 rows, trivially in-memory, while
  * the number of series scales out across executors.
  *
  * Like [[Graph.pagerankMicro]], the recurrence uses integer
  * micro-units with floor division so the trajectory is bit-identical
  * on any layout and exactly replayable by the DuckDB oracle's
  * recursive CTE — float EWMA would drift per engine:
  *
  *   s_0 = x_0;  s_t = (alphaNum·x_t + (alphaDen−alphaNum)·s_{t−1}) floordiv alphaDen
  */
object TimeSeries {

  /** Integer EWMA per group over a daily series. Input columns: `group`
    * (cast to string — the series key), `day` (DATE), `valueInt`
    * (LONG — pre-scale floats to cents/micros upstream). Output:
    * (`g`, `day`, `v`, `ewma`), one row per input row. Duplicate
    * (group, day) rows are a caller-contract violation (the recurrence
    * would depend on their order); `dedupDays` guards it. */
  def ewmaInt(df: DataFrame, group: Column, day: Column, valueInt: Column,
              alphaNum: Long, alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaNum <= alphaDen, "alpha in (0,1]")
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val inEnc: Encoder[(String, java.sql.Date, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.DATE, Encoders.scalaLong)
    implicit val outEnc: Encoder[(String, java.sql.Date, Long, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.DATE, Encoders.scalaLong, Encoders.scalaLong)
    df.select(group.cast("string").as("g"), day.as("day"), valueInt.cast("long").as("v"))
      .as[(String, java.sql.Date, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val rows = it.toArray.sortBy(_._2.getTime)
        var s = 0L
        var first = true
        rows.iterator.map { case (_, d, v) =>
          s = if (first) { first = false; v }
          else Math.floorDiv(alphaNum * v + (alphaDen - alphaNum) * s, alphaDen)
          (g, d, v, s)
        }
      }
      .toDF("g", "day", "v", "ewma")
  }

  /** One row per (group, day), summing duplicates — the normalization
    * step in front of [[ewmaInt]]. */
  def dedupDays(df: DataFrame, group: Column, day: Column, valueInt: Column): DataFrame =
    df.select(group.cast("string").as("g"), day.as("day"), valueInt.cast("long").as("v"))
      .groupBy(col("g"), col("day")).agg(sum(col("v")).as("v"))

  /** Calendar gap filling with last-observation-carried-forward: build
    * each group's full daily spine (min..max day — no fabrication
    * outside the series' observed life), left-join the observations,
    * carry the last non-null value forward. Output: (`g`, `day`, `v`
    * nullable original, `v_filled`, `filled` flag).
    *
    * The spine is a generator (`explode(sequence(...))`) — no shuffle
    * beyond the per-group min/max aggregate and the join back, both
    * keyed on the series key. LOCF itself is one window pass. */
  def gapFillLocf(df: DataFrame, group: Column, day: Column, valueInt: Column): DataFrame = {
    val base = df.select(group.cast("string").as("g"), day.as("day"),
      valueInt.cast("long").as("v"))
    val spine = base.groupBy(col("g"))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col("g"),
        explode(expr("sequence(__d0, __d1, interval 1 day)")).as("day"))
    val w = Window.partitionBy(col("g")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(base, Seq("g", "day"), "left")
      .select(col("g"), col("day"), col("v"),
        last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
        col("v").isNull.as("filled"))
  }

  /** Exact rolling median of an INTEGER fixed-point series over the
    * trailing `window` rows — the robust smoother (outlier-immune where
    * EWMA is not). Quantizing first is what keeps the result engine-
    * portable: an exact median over integers is either an integer or a
    * midpoint x.5, both exactly representable, so linear interpolation
    * (Spark `percentile`) and (a+b)/2 (DuckDB `median`) produce the SAME
    * double — no such guarantee exists over raw float inputs.
    *
    * One shuffle on the series key; each group's frame is a bounded
    * in-partition sliding sort. `order` must be a total order within
    * the group (pass a unique tiebreaker) or frame contents — and thus
    * the median — depend on layout. */
  def rollingMedianInt(df: DataFrame, group: Column, order: Seq[Column],
                       valueInt: Column, window: Int = 5): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val w = Window.partitionBy(col("__g")).orderBy(order: _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    df.withColumn("__g", group)
      .withColumn("__v", valueInt.cast("long"))
      .withColumn("med", expr("percentile(__v, 0.5D)").over(w))
      .drop("__g", "__v")
  }

  /** Hampel anomaly filter, exact: flag points deviating from the
    * CENTERED rolling median by more than `k`× the rolling median
    * absolute deviation (MAD) — the robust outlier detector (a z-score
    * breaks down because outliers inflate the mean AND the stddev; the
    * median/MAD pair is immune up to 50% contamination).
    *
    * All quantities stay exact: the input is integer fixed-point, so
    * every median is an integer or exact midpoint; deviations are
    * DOUBLED into `dev2` (longs — absorbing the .5 without floats), and
    * `mad2` is a median of longs again. The flag compares
    * `dev2 > k·mad2` — one exact IEEE multiply — so anomaly decisions
    * are bit-deterministic on any engine/layout. Note the classic
    * Hampel caveat: a constant window has MAD 0, so ANY deviation in it
    * flags; pre-dedup constant runs if that is unwanted. (The 1.4826
    * Gaussian consistency constant is folded into the caller's `k` —
    * keeping it out of the operator keeps the arithmetic integer.)
    *
    * Appends `med`, `dev2`, `mad2`, `anomaly`. One shuffle on the
    * series key; two window passes sharing one in-partition sort.
    * `order` must totally order each group. */
  def hampel(df: DataFrame, group: Column, order: Seq[Column],
             valueInt: Column, half: Int = 3, k: Int = 3): DataFrame = {
    require(half >= 1 && k >= 1, s"need half >= 1, k >= 1; got half=$half k=$k")
    val w = Window.partitionBy(col("__g")).orderBy(order: _*)
      .rowsBetween(-half, half)
    df.withColumn("__g", group)
      .withColumn("__v", valueInt.cast("long"))
      .withColumn("med", expr("percentile(__v, 0.5D)").over(w))
      .withColumn("dev2", abs(col("__v") * 2 - (col("med") * 2).cast("long")))
      .withColumn("mad2", expr("percentile(dev2, 0.5D)").over(w))
      .withColumn("anomaly", col("dev2").cast("double") > lit(k.toDouble) * col("mad2"))
      .drop("__g", "__v")
  }

  /** EXACT trailing-window distinct count per time bucket ("distinct
    * users in the last 24 h, for every hour") — without the quadratic
    * expansion the naive formulation pays. A range join of every bucket
    * against its W-bucket history replicates each event W times
    * (100 TB · W shuffle volume), and windowed `count(DISTINCT)` isn't
    * supported at all; sliding HLL union is approximate. This is exact
    * and LINEAR, by the classic gap-delta decomposition:
    *
    * an entity counts toward bucket t iff it appeared in (t−W, t]. Per
    * entity, its appearance buckets b₁<b₂<… cover the t-intervals
    * [bᵢ, min(bᵢ+W, bᵢ₊₁)−1] — disjoint by construction, union exactly
    * the coverage set. Each interval becomes two delta rows (+1 at its
    * start, −1 past its end); summing deltas per bucket and prefix-
    * summing over the bucket spine yields the distinct count at every
    * bucket.
    *
    * Shape: one (entity, bucket) distinct aggregate (map-side
    * combined), one per-entity lead window (hash by entity — scales
    * out), one per-bucket delta aggregate, then a prefix sum over the
    * SPINE ONLY — #buckets rows (a decade of hours is 87,600 rows), a
    * single tiny sorted partition, never row-scaled. Output: one row
    * per bucket in [min, max] — empty buckets report the count carried
    * by their trailing window, not a gap.
    *
    * `bucket` must be an integral bucket index (e.g.
    * `unix_micros(ts) DIV 3600000000` for hours). Returns (`bucket`,
    * `n_active`). */
  def slidingDistinct(df: DataFrame, entity: Column, bucket: Column,
                      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1 bucket, got $window")
    val ub = df.select(entity.as("__e"), bucket.cast("long").as("__b")).distinct()
    val nxt = lead(col("__b"), 1).over(
      Window.partitionBy(col("__e")).orderBy(col("__b")))
    val iv = ub.select(col("__b").as("__start"),
      (least(col("__b") + window, coalesce(nxt, lit(Long.MaxValue))) - 1L)
        .as("__end"))
    val deltas = iv.select(explode(array(
        struct(col("__start").as("b"), lit(1L).as("d")),
        struct((col("__end") + 1L).as("b"), lit(-1L).as("d")))).as("x"))
      .select(col("x.b").as("__b"), col("x.d").as("__d"))
      .groupBy(col("__b")).agg(sum(col("__d")).as("__delta"))
    val bounds = ub.agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
    val spine = bounds
      .select(explode(sequence(col("__lo"), col("__hi"))).as("__b"))
    spine.join(deltas, Seq("__b"), "left")
      .withColumn("n_active",
        sum(coalesce(col("__delta"), lit(0L)))
          .over(BoundedWindow.ordered(col("__b"), col("__b"))))
      .select(col("__b").as("bucket"), col("n_active"))
  }

  /** Seasonal (hour-of-week) profile + residuals — the deseasonalizer in
    * front of anomaly detection: a metric that spikes every Monday 09:00
    * is CYCLE, not anomaly, and feeding raw values to Hampel/MAD/CUSUM
    * alarms on the weekly rhythm. The cycle index is computed from epoch
    * MICROseconds alone — `how = (epoch_µs DIV 3.6e9) % 168` (a 168-hour
    * cycle anchored at the epoch, a Thursday 00:00 UTC) — pure integer
    * arithmetic that every engine evaluates identically, where calendar
    * `dayofweek()` differs across engines in origin and numbering.
    *
    * Profile mean is the truncating integer mean of cent values per
    * (key, how) — 168·|keys| rows, map-side combined; residual = value −
    * profile via the join back (AQE broadcasts the profile when it
    * fits). Output: input keys + (`how`, `value_cents`, `profile_cents`,
    * `n_obs`, `residual_cents`). */
  def seasonalResiduals(df: DataFrame, key: Column, ts: Column,
                        valueCents: Column): DataFrame = {
    val based = df
      .withColumn("__k", key)
      .withColumn("__ts", ts)
      .withColumn("value_cents", valueCents.cast("long"))
      .withColumn("how", expr("(unix_micros(__ts) DIV 3600000000) % 168"))
    val profile = based.groupBy(col("__k"), col("how"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("value_cents").cast("decimal(38,0)")).as("__s"))
      .select(col("__k"), col("how"), col("n_obs"),
        expr("CAST(__s DIV n_obs AS BIGINT)").as("profile_cents"))
    based.join(profile, Seq("__k", "how"))
      .withColumn("residual_cents", col("value_cents") - col("profile_cents"))
      .drop("__k", "__ts")
  }

  /** CUSUM changepoint scores per key — the sequential drift detector
    * (Page 1954) in closed form: the textbook recurrences
    *
    *   S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − slack))
    *   S⁻_t = max(0, S⁻_{t−1} − (x_t − μ + slack))
    *
    * look iterative, but each equals a PREFIX SUM minus its RUNNING
    * extremum: with P_t = Σ_{j≤t}(x_j − μ − slack),
    * S⁺_t = P_t − min(0, min_{j≤t} P_j) — so the whole trajectory is
    * two stacked windows (cumsum, running min/max) over one key-hash
    * exchange, never a sequential group iteration. All arithmetic in
    * exact integer cents; μ is the key's own exact truncating mean
    * (two-pass: one aggregate + join back). `alarm` = either side
    * exceeding `threshold`.
    *
    * `order` must totally order each group (ties would make the cumsum
    * layout-dependent). Appends `value_cents`, `mu_cents`, `s_pos`,
    * `s_neg`, `alarm`; one key-hash exchange, windows share its sort. */
  def cusum(df: DataFrame, key: Column, order: Seq[Column],
            valueCents: Column,
            slackCents: Long, thresholdCents: Long): DataFrame = {
    require(slackCents >= 0 && thresholdCents > 0,
      "slack >= 0, threshold > 0")
    val based = df
      .withColumn("__k", key)
      .withColumn("value_cents", valueCents.cast("long"))
    val mu = based.groupBy(col("__k"))
      .agg(expr("CAST(sum(CAST(value_cents AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
        .as("mu_cents"))
    val cum = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    based.join(mu, "__k")
      .withColumn("__dp",
        col("value_cents") - col("mu_cents") - lit(slackCents))
      .withColumn("__dn",
        col("value_cents") - col("mu_cents") + lit(slackCents))
      .withColumn("__pp", sum(col("__dp")).over(cum))
      .withColumn("__pn", sum(col("__dn")).over(cum))
      .withColumn("s_pos",
        col("__pp") - least(lit(0L), min(col("__pp")).over(cum)))
      .withColumn("s_neg",
        greatest(lit(0L), max(col("__pn")).over(cum)) - col("__pn"))
      .withColumn("alarm",
        col("s_pos") > thresholdCents || col("s_neg") > thresholdCents)
      .drop("__k", "__dp", "__dn", "__pp", "__pn")
  }

  /** Exact lag-k autocorrelation per series — the seasonality/memory
    * diagnostic that decides window sizes for the deseasonalizer and
    * CUSUM upstream: acf(k) = Σ(xₜ−µ)(xₜ₊ₖ−µ) / Σ(xₜ−µ)² over each
    * key's (order)-sorted sequence.
    *
    * Exactness: µ is the truncating integer mean (DECIMAL DIV count —
    * engine-replayable), both moment sums accumulate integer products
    * in DECIMAL(38,0) (order-free — no float summation), and `acf` is
    * ONE IEEE division of the two exact integers (integer→double
    * conversion is correctly rounded and unique, so bits match on any
    * engine at any magnitude).
    *
    * Scale posture: one key exchange; ALL lags share the single
    * in-partition sort (one window spec, k lead() exprs); the moment
    * aggregate ships one partial row per (key, lag). Driver holds
    * nothing.
    *
    * Output: `key`, `lag` INT, `n_pairs` LONG, `mu_cents` LONG,
    * `num` / `den` exact integer moments (BIGINT — the audit surface),
    * `acf` DOUBLE. Total order (key, lag).
    */
  def autocorr(df: DataFrame, key: Column, order: Seq[Column],
               valueCents: Column, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), "lags must be >= 1")
    val based = df
      .withColumn("__k", key.cast("string"))
      .withColumn("__v", valueCents.cast("long"))
    val mu = based.groupBy(col("__k"))
      .agg(expr("CAST(sum(CAST(__v AS DECIMAL(38,0))) DIV count(1) AS BIGINT)")
        .as("mu_cents"))
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
    val withLeads = lags.foldLeft(based.join(mu, "__k")
        .withColumn("__dx", col("__v") - col("mu_cents"))) {
      (acc, k) => acc.withColumn(s"__lead_$k", lead(col("__dx"), k).over(w))
    }
    val perLag = lags.map { k =>
      withLeads
        .groupBy(col("__k"), col("mu_cents"))
        .agg(
          count(col(s"__lead_$k")).as("n_pairs"),
          expr(s"CAST(sum(CASE WHEN __lead_$k IS NOT NULL THEN CAST(__dx AS DECIMAL(38,0)) * __lead_$k END) AS BIGINT)")
            .as("num"),
          expr("CAST(sum(CAST(__dx AS DECIMAL(38,0)) * __dx) AS BIGINT)").as("den"))
        .select(col("__k").as("key"), lit(k).as("lag"), col("n_pairs"),
          col("mu_cents"), coalesce(col("num"), lit(0L)).as("num"), col("den"))
    }
    perLag.reduce(_ unionByName _)
      .withColumn("acf",
        when(col("den") > 0,
          col("num").cast("double") / col("den").cast("double")))
      .orderBy("key", "lag")
  }

  /** Time-in-state: total and mean dwell time attributed to each state —
    * each event holds its state until the entity's NEXT event; the
    * entity's last event is open-ended and reported separately (never
    * silently attributed). The ops-dashboard "where does the journey
    * spend its time" readout, and [[graft.operators.Analytics
    * .transitionMatrix]]'s duration-weighted sibling.
    *
    * One lead() window over the entity exchange, then a state-keyed
    * aggregate (map-side combined) — all integer µs, truncating mean.
    * Output: `state`, `n_intervals` LONG, `total_us` LONG, `mean_us`
    * LONG (NULL when no closed intervals), `n_open` LONG (last-event
    * occurrences of this state), total order by state.
    */
  def timeInState(events: DataFrame, entity: Column, tsUs: Column,
                  tieBreak: Column, state: Column): DataFrame = {
    val w = Window.partitionBy(col("__e")).orderBy(col("__t"), col("__tb"))
    events
      .select(entity.as("__e"), tsUs.cast("long").as("__t"),
        tieBreak.as("__tb"), state.cast("string").as("state"))
      .filter(col("__t").isNotNull && col("state").isNotNull)
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .withColumn("__dur", col("__next") - col("__t"))
      .groupBy(col("state"))
      .agg(
        count(col("__dur")).as("n_intervals"),
        coalesce(sum(col("__dur")), lit(0L)).as("total_us"),
        expr("CAST(CASE WHEN count(__dur) > 0 THEN " +
          "sum(CAST(__dur AS DECIMAL(38,0))) DIV count(__dur) END AS BIGINT)")
          .as("mean_us"),
        coalesce(sum(when(col("__next").isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_open"))
      .orderBy("state")
  }

  /** Inter-event cadence per key: gap statistics between consecutive
    * events — the SLA/heartbeat audit ("is this feed still hourly",
    * "which sensor went quiet") and the input sizing for
    * [[mergeIntervals]]' tolerance and [[seasonalResiduals]]' window.
    *
    * All integer µs: gaps from one lag() over the key exchange, min/max
    * exact, mean as truncating DIV — bit-identical on any engine or
    * layout. Keys with one event report zero gaps and NULL stats (no
    * fake zeros).
    *
    * Output: `key`, `n_events` LONG, `n_gaps` LONG, `span_us` LONG
    * (last − first), `min_gap_us`/`max_gap_us`/`mean_gap_us`
    * LONG-or-NULL, total order by key.
    */
  def interEventGaps(df: DataFrame, key: Column, tsUs: Column,
                     tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__tb"))
    df.select(key.cast("string").as("__k"), tsUs.cast("long").as("__t"),
        tieBreak.as("__tb"))
      .filter(col("__k").isNotNull && col("__t").isNotNull)
      .withColumn("__gap", col("__t") - lag(col("__t"), 1).over(w))
      .groupBy(col("__k").as("key"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("__gap")).as("n_gaps"),
        (max(col("__t")) - min(col("__t"))).as("span_us"),
        min(col("__gap")).as("min_gap_us"),
        max(col("__gap")).as("max_gap_us"),
        expr("CAST(CASE WHEN count(__gap) > 0 THEN " +
          "sum(CAST(__gap AS DECIMAL(38,0))) DIV count(__gap) END AS BIGINT)")
          .as("mean_gap_us"))
      .orderBy("key")
  }

  /** Gaps-and-islands interval coalescing per key: intervals that
    * overlap or touch (gap ≤ `tolUs`) merge into islands — uptime/
    * downtime stitching, session unification across devices, coverage
    * audits ("how much of the day is instrumented"). The dual of
    * [[graft.streaming.Sessionize]]: same semantics, batch closed form.
    *
    * Closed form (no sequential group iteration): an interval starts a
    * new island iff its start exceeds the running max end of all
    * earlier intervals (ordered by (start, end)) plus tolerance; the
    * island id is the running count of such starts. Two stacked windows
    * over ONE key exchange — the CUSUM discipline.
    *
    * Determinism: flags depend on the running-max prefix, which is
    * identical under any permutation of tied (start, end) rows, so the
    * output is layout-independent. Null-bounded or end < start
    * intervals are dropped (malformed — never silently clamped).
    *
    * Output: `key`, `island` LONG (1-based, in time order), `start_us`,
    * `end_us`, `n_intervals` LONG, `covered_us` LONG. Total order
    * (key, island).
    */
  def mergeIntervals(df: DataFrame, key: Column, startUs: Column,
                     endUs: Column, tolUs: Long = 0L): DataFrame = {
    require(tolUs >= 0L, "tolUs must be >= 0")
    val base = df.select(key.cast("string").as("__k"),
        startUs.cast("long").as("__s"), endUs.cast("long").as("__e"))
      .filter(col("__s").isNotNull && col("__e").isNotNull &&
        col("__e") >= col("__s"))
    val prior = Window.partitionBy(col("__k")).orderBy(col("__s"), col("__e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy(col("__k")).orderBy(col("__s"), col("__e"))
      .rowsBetween(Window.unboundedPreceding, 0)
    base
      .withColumn("__pmax", max(col("__e")).over(prior))
      .withColumn("__new",
        when(col("__pmax").isNull || col("__s") > col("__pmax") + tolUs, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("__new")).over(upTo))
      .groupBy(col("__k").as("key"), col("island"))
      .agg(min(col("__s")).as("start_us"), max(col("__e")).as("end_us"),
        count(lit(1)).as("n_intervals"))
      .withColumn("covered_us", col("end_us") - col("start_us"))
      .orderBy("key", "island")
  }

  /** Exact single-changepoint scan per series (the first step of binary
    * segmentation / offline CUSUM's structural sibling): over each key's
    * (order)-sorted integer sequence, find the split s that minimizes
    * the two-segment squared-error cost
    *
    *   cost(s) = SSE(x₁..xₛ) + SSE(xₛ₊₁..xₙ),  SSE = Σx² − (Σx)²/n
    *
    * and report it against the no-split cost (the gain is the variance
    * explained by the best level shift — the telemetry "did this series
    * change regime, and where" readout that pairs with [[cusum]]'s
    * online alarms).
    *
    * Exactness: all moments are integer prefix sums (DECIMAL(38,0) for
    * the squares — order-free, no float summation); the /n terms become
    * truncating integer DIV, so every engine replays the identical cost
    * and picks the identical argmin (ties → smallest index). Costs are
    * in cents² units; each DIV truncation only SHRINKS the subtracted
    * term (never understates a cost) and is off by < 1 unit against
    * values of order n·x² — deterministically, on both engines.
    * i64 headroom: (Σx)² DIV n ≤ n·x̄² must fit 2⁶³ — with cent values
    * ≤ 10⁶ that allows ~10⁶ points per series, and larger series should
    * pre-aggregate to coarser buckets first (the right move for a
    * changepoint scan anyway).
    *
    * Scale posture: ONE key exchange; the row_number and both prefix
    * sums share its sort; totals come from a key aggregate joined back
    * (broadcast-sized: one row per key); the argmin is a single
    * min(struct) hash aggregate — no per-split re-scan, no driver
    * state. Candidate splits honor `minSeg` on both sides; series
    * shorter than 2·minSeg yield no row (no split exists — never a
    * fabricated zero).
    *
    * Output: `key`, `n_points` LONG, `cp_index` LONG (1-based: the
    * LAST index of the left segment), `cost_null_sq`, `cost_split_sq`,
    * `gain_sq` LONG (cents²), `mean_before_cents`, `mean_after_cents`
    * LONG (truncating). Total order by key. */
  def changepoint(df: DataFrame, key: Column, order: Seq[Column],
                  valueCents: Column, minSeg: Int = 1): DataFrame = {
    require(minSeg >= 1, "minSeg must be >= 1")
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val based = df
      .withColumn("__k", key.cast("string"))
      .withColumn("__v", valueCents.cast("long"))
      .filter(col("__k").isNotNull && col("__v").isNotNull)
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__sp", sum(expr("CAST(__v AS DECIMAL(38,0))")).over(cum))
      .withColumn("__qp", sum(expr("CAST(__v AS DECIMAL(38,0)) * __v")).over(cum))
    val totalsExact = based.groupBy(col("__k")).agg(
      count(lit(1)).as("__n"),
      sum(expr("CAST(__v AS DECIMAL(38,0))")).as("__s"),
      sum(expr("CAST(__v AS DECIMAL(38,0)) * __v")).as("__q"))
    val cand = based.join(totalsExact, "__k")
      .filter(col("__rn") >= minSeg && col("__rn") <= col("__n") - minSeg)
      .withColumn("__cost", expr(
        """CAST((__qp - (__sp * __sp) div __rn)
          |  + ((__q - __qp)
          |     - ((__s - __sp) * (__s - __sp)) div (__n - __rn))
          |  AS BIGINT)""".stripMargin))
    cand.groupBy(col("__k"), col("__n"), col("__s"), col("__q"))
      .agg(min(struct(col("__cost"), col("__rn"), col("__sp"))).as("__b"))
      .select(
        col("__k").as("key"),
        col("__n").as("n_points"),
        col("__b.__rn").as("cp_index"),
        expr("CAST(__q - (__s * __s) div __n AS BIGINT)").as("cost_null_sq"),
        col("__b.__cost").as("cost_split_sq"),
        expr("CAST(__b.__sp DIV __b.__rn AS BIGINT)").as("mean_before_cents"),
        expr("CAST((__s - __b.__sp) DIV (__n - __b.__rn) AS BIGINT)")
          .as("mean_after_cents"))
      .withColumn("gain_sq", col("cost_null_sq") - col("cost_split_sq"))
      .orderBy("key")
  }

  /** Windowed Theil–Sen trend — the ROBUST slope [[Analytics.trend]]'s
    * OLS can't give: the median of pairwise slopes shrugs off the
    * outliers that drag a least-squares fit (one corrupt day of
    * metrics bends OLS, not the slope median). The classic estimator
    * is all-pairs O(n²); this is the standard windowed variant —
    * pairs restricted to 0 < Δt ≤ maxLag — which keeps O(n·density)
    * pairs, preserves the breakdown robustness for trend lengths ≫
    * maxLag, and is the form a 100 TB metrics store can actually run.
    *
    * Determinism: each pair's slope is the EXACT truncating integer
    * (10⁶·Δv) DIV Δt (both engines truncate toward zero, verified);
    * the median is the ⌈(n+1)/2⌉-th smallest over the (group, slope)
    * COUNTS frame — the winsorize order-statistic discipline, rows
    * never sort, tie-safe by construction.
    *
    * Shape: the banded self-join runs as a TWO-BUCKET equi-join (left
    * rows explode into time buckets b and b+1 of width maxLag; the
    * band predicate rides the join) — linear in pairs, never a
    * cartesian or a NestedLoop; then one (group, slope) aggregate +
    * cumulative over that counts frame. NULL group is a real slice.
    * Output: `group` STRING, `n_pairs` LONG, `slope_median_upm` LONG
    * (NULL when no pairs); total order by group NULLS FIRST. */
  def theilSenWindowed(df: DataFrame, group: Column, t: Column,
                       v: Column, maxLag: Long): DataFrame = {
    require(maxLag >= 1L, s"maxLag must be >= 1, got $maxLag")
    val base = df.select(group.cast("string").as("__g"),
        t.cast("long").as("__t"), v.cast("long").as("__v"))
      .filter(col("__t").isNotNull && col("__v").isNotNull)
    val lx = base
      .withColumn("__jb",
        explode(array(expr(s"__t DIV ${maxLag}L"),
          expr(s"__t DIV ${maxLag}L + 1L"))))
    val right = base.select(col("__g").as("__g2"),
        col("__t").as("__t2"), col("__v").as("__v2"))
      .withColumn("__b2", expr(s"__t2 DIV ${maxLag}L"))
    val pairs = lx.join(right,
        col("__g") <=> col("__g2") && col("__jb") === col("__b2") &&
          col("__t2") > col("__t") &&
          col("__t2") <= col("__t") + maxLag)
      .select(col("__g"),
        expr("(1000000L * (__v2 - __v)) DIV (__t2 - __t)").as("__s"))
    val counts = pairs.groupBy(col("__g"), col("__s"))
      .agg(count(lit(1)).as("__c"))
    val wv = Window.partitionBy(col("__g")).orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("__g"))
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(wv))
      .withColumn("__n", sum(col("__c")).over(whole))
      .withColumn("__rank", expr("(__n + 1L) DIV 2L"))
    val med = cum.groupBy(col("__g").as("__gm"), col("__n"))
      .agg(min(when(col("__cum") >= col("__rank"), col("__s")))
        .as("slope_median_upm"))
    // groups whose every row is alone in its window still report;
    // null-safe join keeps the NULL slice real
    base.select(col("__g")).distinct()
      .join(med, col("__g") <=> col("__gm"), "left_outer")
      .select(col("__g").as("group"),
        coalesce(col("__n"), lit(0L)).as("n_pairs"),
        col("slope_median_upm"))
      .orderBy(col("group").asc)
  }

  /** MASE — Mean Absolute Scaled Error (Hyndman–Koehler 2006): a
    * forecast's MAE scaled by the naive lag-1 forecast's MAE on the
    * SAME points, so "mase_ppm < 10⁶" literally reads "beats naive" —
    * the unit-free backtest readout that makes per-series error
    * comparable across series of wildly different scales.
    *
    * Scored points are those with a predecessor (t ≥ 2 in the `order`
    * total order); for each, e_model = |y − ŷ| and e_naive = |y −
    * y_prev| — exact LONG sums, then ONE positive truncating quotient:
    *
    *   mase_ppm = (Σ e_model · 10⁶) DIV Σ e_naive
    *
    * NULL when the naive baseline is perfect (Σ e_naive = 0 — a
    * constant series scales nothing; never ±∞). Rows with NULL
    * actual/pred drop; `order` must totally order each series (the
    * transitionMatrix contract).
    *
    * Scale posture: ONE series-keyed exchange carries the lag window
    * and the aggregate; output is series-sized.
    *
    * Output: `key`, `n_scored`, `sum_model_err`, `sum_naive_err` LONG,
    * `mase_ppm` LONG-or-NULL — total order by key.
    */
  def mase(df: DataFrame, key: Column, order: Seq[Column], actual: Column,
           predicted: Column): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
    df.withColumn("__k", key.cast("string"))
      .withColumn("__y", actual.cast("long"))
      .withColumn("__p", predicted.cast("long"))
      .filter(col("__y").isNotNull && col("__p").isNotNull)
      .withColumn("__prev", lag(col("__y"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__k").as("key"))
      .agg(count(lit(1)).as("n_scored"),
        coalesce(sum(abs(col("__y") - col("__p"))), lit(0L))
          .as("sum_model_err"),
        coalesce(sum(abs(col("__y") - col("__prev"))), lit(0L))
          .as("sum_naive_err"))
      .withColumn("mase_ppm",
        when(col("sum_naive_err") > 0L,
          expr("(sum_model_err * 1000000L) DIV sum_naive_err")))
      .orderBy(col("key").asc)
  }

  /** Decomposition strength (Hyndman & Athanasopoulos, FPP) — ONE pair
    * of numbers per series answering "is this KPI trend-driven,
    * seasonality-driven, or noise": with a centered moving-average
    * trend T, phase-mean seasonality S and remainder R = x − T − S,
    *
    *   F_trend    = max(0, 1 − Var(R)/Var(x − S))
    *   F_seasonal = max(0, 1 − Var(R)/Var(x − T))
    *
    * Exactness: x is required NON-NEGATIVE (count/latency series — the
    * practical case; negatives drop visibly), so the trend mean is a
    * positive truncating micro-quotient; the seasonal mean of the
    * SIGNED detrended series is computed through a +10¹⁶ shift (a
    * positive-numerator DIV is floor division of the signed value —
    * deterministic on both engines — and the shift cancels exactly
    * when subtracted back). Variance RATIOS clear their /n
    * denominators: both numerators are n·Σv² − (Σv)² at the same n,
    * so each strength is one truncating quotient of exact
    * DECIMAL(38,0) integers — no variance is ever divided by n.
    * i64/decimal bound: micro values ~x·10⁶; n²·(x·10⁶)² must fit
    * 10³⁸ — fine to n ≈ 10⁷ buckets at x ≤ 10⁶ (bucket first, the
    * [[changepoint]] contract).
    *
    * Scale posture: ONE (group)-keyed exchange carries the trend
    * range-window and the phase join-back; seasonal means come from a
    * (group, phase)-sized aggregate; final moments are one map-side
    * combined aggregate. NULL strengths when a variance is 0 (constant
    * series — nothing to attribute).
    *
    * Output: `group`, `n`, `n_dropped`, `f_trend_ppm`,
    * `f_seasonal_ppm` LONG — total order by group (NULLS FIRST).
    */
  def decompositionStrength(df: DataFrame, group: Column, t: Column,
                            x: Column, period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val half = (period / 2).toLong
    val BIG = 10000000000000000L // 1e16: > any |x·1e6 − trend|
    val all = df.select(group.cast("string").as("group"),
        t.cast("long").as("__t"), x.cast("long").as("__x"))
      .filter(col("__t").isNotNull && col("__x").isNotNull)
    val base = all.filter(col("__x") >= 0L)
    val dropped = all.groupBy(col("group"))
      .agg(coalesce(sum(when(col("__x") < 0L, 1L).otherwise(0L)),
        lit(0L)).as("n_dropped"))
    val trended = base
      .withColumn("__tr",
        expr(s"(sum(__x) OVER (PARTITION BY group ORDER BY __t " +
          s"RANGE BETWEEN $half PRECEDING AND $half FOLLOWING) " +
          s"* 1000000L) DIV count(1) OVER (PARTITION BY group " +
          s"ORDER BY __t RANGE BETWEEN $half PRECEDING AND " +
          s"$half FOLLOWING)"))
      .withColumn("__d", col("__x") * 1000000L - col("__tr"))
      .withColumn("__phase", pmod(col("__t"), lit(period.toLong)))
    val seasonal = trended.groupBy(col("group"), col("__phase"))
      .agg(expr(s"CAST(sum(CAST(__d + ${BIG}L AS DECIMAL(38,0)))" +
        s" DIV count(1) - ${BIG}L AS BIGINT)").as("__seas"))
    // null-safe on group: a NULL group is a real slice (the
    // conformalThreshold lesson — a plain equi-join would drop it)
    val full = trended
      .join(seasonal.withColumnRenamed("group", "__gs")
          .withColumnRenamed("__phase", "__ps"),
        col("group") <=> col("__gs") && col("__phase") === col("__ps"))
      .withColumn("__r", col("__d") - col("__seas"))
      .withColumn("__detr", col("__d")) // x·1e6 − T
      .withColumn("__deseas", col("__x") * 1000000L - col("__seas"))
    def varNum(c: String): Column =
      count(lit(1)).cast("decimal(38,0)") *
        sum(col(c).cast("decimal(38,0)") * col(c)) -
        sum(col(c).cast("decimal(38,0)")) * sum(col(c).cast("decimal(38,0)"))
    val agg = full.groupBy(col("group"))
      .agg(count(lit(1)).as("n"),
        varNum("__r").as("__vr"),
        varNum("__deseas").as("__vds"),
        varNum("__detr").as("__vdt"))
    def strength(den: String): Column =
      when(col(den) > 0,
        greatest(lit(0L), lit(1000000L) -
          expr(s"CAST((__vr * 1000000) DIV $den AS BIGINT)")))
    agg
      .join(dropped.withColumnRenamed("group", "__gd"),
        col("group") <=> col("__gd"), "left_outer")
      .withColumn("f_trend_ppm", strength("__vds"))
      .withColumn("f_seasonal_ppm", strength("__vdt"))
      .select(col("group"), col("n"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        col("f_trend_ppm"), col("f_seasonal_ppm"))
      .orderBy(col("group").asc_nulls_first)
  }

  /** Mann–Kendall trend test per series — the nonparametric "is this
    * KPI actually trending" verdict that pairs with [[theilSen]]'s
    * robust slope (MK decides SIGNIFICANCE, Sen says how steep): S =
    * Σ_{i<j} sign(x_j − x_i) over the time order, with the tie-adjusted
    * variance
    *
    *   Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18
    *
    * and z = (S ∓ 1)/√Var(S) (continuity-corrected toward 0). Monotone
    * trends of ANY shape trigger it; outliers can't dominate (each pair
    * contributes ±1).
    *
    * Exactness: S and every tie term are exact integers off the
    * [[graft.operators.Profile.kendallTau]] cells discipline — pairs
    * enumerate on the (t, x) CELLS frame (series-sized by the caller's
    * bucketing contract), the time axis is tie-free by construction
    * (bucketed), so S = conc − disc with pure integer predicates; z is
    * ONE pinned IEEE sequence over BIGINT-published integers, NULL when
    * n < 2 or Var = 0 (all values tied).
    *
    * Scale posture: one (group, t, x) cells aggregate, the pair join
    * EQUI on the null-safe group key (SortMergeJoin — never
    * NestedLoop), tie terms from the value marginals with no join.
    *
    * Output: `group`, `n`, `s_stat`, `var18` (= 18·Var(S), exact),
    * LONG, `z` DOUBLE-or-NULL — total order by group (NULLS FIRST).
    */
  def mannKendall(df: DataFrame, group: Column, t: Column,
                  x: Column): DataFrame = {
    val base = df.select(group.cast("string").as("group"),
        t.cast("long").as("__t"), x.cast("long").as("__x"))
      .filter(col("__t").isNotNull && col("__x").isNotNull)
    val cells = base.groupBy(col("group"), col("__t"), col("__x"))
      .agg(count(lit(1)).as("__c"))
    val a = cells.select(col("group").as("__ga"), col("__t").as("__ta"),
      col("__x").as("__xa"), col("__c").as("__ca"))
    val b = cells.select(col("group").as("__gb"), col("__t").as("__tb"),
      col("__x").as("__xb"), col("__c").as("__cb"))
    val pairs = a.join(b, col("__ga") <=> col("__gb") &&
        (col("__ta") < col("__tb") ||
          (col("__ta") === col("__tb") && col("__xa") < col("__xb"))))
      .withColumn("__w", col("__ca").cast("decimal(38,0)") * col("__cb"))
      .groupBy(col("__ga").as("group"))
      .agg(
        coalesce(sum(when(col("__ta") < col("__tb") &&
            col("__xa") < col("__xb"), col("__w"))),
          lit(0).cast("decimal(38,0)")).as("__up"),
        coalesce(sum(when(col("__ta") < col("__tb") &&
            col("__xa") > col("__xb"), col("__w"))),
          lit(0).cast("decimal(38,0)")).as("__dn"))
    val ties = base.groupBy(col("group"), col("__x"))
      .agg(count(lit(1)).as("__tc"))
      .groupBy(col("group"))
      .agg(coalesce(sum(col("__tc").cast("decimal(38,0)") *
          (col("__tc") - 1L) * (col("__tc") * 2L + 5L)),
        lit(0).cast("decimal(38,0)")).as("__tieterm"))
    val totals = base.groupBy(col("group")).agg(count(lit(1)).as("n"))
    totals
      .join(ties.withColumnRenamed("group", "__gt"),
        col("group") <=> col("__gt"), "left_outer")
      .join(pairs.withColumnRenamed("group", "__gp"),
        col("group") <=> col("__gp"), "left_outer")
      .withColumn("__s", coalesce(col("__up"),
        lit(0).cast("decimal(38,0)")) -
        coalesce(col("__dn"), lit(0).cast("decimal(38,0)")))
      .withColumn("__v18",
        col("n").cast("decimal(38,0)") * (col("n") - 1L) *
          (col("n") * 2L + 5L) - col("__tieterm"))
      .withColumn("z",
        when(col("n") >= 2L && col("__v18") > 0,
          when(col("__s") > 0, (col("__s") - 1L).cast("double"))
            .when(col("__s") < 0, (col("__s") + 1L).cast("double"))
            .otherwise(lit(0.0)) /
            sqrt(col("__v18").cast("double") / 18.0)))
      .select(col("group"), col("n"), col("__s").cast("long").as("s_stat"),
        col("__v18").cast("long").as("var18"), col("z"))
      .orderBy(col("group").asc_nulls_first)
  }

  /** Cross-correlation lag scan — Pearson r between series x and the
    * ℓ-shifted series y for every lag ℓ ∈ [−maxLag, maxLag], plus the
    * argmax-|r| pick: "purchases trail views by how many hours?" — the
    * lead/lag discovery step in front of any causal-ish dashboard claim
    * (a lag-0 correlation readout silently misses shifted coupling).
    *
    * Input is one PRE-AGGREGATED point per (t, x, y) time bucket (the
    * [[changepoint]] contract — buckets, not raw rows); pairing is by
    * exact bucket equality, so missing buckets shrink n_ℓ rather than
    * fabricating pairs. Moments per lag are exact DECIMAL(38,0); r is
    * ONE pinned IEEE sequence num/(√·√) ([[graft.operators.Profile]]'s
    * spearman posture), NULL when n < 2 or an axis is constant at that
    * lag. `is_best` marks min(−|r|, ℓ) over non-NULL lags — ties break
    * to the most-negative lag, a total order both engines replay.
    *
    * Scale posture: a ×(2·maxLag+1) explode of the buckets frame and
    * ONE self equi-join on the shifted bucket key; per-lag moments are
    * a (lag)-keyed map-side-combined aggregate, and the argmax window
    * runs over the (2·maxLag+1)-row result — never rows.
    *
    * Output: `lag`, `n`, `num`, `den_x`, `den_y` LONG, `r`
    * DOUBLE-or-NULL, `is_best` BOOLEAN — total order by lag.
    */
  def crossCorrelation(df: DataFrame, t: Column, x: Column, y: Column,
                       maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val base = df.select(t.cast("long").as("__t"),
        x.cast("long").as("__x"), y.cast("long").as("__y"))
      .filter(col("__t").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
    val fan = base.select(col("__t"), col("__x"),
        explode(sequence(lit(-maxLag.toLong), lit(maxLag.toLong)))
          .as("lag"))
      .withColumn("__ty", col("__t") + col("lag"))
    val ys = base.select(col("__t").as("__ty"), col("__y"))
    val perLag = fan.join(ys, "__ty")
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(38,0)")).as("__sx"),
        sum(col("__y").cast("decimal(38,0)")).as("__sy"),
        sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__sxx"),
        sum(col("__y").cast("decimal(38,0)") * col("__y")).as("__syy"),
        sum(col("__x").cast("decimal(38,0)") * col("__y")).as("__sxy"))
      .withColumn("__num",
        col("n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__dx",
        col("n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__dy",
        col("n") * col("__syy") - col("__sy") * col("__sy"))
      .withColumn("r",
        when(col("n") >= 2L && col("__dx") > 0 && col("__dy") > 0,
          col("__num").cast("double") /
            (sqrt(col("__dx").cast("double")) *
              sqrt(col("__dy").cast("double")))))
    val wall = BoundedWindow.all(col("lag"))
    perLag
      .withColumn("__key", when(col("r").isNotNull,
        struct((-abs(col("r"))).as("na"), col("lag"))))
      .withColumn("__best", min(col("__key")).over(wall))
      .withColumn("is_best",
        col("__key").isNotNull && col("__key") === col("__best"))
      .select(col("lag"), col("n"), col("__num").cast("long").as("num"),
        col("__dx").cast("long").as("den_x"),
        col("__dy").cast("long").as("den_y"), col("r"), col("is_best"))
      .orderBy(col("lag"))
  }
}
