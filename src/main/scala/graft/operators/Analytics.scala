package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event stream: weekly cohort
  * retention and ordered conversion funnels. The reference's dashboard
  * tier (Looker over Postgres) answers exactly this shape of question;
  * here they are first-class distributed operators.
  *
  * Scale posture (100 TB of events):
  *  - [[retention]] is ONE hash shuffle on `user` (per-user state is the
  *    set of distinct active weeks — bounded by the calendar, not the
  *    event volume, so `collect_set` state is O(weeks), ~52/user/year)
  *    followed by a second, tiny shuffle on (cohort_week, offset) whose
  *    cardinality is weeks². The raw event volume is reduced map-side
  *    by the partial `collect_set` before anything moves.
  *  - [[funnel]] is a cascade of conditional min-aggregations, all
  *    keyed on `user`: every join and groupBy shuffles on the SAME key,
  *    so the planner inserts one exchange per stage over the
  *    stage-filtered (i.e. heavily pre-pruned) slice, and AQE picks
  *    broadcast for late stages as the surviving-user set collapses.
  *    Stage predicates are pushed to the scan.
  */
object Analytics {

  /** Weekly cohort retention: users grouped by their first-active week
    * (the cohort), tracked over subsequent weeks.
    *
    * Output: `cohort_week` DATE (Monday), `week_offset` INT (0 = the
    * cohort week itself), `n_active` LONG, `retention_pct` DOUBLE
    * (n_active / cohort size, 4-decimal floor-rounded — offset 0 is
    * 1.0 by definition since every user is active in their own first
    * week). Total order (cohort_week, week_offset).
    */
  def retention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val wk = date_trunc("week", ts).cast("date")
    // one row per (user, active-week), combined map-side; cohort = min
    val perUser = events
      .select(user.as("__u"), wk.as("__wk"))
      .groupBy(col("__u"))
      .agg(min(col("__wk")).as("__cohort"), collect_set(col("__wk")).as("__wks"))
    val active = perUser
      .select(col("__cohort"),
        explode(col("__wks")).as("__wk"))
      .select(col("__cohort"),
        (datediff(col("__wk"), col("__cohort")) / 7).cast("int").as("week_offset"))
      .groupBy(col("__cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val w = Window.partitionBy(col("__cohort"))
    active
      .withColumn("__size", max(when(col("week_offset") === 0, col("n_active"))).over(w))
      .select(
        col("__cohort").as("cohort_week"),
        col("week_offset"),
        col("n_active"),
        (floor(col("n_active").cast("double") / col("__size") * 10000 + 0.5) / 10000)
          .as("retention_pct"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Ordered conversion funnel: for each user, stage i counts only if a
    * stage-i event exists STRICTLY AFTER that user's first qualifying
    * stage-(i-1) event (the standard "first touch then progress"
    * semantics — re-orderings don't count).
    *
    * Output: one row per stage — `stage_idx` INT (1-based), `stage`
    * STRING, `n_users` LONG, `pct_of_prev` DOUBLE (conversion vs the
    * previous stage, 4-decimal floor-rounded; 1.0 for the first stage).
    */
  def funnel(events: DataFrame, user: Column, ts: Column, eventType: Column,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events.select(user.as("__u"), ts.as("__ts"), eventType.as("__et"))

    // cascade of first-qualifying-timestamp frames, all keyed on __u
    val first = ev.filter(col("__et") === stages.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
    val reached: Seq[DataFrame] = stages.tail.scanLeft(first) { (prev, st) =>
      prev.join(ev.filter(col("__et") === st), Seq("__u"))
        .filter(col("__ts") > col("__t"))
        .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
    }

    val counts = reached.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(stages(i)).as("stage"), col("n_users"))
    }.reduce(_.unionByName(_))

    val w = BoundedWindow.ordered(col("stage_idx"), col("stage_idx"))
    counts
      .withColumn("__prev", lag(col("n_users"), 1).over(w))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        when(col("__prev").isNull, lit(1.0))
          .when(col("__prev") === 0, lit(0.0))
          .otherwise(floor(col("n_users").cast("double") / col("__prev") * 10000 + 0.5) / 10000)
          .as("pct_of_prev"))
      .orderBy("stage_idx")
  }

  /** Longest consecutive-day activity streak per entity — the
    * engagement metric retention curves can't see (a user active 30
    * scattered days differs from one active 30 days STRAIGHT). The
    * gaps-and-islands trick, exactly: distinct active days per entity,
    * `day − row_number()` constant within a consecutive run, island
    * sizes aggregated.
    *
    * All integer (epoch days), deterministic on any engine/layout.
    * Shape: one (entity, day) distinct aggregate (map-side combined),
    * one entity-keyed window (the rank), one (entity, island)
    * aggregate, one entity aggregate — a single entity exchange reused
    * by the window and both aggregates. Output: `entity`,
    * `n_active_days`, `n_streaks`, `longest_streak`,
    * `latest_streak` LONG (the streak ending on the entity's LAST
    * active day — "current" relative to the data's edge, the freshness
    * convention); total order by entity. */
  def longestStreak(events: DataFrame, entity: Column,
                    day: Column): DataFrame = {
    val base = events
      .select(entity.cast("long").as("entity"),
        day.cast("date").as("__d"))
      .filter(col("entity").isNotNull && col("__d").isNotNull)
      .distinct()
      .withColumn("__ep", datediff(col("__d"), lit("1970-01-01").cast("date"))
        .cast("long"))
    val w = Window.partitionBy(col("entity")).orderBy(col("__ep"))
    val islands = base
      .withColumn("__isl", col("__ep") - row_number().over(w))
      .groupBy(col("entity"), col("__isl"))
      .agg(count(lit(1)).as("__len"), max(col("__ep")).as("__last"))
    islands.groupBy(col("entity"))
      .agg(sum(col("__len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("__len")).as("longest_streak"),
        // the island containing the entity's max day = latest streak
        max(struct(col("__last"), col("__len"))).as("__m"))
      .select(col("entity"), col("n_active_days"), col("n_streaks"),
        col("longest_streak"), col("__m.__len").as("latest_streak"))
      .orderBy("entity")
  }

  /** Gap-based sessionization, ROW-LEVEL — the assignment surface
    * [[graft.streaming.Sessionize.sessionizeBatch]] (q49) rolls up
    * away: that operator emits per-session aggregates only; this one
    * returns every event with its session key, which is what bounce /
    * depth / session-funnel / entry-exit metrics downstream need. An
    * entity's events sorted by time split into sessions wherever the
    * gap to the previous event STRICTLY exceeds `gapUs` (q49's rollup
    * uses >=; both are industry conventions — documented, not
    * accidental). `tieBreak` completes the total order under tied
    * timestamps so the split is layout-independent, never partition
    * luck.
    *
    * Output: `entity` LONG, `ts_us` LONG, `tie` (the tieBreak value,
    * surfaced so callers can join assignments back to their rows),
    * `session_seq` LONG (1-based per entity, in time order),
    * `session_start_us` LONG (the session's first event time — with
    * `entity` a stable global session key). NULL entity/ts rows are
    * excluded (unsessionizable), mirroring the oracle's WHERE.
    *
    * Shape: ONE entity-keyed exchange shared by both windows (lag →
    * new-session flag → running sum); no join, no driver state. At
    * corpus scale the per-entity frame is the user's own event count —
    * the natural skew bound (a bot user with 10⁷ events is a data
    * problem surfaced by [[graft.operators.Skew.diagnose]], not a plan
    * problem). */
  def sessionize(events: DataFrame, entity: Column, tsUs: Column,
                 gapUs: Long, tieBreak: Column): DataFrame = {
    require(gapUs > 0, s"gapUs must be > 0, got $gapUs")
    val base = events.select(entity.cast("long").as("entity"),
        tsUs.cast("long").as("ts_us"), tieBreak.as("tie"))
      .filter(col("entity").isNotNull && col("ts_us").isNotNull)
    val w = Window.partitionBy(col("entity"))
      .orderBy(col("ts_us").asc, col("tie").asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("__prev", lag(col("ts_us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("ts_us") - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(run))
      // session starts are monotone in time, so the RUNNING max of
      // flagged start times IS the current session's start — this rides
      // the same (entity)-keyed sorted frame as the lag and the seq,
      // instead of a second window keyed (entity, session_seq) whose
      // different sort order would cost another per-partition sort
      .withColumn("session_start_us",
        max(when(col("__new") === 1L, col("ts_us"))).over(run))
      .select(col("entity"), col("ts_us"), col("tie"),
        col("session_seq"), col("session_start_us"))
  }

  /** Per-session rollup over [[sessionize]]'s assignment: event count,
    * start/end, duration, and the session's first/last event label (the
    * entry/exit-page readout, min/max by (ts, tie) — deterministic
    * under ties). The label column is `tieBreak` ONLY when callers pass
    * the label as the tiebreak; pass a separate `label` for the usual
    * (event_id tiebreak, event_type label) split.
    *
    * Shape: [[sessionize]]'s one entity exchange, then a (entity,
    * session_seq) aggregate that REUSES the same hash partitioning
    * (entity alone co-locates every session) — map-side combined, no
    * second exchange. Output: `entity`, `session_seq`,
    * `session_start_us`, `session_end_us`, `duration_us`, `n_events`
    * LONG, `entry_label`, `exit_label`; total order (entity,
    * session_seq). */
  def sessionStats(events: DataFrame, entity: Column, tsUs: Column,
                   gapUs: Long, tieBreak: Column,
                   label: Column): DataFrame = {
    val assigned = sessionize(
      events.select(entity.as("__e"), tsUs.as("__t"), tieBreak.as("__tb"),
        label.as("__lbl")),
      col("__e"), col("__t"), gapUs,
      struct(col("__tb"), col("__lbl")))
    assigned
      .groupBy(col("entity"), col("session_seq"))
      .agg(min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        count(lit(1)).as("n_events"),
        min(struct(col("ts_us"), col("tie"))).as("__first"),
        max(struct(col("ts_us"), col("tie"))).as("__last"))
      .select(col("entity"), col("session_seq"), col("session_start_us"),
        col("session_end_us"), col("duration_us"), col("n_events"),
        col("__first.tie.__lbl").as("entry_label"),
        col("__last.tie.__lbl").as("exit_label"))
      .orderBy("entity", "session_seq")
  }

  /** Time-constrained funnel: [[funnel]] with a MAX GAP between
    * consecutive steps — "signup → activate within 1 h → purchase
    * within 1 h", the form every product-analytics question actually
    * takes (an unconstrained funnel calls a year-later purchase a
    * conversion). Greedy first-occurrence semantics, stated precisely:
    * t₁ = the entity's FIRST stage-1 event; tₖ = the first stage-k
    * event with tₖ₋₁ < tₖ ≤ tₖ₋₁ + maxGap. Greedy is the product
    * convention (first touch starts the clock) and is deterministic —
    * a backtracking "any qualifying chain" search is a different,
    * costlier query, and the greedy count is its lower bound.
    *
    * Integer discipline: timestamps in µs, conversion ratios as
    * truncating ppm (`vs_first_ppm`, `vs_prev_ppm`) — engine-exact,
    * unlike the rounded-double pct the unconstrained funnel reports.
    *
    * Shape: one entity-keyed min-aggregate per stage, cascaded — the
    * |stages| bounded join chain, each over one-row-per-entity frames;
    * the final counts are |stages| rows. Output: `stage_idx`, `stage`,
    * `n_users` LONG, `vs_first_ppm`, `vs_prev_ppm` LONG; total order by
    * stage_idx. */
  def funnelWindowed(events: DataFrame, user: Column, tsUs: Column,
                     eventType: Column, stages: Seq[String],
                     maxGapUs: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapUs > 0, "maxGapUs must be > 0")
    val ev = events.select(user.as("__u"), tsUs.cast("long").as("__ts"),
        eventType.as("__et"))
      .filter(col("__u").isNotNull && col("__ts").isNotNull)

    val firstStage = ev.filter(col("__et") === stages.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
    val reached: Seq[DataFrame] = stages.tail.scanLeft(firstStage) { (prev, st) =>
      prev.join(ev.filter(col("__et") === st), Seq("__u"))
        .filter(col("__ts") > col("__t") &&
          col("__ts") <= col("__t") + maxGapUs)
        .groupBy(col("__u")).agg(min(col("__ts")).as("__t"))
    }

    val counts = reached.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("long").as("stage_idx"),
          lit(stages(i)).as("stage"), col("n_users"))
    }.reduce(_.unionByName(_))

    val w = BoundedWindow.ordered(col("stage_idx"), col("stage_idx")) // |stages|-sized frame
    counts
      .withColumn("__first", first(col("n_users")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__prev", lag(col("n_users"), 1).over(w))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        expr("""CASE WHEN __first > 0
               | THEN (1000000L * n_users) DIV __first END""".stripMargin)
          .as("vs_first_ppm"),
        expr("""CASE WHEN __prev IS NULL THEN 1000000L
               | WHEN __prev > 0 THEN (1000000L * n_users) DIV __prev
               | END""".stripMargin).as("vs_prev_ppm"))
      .orderBy("stage_idx")
  }

  /** Peak concurrency by sweep line: how many intervals [start, end)
    * overlap at once, per group — max concurrent sessions/streams/users,
    * the capacity-planning number a BI tier reads off the event stream.
    *
    * Each interval contributes a +1 delta at `start` and a −1 at `end`;
    * the running sum of deltas ordered by (time, delta) — ends sort
    * before starts at the same instant, giving half-open [start, end)
    * semantics — is the concurrency curve, and its max the peak.
    * Permuting equal (time, delta) rows permutes equal addends, so every
    * tie order yields the same partial-sum multiset: the result is
    * deterministic without a total tie-break.
    *
    * Output: one row per group — `peak` LONG, `peak_at` TIMESTAMP (the
    * earliest instant the peak is reached).
    *
    * Scale posture: the delta stream is 2 rows per interval, shuffled
    * once on the group key; the window pass is one in-partition sort.
    * Groups are the parallelism unit — a single giant group serializes
    * its sort, in which case pre-bucket by calendar day and take the
    * max of per-day peaks seeded with the day-boundary concurrency
    * (the standard segmented-sweep refinement). */
  def peakConcurrency(df: DataFrame, group: Column, start: Column,
                      end: Column): DataFrame = {
    val deltas = df.select(group.as("__g"), start.as("__t"), lit(1L).as("__d"))
      .unionByName(df.select(group.as("__g"), end.as("__t"), lit(-1L).as("__d")))
    val w = Window.partitionBy(col("__g")).orderBy(col("__t"), col("__d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("__run", sum(col("__d")).over(w))
      .withColumn("__peak", max(col("__run")).over(Window.partitionBy(col("__g"))))
      .filter(col("__run") === col("__peak"))
      .groupBy(col("__g"))
      .agg(max(col("__run")).as("peak"), min(col("__t")).as("peak_at"))
      .select(col("__g").as("group"), col("peak"), col("peak_at"))
  }

  /** Per-group linear trend by the OLS normal equations, EXACT: with
    * x centered on the group's min (small magnitudes) and y in caller-
    * chosen integer fixed-point units,
    *
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
    *
    * both numerator and denominator are exact integers (DECIMAL(38,0)
    * internally) — no float summation order anywhere, so the trend
    * DIRECTION and the exact rational slope are bit-deterministic on
    * any engine/layout. The exact integers are emitted as DOUBLE (one
    * correctly-rounded conversion, identical in any engine) so the
    * result schema round-trips parquet/BI tiers without decimal-
    * precision bikeshedding; `trend` carries the sign exactly.
    *
    * Input columns: `x` integral (e.g. epoch seconds), `yFix` integral
    * fixed-point. Output per group: `n`, `sum_x` (Σ centered x),
    * `sum_y`, `slope_num`, `slope_den` (DOUBLE), `trend` INT (sign of
    * the slope; 0 when the denominator is 0 — fewer than 2 distinct x). */
  def trend(df: DataFrame, group: Column, x: Column, yFix: Column): DataFrame = {
    val base = df.select(group.as("__g"), x.cast("long").as("__x"),
      yFix.cast("long").as("__y"))
    val w = Window.partitionBy(col("__g"))
    val d19 = "decimal(19,0)"
    base
      .withColumn("__xc", col("__x") - min(col("__x")).over(w))
      .groupBy(col("__g"))
      .agg(
        count(lit(1)).cast(d19).as("__n"),
        sum(col("__xc").cast(d19)).cast(d19).as("__sx"),
        sum(col("__y").cast(d19)).cast(d19).as("__sy"),
        sum(col("__xc").cast(d19) * col("__y").cast(d19)).cast("decimal(38,0)").as("__sxy"),
        sum(col("__xc").cast(d19) * col("__xc").cast(d19)).cast("decimal(38,0)").as("__sxx"))
      .select(
        col("__g").as("group"),
        col("__n").cast("long").as("n"),
        col("__sx").cast("long").as("sum_x"),
        col("__sy").cast("long").as("sum_y"),
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double").as("slope_num"),
        (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double").as("slope_den"))
      .withColumn("trend",
        when(col("slope_den") === 0, lit(0)).otherwise(signum(col("slope_num")).cast("int")))
  }

  /** TRENDING detection: each (key, day)'s count against the key's own
    * STRICTLY-PRIOR trailing-`window`-day baseline — the corpus-
    * monitoring view ("which terms/types/domains spiked today") that a
    * same-day baseline would dilute. lift_ppm is exact integer
    * arithmetic (today·window·10⁶ DIV baseline — >10⁶ means above
    * trailing average), NULL for a key's first `window` days (no
    * baseline — explicitly not "infinitely trending").
    *
    * One (key, day) count aggregate with map-side combine, then one
    * RANGE window per key over its DAY ROWS (≤ one row per active day
    * — the window walks counts, never events). */
  def trending(df: DataFrame, key: Column, day: Column,
               window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1 day, got $window")
    val dayIdx = datediff(day, lit(java.sql.Date.valueOf("1970-01-01")))
    val counts = df.groupBy(key.as("key"), dayIdx.as("day_idx"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("key")).orderBy(col("day_idx"))
      .rangeBetween(-window, -1)
    counts
      .withColumn("base_n", sum(col("n")).over(w))
      .withColumn("lift_ppm",
        when(col("base_n") > 0,
          expr(s"n * $window * 1000000L DIV base_n")))
      .select(col("key"), col("day_idx"), col("n"), col("base_n"),
        col("lift_ppm"))
  }

  /** First-order Markov transition matrix over per-entity event
    * sequences: for each (from_state, to_state) pair, how many adjacent
    * transitions occurred and the row-conditional probability
    * P(to | from) in integer ppm. The behavioral-model primitive behind
    * next-event prediction, anomaly scoring on event flows, and journey
    * dashboards.
    *
    * `order` must totally order each entity's events (ties would make
    * adjacency layout-dependent — pass (ts, event_id)).
    *
    * Scale posture: ONE entity-keyed exchange carries the lag window
    * (each entity's sequence sorts in-partition), then the pair
    * aggregate shuffles only (from, to) partials — cardinality
    * states², not events; the marginal totals come from a window over
    * the states²-sized aggregate, not a second pass over events.
    * Integer ppm via DIV — engine-exact, layout-independent.
    *
    * Output: `from_state`, `to_state`, `n` LONG, `n_from` LONG (all
    * transitions leaving from_state), `p_ppm` LONG. Total order
    * (from_state, to_state).
    */
  def transitionMatrix(events: DataFrame, entity: Column, order: Seq[Column],
                       state: Column): DataFrame = {
    val w = Window.partitionBy(col("__e")).orderBy(order: _*)
    val pairs = events
      .withColumn("__e", entity)
      .withColumn("__s", state.cast("string"))
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .filter(col("__prev").isNotNull && col("__s").isNotNull)
      .groupBy(col("__prev").as("from_state"), col("__s").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val rowTotal = Window.partitionBy(col("from_state"))
    pairs
      .withColumn("n_from", sum(col("n")).over(rowTotal))
      .withColumn("p_ppm", expr("n * 1000000L DIV n_from"))
      .orderBy("from_state", "to_state")
  }

  /** Conditional entropy of the next event given the current one —
    * the one-number "how predictable are these flows" readout over
    * [[transitionMatrix]]: H(next|cur) = Σ_s p(s)·H(next|s). Low means
    * scripted/bot-like flows, high means exploratory; a DRIFT in it
    * flags behavior change even when the state marginals hold still.
    *
    * Per transition cell the term is one pinned IEEE sequence
    * (mutualInfo's posture), floor-nano-quantized:
    *
    *   term_nano = floor(−(n/n_from)·ln(n/n_from)·10⁹ + 0.5)
    *
    * summed per from_state into `h_nano` (order-free longs); the
    * corpus-weighted conditional entropy is then the exact integer
    * quotient Σ n_from·h_nano DIV N (positive — engine-safe),
    * published on every row (window-total convention).
    *
    * Scale posture: [[transitionMatrix]]'s exactly — ONE entity-keyed
    * exchange for the lag window, a states²-sized cell aggregate, and
    * everything after rides windows over THAT frame.
    *
    * Output (one row per from_state): `from_state`, `n_from`,
    * `h_nano`, `n_total`, `cond_h_nano` LONG — total order by
    * from_state.
    */
  def transitionEntropy(events: DataFrame, entity: Column,
                        order: Seq[Column], state: Column): DataFrame = {
    val w = Window.partitionBy(col("__e")).orderBy(order: _*)
    val cells = events
      .withColumn("__e", entity)
      .withColumn("__s", state.cast("string"))
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .filter(col("__prev").isNotNull && col("__s").isNotNull)
      .groupBy(col("__prev").as("from_state"), col("__s").as("to_state"))
      .agg(count(lit(1)).as("n"))
    val rowTotal = Window.partitionBy(col("from_state"))
    val perFrom = cells
      .withColumn("n_from", sum(col("n")).over(rowTotal))
      .withColumn("__term",
        floor(-(col("n").cast("double") / col("n_from")) *
          log(col("n").cast("double") / col("n_from")) * 1000000000L
          + 0.5).cast("long"))
      .groupBy(col("from_state"), col("n_from"))
      .agg(coalesce(sum(col("__term")), lit(0L)).as("h_nano"))
    val wall = BoundedWindow.all(col("from_state"))
    perFrom
      .withColumn("n_total",
        coalesce(sum(col("n_from")).over(wall), lit(0L)))
      .withColumn("cond_h_nano", expr(
        """CAST(sum(CAST(n_from AS DECIMAL(38,0)) * h_nano)
          |   OVER (PARTITION BY pmod(hash(from_state), 1))
          |   DIV n_total AS BIGINT)""".stripMargin))
      .select(col("from_state"), col("n_from"), col("h_nano"),
        col("n_total"), col("cond_h_nano"))
      .orderBy(col("from_state"))
  }

  /** CUPED variance reduction for A/B metrics (Deng–Xu–Kohavi–Walker
    * 2013) — adjust each unit's metric by its PRE-EXPERIMENT covariate
    * so the experiment reads signal, not the noise users brought in
    * with them:
    *
    *   θ   = cov(y, x) / var(x)            (pooled)
    *   ŷ_g = ȳ_g − θ·(x̄_g − x̄)            (per variant)
    *
    * The moment sums are exact DECIMAL(38,0) integers (num = n·Σxy −
    * Σx·Σy, den = n·Σx² − (Σx)² — published BIGINT audit columns);
    * θ and each adjusted mean are ONE pinned IEEE sequence over those
    * exact integers (div / div / sub / mul / sub — correctly rounded,
    * engine-identical). θ is NULL when the covariate is constant
    * (den = 0) and the adjusted means then equal the raw means — the
    * honest no-op, never a fake adjustment.
    *
    * Scale posture: ONE pass builds both the pooled moments and the
    * per-variant sums (a variant-keyed map-side-combined aggregate +
    * a one-row pooled rollup broadcast back); rows with a NULL
    * variant/metric/covariate are dropped (gate upstream).
    *
    * Output (one row per variant): `variant`, `n`, `sum_y`, `sum_x`
    * LONG, `num`, `den` LONG (pooled, repeated), `theta`
    * DOUBLE-or-NULL, `mean_y`, `adj_mean` DOUBLE — total order by
    * variant.
    */
  def cuped(df: DataFrame, variant: Column, metric: Column,
            covariate: Column): DataFrame = {
    val base = df.select(variant.cast("string").as("variant"),
        metric.cast("long").as("__y"), covariate.cast("long").as("__x"))
      .filter(col("variant").isNotNull && col("__y").isNotNull &&
        col("__x").isNotNull)
    val perVariant = base.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("__y")), lit(0L)).as("sum_y"),
        coalesce(sum(col("__x")), lit(0L)).as("sum_x"))
    val pooled = base.agg(
      count(lit(1)).as("__N"),
      coalesce(sum(col("__x").cast("decimal(38,0)")),
        lit(0L).cast("decimal(38,0)")).as("__Sx"),
      coalesce(sum(col("__y").cast("decimal(38,0)")),
        lit(0L).cast("decimal(38,0)")).as("__Sy"),
      coalesce(sum(col("__x").cast("decimal(38,0)") * col("__y")),
        lit(0L).cast("decimal(38,0)")).as("__Sxy"),
      coalesce(sum(col("__x").cast("decimal(38,0)") * col("__x")),
        lit(0L).cast("decimal(38,0)")).as("__Sxx"))
      .withColumn("__num", col("__N") * col("__Sxy") - col("__Sx") * col("__Sy"))
      .withColumn("__den", col("__N") * col("__Sxx") - col("__Sx") * col("__Sx"))
    perVariant.crossJoin(broadcast(pooled))
      .withColumn("theta",
        when(col("__den") > 0,
          col("__num").cast("double") / col("__den").cast("double")))
      .withColumn("mean_y", col("sum_y").cast("double") / col("n"))
      .withColumn("adj_mean",
        when(col("__den") > 0,
          col("mean_y") - col("theta") *
            (col("sum_x").cast("double") / col("n") -
              col("__Sx").cast("double") / col("__N")))
          .otherwise(col("mean_y")))
      .select(col("variant"), col("n"), col("sum_y"), col("sum_x"),
        col("__num").cast("long").as("num"),
        col("__den").cast("long").as("den"), col("theta"),
        col("mean_y"), col("adj_mean"))
      .orderBy(col("variant"))
  }

  /** Empirical-Bayes rate shrinkage — the fix for "sort by rate" lists
    * dominated by tiny-sample flukes (a 1/1 supplier outranking a
    * 990/1000 one): each key's success rate shrinks toward a Beta
    * prior in proportion to its evidence,
    *
    *   eb_ppm = ((s·10⁶ + α)·10⁶) DIV (t·10⁶ + α + β)
    *
    * with the prior given as MICRO pseudo-counts (α = 5·10⁶ reads "5
    * pseudo-successes") — callers pick the prior explicitly; this
    * operator refuses to hide a method-of-moments float fit inside an
    * exact pipeline. All arithmetic positive exact integers
    * (DECIMAL(38,0)-widened), so the RANKING the list exists for is
    * engine-stable. As evidence t grows the estimate converges to the
    * raw rate; at t = 1 it sits near the prior mean α/(α+β) — exactly
    * the cold-start behavior a leaderboard needs.
    *
    * Scale posture: one key aggregate + [[Relational.globalRank]] on
    * (eb desc, key asc) — a named total order for the leaderboard.
    *
    * Output: `key`, `trials`, `successes` LONG, `raw_ppm`
    * LONG-or-NULL, `eb_ppm`, `rank` LONG — total order by rank.
    */
  def ebShrink(df: DataFrame, key: Column, success: Column,
               alphaMicro: Long, betaMicro: Long): DataFrame = {
    require(alphaMicro > 0L && betaMicro > 0L,
      s"prior pseudo-counts must be positive, got ($alphaMicro, $betaMicro)")
    val agg = df.select(key.cast("string").as("key"),
        success.cast("boolean").as("__s"))
      .filter(col("key").isNotNull && col("__s").isNotNull)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("trials"),
        coalesce(sum(when(col("__s"), 1L).otherwise(0L)), lit(0L))
          .as("successes"))
      .withColumn("raw_ppm",
        when(col("trials") > 0L,
          expr("(successes * 1000000L) DIV trials")))
      .withColumn("eb_ppm", expr(
        s"""((CAST(successes AS DECIMAL(38,0)) * 1000000 + ${alphaMicro}L)
           | * 1000000)
           | DIV (CAST(trials AS DECIMAL(38,0)) * 1000000
           |      + ${alphaMicro}L + ${betaMicro}L)""".stripMargin))
    Relational.globalRank(agg,
        Seq(col("eb_ppm").desc, col("key").asc))
      .select(col("key"), col("trials"), col("successes"), col("raw_ppm"),
        col("eb_ppm"), col("rank"))
      .orderBy(col("rank"))
  }

  /** Simpson's-paradox detector — "B beats A overall, but A wins in
    * every slice": the aggregation artifact that quietly inverts A/B
    * readouts whenever traffic mix differs by variant. Direction is
    * decided WITHOUT DIVISION — mean_a > mean_b ⟺ sum_a·n_b >
    * sum_b·n_a, an exact DECIMAL(38,0) cross-product compare — so the
    * verdict has no rounding policy at all, in either engine.
    *
    * Per slice: both sides' counts/sums, the slice direction
    * (−1/0/+1), the overall direction (window-total convention), and
    * `flipped` = the slice contradicts the aggregate (strict sign
    * opposition; empty-side slices direction 0, never flipped).
    *
    * Scale posture: one (slice)-keyed map-side-combined aggregate;
    * overall totals ride a window over the slices frame.
    *
    * Output: `slice`, `n_a`, `sum_a`, `n_b`, `sum_b` LONG,
    * `dir_slice`, `dir_overall` INT, `flipped` BOOLEAN — total order
    * by slice (NULL first; a NULL slice is a real slice).
    */
  def simpsonCheck(df: DataFrame, sideA: Column, slice: Column,
                   value: Column): DataFrame = {
    val base = df.select(sideA.cast("boolean").as("__a"),
        slice.cast("string").as("slice"), value.cast("long").as("__v"))
      .filter(col("__a").isNotNull && col("__v").isNotNull)
    def dir(sa: Column, na: Column, sb: Column, nb: Column): Column = {
      val left = sa.cast("decimal(38,0)") * nb
      val right = sb.cast("decimal(38,0)") * na
      when(na === 0L || nb === 0L, 0)
        .when(left > right, 1).when(left < right, -1).otherwise(0)
    }
    val slices = base.groupBy(col("slice"))
      .agg(
        coalesce(sum(when(col("__a"), 1L).otherwise(0L)), lit(0L)).as("n_a"),
        coalesce(sum(when(col("__a"), col("__v")).otherwise(0L)), lit(0L))
          .as("sum_a"),
        coalesce(sum(when(!col("__a"), 1L).otherwise(0L)), lit(0L)).as("n_b"),
        coalesce(sum(when(!col("__a"), col("__v")).otherwise(0L)), lit(0L))
          .as("sum_b"))
    val wall = BoundedWindow.all(col("n_a"))
    slices
      .withColumn("__ta", coalesce(sum(col("n_a")).over(wall), lit(0L)))
      .withColumn("__sa", coalesce(sum(col("sum_a")).over(wall), lit(0L)))
      .withColumn("__tb", coalesce(sum(col("n_b")).over(wall), lit(0L)))
      .withColumn("__sb", coalesce(sum(col("sum_b")).over(wall), lit(0L)))
      .withColumn("dir_slice",
        dir(col("sum_a"), col("n_a"), col("sum_b"), col("n_b")))
      .withColumn("dir_overall",
        dir(col("__sa"), col("__ta"), col("__sb"), col("__tb")))
      .withColumn("flipped",
        col("dir_slice") * col("dir_overall") === -1)
      .select(col("slice"), col("n_a"), col("sum_a"), col("n_b"),
        col("sum_b"), col("dir_slice"), col("dir_overall"), col("flipped"))
      .orderBy(col("slice").asc_nulls_first)
  }

  /** Share-of-parent decomposition: per (parent, child) the value
    * total, its ppm share WITHIN the parent, and the parent's ppm
    * share of the grand total — the two-level drill-down every BI
    * hierarchy renders (region→country, source→domain). Truncating
    * integer shares; one (parent, child) aggregate with map-side
    * combine, marginals from windows over that groups-sized frame
    * (rows are touched once).
    *
    * Output: `parent`, `child`, `total_cents` LONG,
    * `share_of_parent_ppm` LONG, `parent_total_cents` LONG,
    * `parent_share_ppm` LONG, total order (parent, child).
    */
  def shareOfParent(df: DataFrame, parent: Column, child: Column,
                    valueCents: Column): DataFrame = {
    val agg = df
      .select(parent.cast("string").as("parent"),
        child.cast("string").as("child"),
        valueCents.cast("long").as("__v"))
      .filter(col("parent").isNotNull && col("child").isNotNull)
      .groupBy(col("parent"), col("child"))
      .agg(coalesce(sum(col("__v")), lit(0L)).as("total_cents"))
    val wp = Window.partitionBy(col("parent"))
    val wg = BoundedWindow.all(col("parent"))
    agg
      .withColumn("parent_total_cents", sum(col("total_cents")).over(wp))
      .withColumn("__grand", sum(col("total_cents")).over(wg))
      .withColumn("share_of_parent_ppm",
        when(col("parent_total_cents") =!= 0L,
          expr("CAST((1000000L * CAST(total_cents AS DECIMAL(38,0))) DIV parent_total_cents AS BIGINT)")))
      .withColumn("parent_share_ppm",
        when(col("__grand") =!= 0L,
          expr("CAST((1000000L * CAST(parent_total_cents AS DECIMAL(38,0))) DIV __grand AS BIGINT)")))
      .select(col("parent"), col("child"), col("total_cents"),
        col("share_of_parent_ppm"), col("parent_total_cents"),
        col("parent_share_ppm"))
      .orderBy("parent", "child")
  }

  /** Growth accounting: per period, decompose the active-entity count
    * into NEW (first period ever), RETAINED (also active the previous
    * period), and RESURRECTED (active before, but not the previous
    * period), plus CHURNED (active the previous period, absent now) —
    * the standard DAU/MAU ledger where
    * active(p) = new + retained + resurrected and
    * active(p) − active(p−1) = new + resurrected − churned.
    *
    * Scale posture: presence collapses to distinct (entity, period)
    * first; ONE entity-keyed lag/lead window classifies every presence
    * row AND emits its churn contribution (at period next-after-gap),
    * then a periods-sized aggregate — the entity stream is exchanged
    * once. Entities churning after the last observed period are
    * right-censored (no churn row is invented beyond the data).
    *
    * Output: `period` LONG, `n_active`, `n_new`, `n_retained`,
    * `n_resurrected`, `n_churned` LONG, total order by period.
    */
  def growthAccounting(events: DataFrame, entity: Column,
                       period: Column): DataFrame = {
    val presence = events
      .select(entity.as("__e"), period.cast("long").as("__p"))
      .filter(col("__p").isNotNull)
      .distinct()
    val w = Window.partitionBy(col("__e")).orderBy(col("__p"))
    val classed = presence
      .withColumn("__prev", lag(col("__p"), 1).over(w))
      .withColumn("__next", lead(col("__p"), 1).over(w))
      .withColumn("__class",
        when(col("__prev").isNull, "new")
          .when(col("__prev") === col("__p") - 1L, "retained")
          .otherwise("resurrected"))
    val perPeriod = classed.groupBy(col("__p").as("period"))
      .agg(count(lit(1)).as("n_active"),
        coalesce(sum(when(col("__class") === "new", 1L).otherwise(0L)),
          lit(0L)).as("n_new"),
        coalesce(sum(when(col("__class") === "retained", 1L).otherwise(0L)),
          lit(0L)).as("n_retained"),
        coalesce(sum(when(col("__class") === "resurrected", 1L)
          .otherwise(0L)), lit(0L)).as("n_resurrected"))
    // churn lands at p+1 for every presence row whose successor is not
    // the adjacent period (or is absent) — right-censoring handled by
    // the inner join onto observed periods
    val churn = classed
      .filter(col("__next").isNull || col("__next") =!= col("__p") + 1L)
      .groupBy((col("__p") + 1L).as("period"))
      .agg(count(lit(1)).as("n_churned"))
    perPeriod.join(churn, Seq("period"), "left_outer")
      .withColumn("n_churned", coalesce(col("n_churned"), lit(0L)))
      .orderBy("period")
  }

  /** Rare-transition anomaly scan: score every observed adjacent
    * transition by its model probability from [[transitionMatrix]] and
    * surface the ones below `maxPpm` — the "this user's journey took a
    * path the population almost never takes" detector (fraud flows,
    * broken funnels, bot loops). Closing the model→score loop keeps
    * both halves in one shuffle discipline: the matrix is states²-sized
    * and BROADCAST onto the event-pair stream; unseen transitions
    * (absent from the matrix) score p_ppm 0 — the rarest kind.
    *
    * Output: `entity`, `from_state`, `to_state`, `n_pair` LONG (how
    * often THIS entity took it), `p_ppm` LONG (population probability,
    * 0 when unseen), total order (entity, from_state, to_state).
    */
  def rareTransitions(events: DataFrame, entity: Column,
                      order: Seq[Column], state: Column,
                      maxPpm: Long): DataFrame = {
    val model = transitionMatrix(events, entity, order, state)
      .select(col("from_state"), col("to_state"), col("p_ppm"))
    val w = Window.partitionBy(col("__e")).orderBy(order: _*)
    val pairs = events
      .withColumn("__e", entity)
      .withColumn("__s", state.cast("string"))
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .filter(col("__prev").isNotNull && col("__s").isNotNull)
      .groupBy(col("__e").as("entity"), col("__prev").as("from_state"),
        col("__s").as("to_state"))
      .agg(count(lit(1)).as("n_pair"))
    pairs.join(broadcast(model), Seq("from_state", "to_state"), "left_outer")
      .withColumn("p_ppm", coalesce(col("p_ppm"), lit(0L)))
      .filter(col("p_ppm") <= maxPpm)
      .select(col("entity"), col("from_state"), col("to_state"),
        col("n_pair"), col("p_ppm"))
      .orderBy("entity", "from_state", "to_state")
  }

  /** Period-over-period comparison: per (key, period) totals with the
    * ADJACENT previous period's total, the delta, and the relative
    * change in ppm — the "vs last week" BI staple. A gap in periods
    * yields NULL prev (comparing against a non-adjacent period would
    * silently lie — the [[graft.operators.CorpusStats.freqOfFreqs]]
    * adjacency discipline); pct change is NULL when prev is missing or
    * zero (no fake infinities).
    *
    * One (key, period) aggregate with map-side combine, then a lag
    * window over that periods-per-key-sized frame — rows are touched
    * once. Output: `key`, `period` LONG, `total_cents` LONG,
    * `prev_cents`, `delta_cents`, `pct_change_ppm` LONG-or-NULL, total
    * order (key, period).
    */
  def periodOverPeriod(df: DataFrame, key: Column, period: Column,
                       valueCents: Column): DataFrame = {
    val agg = df
      .select(key.cast("string").as("key"), period.cast("long").as("period"),
        valueCents.cast("long").as("__v"))
      .filter(col("period").isNotNull)
      .groupBy(col("key"), col("period"))
      .agg(coalesce(sum(col("__v")), lit(0L)).as("total_cents"))
    val w = Window.partitionBy(col("key")).orderBy(col("period"))
    agg
      .withColumn("prev_cents",
        when(lag(col("period"), 1).over(w) === col("period") - 1L,
          lag(col("total_cents"), 1).over(w)))
      .withColumn("delta_cents", col("total_cents") - col("prev_cents"))
      .withColumn("pct_change_ppm",
        when(col("prev_cents").isNotNull && col("prev_cents") =!= 0L,
          expr("CAST((1000000L * CAST(total_cents - prev_cents AS DECIMAL(38,0))) DIV abs(prev_cents) AS BIGINT)")))
      .orderBy("key", "period")
  }

  /** Conversion-lag histogram: how long after the FIRST `fromState`
    * event does each entity reach its first SUBSEQUENT `toState` event —
    * the funnel-latency readout behind "signup → first purchase in N
    * hours" dashboards and SLA alerts. Lags bucket by `bucketUs`
    * (truncating integer DIV); entities that saw `fromState` but never
    * converted land in bucket −1 (visible, not dropped — the funnel's
    * denominator matters).
    *
    * Scale posture: two entity-keyed min-aggregates (map-side combined)
    * and one entity equi-join — no windows over the event stream, no
    * per-entity sequence state. Output: `bucket` LONG (−1 = never),
    * `n_entities` LONG, total order by bucket.
    */
  def conversionLag(events: DataFrame, entity: Column, tsUs: Column,
                    state: Column, fromState: String, toState: String,
                    bucketUs: Long): DataFrame = {
    require(bucketUs > 0L, "bucketUs must be > 0")
    val base = events.select(entity.as("__e"), tsUs.cast("long").as("__t"),
        state.cast("string").as("__s"))
      .filter(col("__t").isNotNull)
    val firstFrom = base.filter(col("__s") === fromState)
      .groupBy(col("__e")).agg(min(col("__t")).as("__ta"))
    val firstToAfter = base.filter(col("__s") === toState)
      .join(firstFrom, "__e")
      .filter(col("__t") >= col("__ta"))
      .groupBy(col("__e")).agg(min(col("__t")).as("__tb"))
    firstFrom.join(firstToAfter, Seq("__e"), "left_outer")
      .withColumn("bucket",
        when(col("__tb").isNull, lit(-1L))
          .otherwise(expr(s"(__tb - __ta) DIV ${bucketUs}L")))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_entities"))
      .orderBy("bucket")
  }

  /** Two-arm A/B comparison in exact integer units: per-arm conversion
    * counts and ppm rates, the absolute lift, and the squared
    * two-proportion z statistic in micro-units — the experiment
    * readout, kept log/sqrt-free so any engine replays it bit-for-bit
    * (compare z2 against 3.8415 ≈ χ²₁(0.95) as the caller's last,
    * local step; z² = z-test squared, identical decision).
    *
    *   z² = (p₁−p₂)² / (p̂(1−p̂)(1/n₁+1/n₂))      with p̂ the pooled rate
    *      = Δppm² · n₁ · n₂ · N  DIV  (n₁+n₂)² ·… — all integer via ppm
    *
    * Implementation keeps every intermediate in DECIMAL(38,0):
    *   z2_micro = (Δppm² · n₁ · n₂) DIV ((n₁+n₂) · pool_ppm ·
    *              (1e6 − pool_ppm) DIV 1e6 … ) — see code; one
    * truncating DIV at the end, NULL when either arm is empty or the
    * pooled rate is degenerate (0 or 1 — no variance, z undefined).
    *
    * One arm-keyed aggregate (two rows), then a two-row pivot — nothing
    * else shuffles. Output (one row): `n_a`, `conv_a`, `rate_a_ppm`,
    * `n_b`, `conv_b`, `rate_b_ppm`, `lift_ppm` (rate_b − rate_a),
    * `pool_ppm`, `z2_micro`.
    */
  def abTest(df: DataFrame, arm: Column, success: Column,
             armA: String, armB: String): DataFrame = {
    val agg = df
      .select(arm.cast("string").as("__arm"),
        success.cast("boolean").as("__s"))
      .filter(col("__arm").isin(armA, armB) && col("__s").isNotNull)
      .groupBy(col("__arm"))
      .agg(count(lit(1)).as("__n"),
        coalesce(sum(when(col("__s"), 1L).otherwise(0L)), lit(0L))
          .as("__c"))
    val row = agg.agg(
      coalesce(sum(when(col("__arm") === armA, col("__n"))), lit(0L))
        .as("n_a"),
      coalesce(sum(when(col("__arm") === armA, col("__c"))), lit(0L))
        .as("conv_a"),
      coalesce(sum(when(col("__arm") === armB, col("__n"))), lit(0L))
        .as("n_b"),
      coalesce(sum(when(col("__arm") === armB, col("__c"))), lit(0L))
        .as("conv_b"))
    row
      .withColumn("rate_a_ppm",
        when(col("n_a") > 0L, expr("(1000000L * conv_a) DIV n_a")))
      .withColumn("rate_b_ppm",
        when(col("n_b") > 0L, expr("(1000000L * conv_b) DIV n_b")))
      .withColumn("lift_ppm", col("rate_b_ppm") - col("rate_a_ppm"))
      .withColumn("pool_ppm",
        when(col("n_a") + col("n_b") > 0L,
          expr("(1000000L * (conv_a + conv_b)) DIV (n_a + n_b)")))
      .withColumn("z2_micro",
        when(col("n_a") > 0L && col("n_b") > 0L &&
          col("pool_ppm") > 0L && col("pool_ppm") < 1000000L,
          expr("""CAST((1000000L * CAST(rate_b_ppm - rate_a_ppm AS DECIMAL(38,0)) *
                 (rate_b_ppm - rate_a_ppm) * n_a * n_b) DIV
                 (CAST(pool_ppm AS DECIMAL(38,0)) *
                  (1000000L - pool_ppm) * (n_a + n_b)) AS BIGINT)""")))
      .select(col("n_a"), col("conv_a"), col("rate_a_ppm"),
        col("n_b"), col("conv_b"), col("rate_b_ppm"), col("lift_ppm"),
        col("pool_ppm"), col("z2_micro"))
  }

  /** Top journey paths: the most common prefix-of-length-`pathLen`
    * event sequences across entities — the "what do users actually do
    * first" dashboard behind onboarding and funnel design, and the
    * n-gram generalization of [[transitionMatrix]] (whole prefixes, not
    * adjacent pairs).
    *
    * Null states are dropped BEFORE ranking (the path is over observed
    * states; a null is a gap, not a step). Path assembly is
    * deterministic on any layout: the per-entity window assigns
    * row_number under the caller's total order, and `array_sort` over
    * (rn, state) structs rebuilds the sequence in-row regardless of
    * collect_list's arrival order (the [[graft.operators.CorpusStats]]
    * boilerplate-reassembly discipline).
    *
    * Scale posture: one entity-keyed exchange (window + path agg share
    * it), then a path-keyed count with map-side combine; the final
    * top-N is a TakeOrderedAndProject, never a global sort of all
    * paths. Output: `path` STRING (states joined with ">"),
    * `n_entities` LONG — ordered (n_entities DESC, path), limit topN.
    */
  def journeyPaths(events: DataFrame, entity: Column, order: Seq[Column],
                   state: Column, pathLen: Int, topN: Int): DataFrame = {
    require(pathLen >= 1, "pathLen >= 1")
    require(topN >= 1, "topN >= 1")
    val w = Window.partitionBy(col("__e")).orderBy(order: _*)
    events
      .withColumn("__e", entity)
      .withColumn("__s", state.cast("string"))
      .filter(col("__s").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= pathLen)
      .groupBy(col("__e"))
      .agg(concat_ws(">",
        transform(array_sort(collect_list(struct(col("__rn"), col("__s")))),
          s => s.getField("__s"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_entities"))
      .orderBy(col("n_entities").desc, col("path"))
      .limit(topN)
  }

  /** Per-key Gini impurity of a categorical distribution, in exact ppm:
    * gini = 1 − Σ pᵢ² — the log-free concentration/predictability score
    * (0 = all mass on one category, →1 = uniform over many). Companion
    * to [[transitionMatrix]] (how predictable is each entity's next
    * event) and to source-mix audits (how concentrated is a shard's
    * domain mix) — same role as entropy, but entropy needs libm `log`
    * (not bit-portable); Σ pᵢ² is pure integer arithmetic:
    *
    *   gini_ppm = 1e6 − (1e6 · Σ nᵢ²) DIV n²    (DECIMAL(38,0) products)
    *
    * Scale posture: one (key, category) aggregate with map-side combine
    * (vocabulary-bounded per key), then a key-sized aggregate; nothing
    * else shuffles. Null categories are dropped (a null is absence, not
    * a category). Output: `key`, `n` LONG, `n_cats` LONG, `gini_ppm`
    * LONG, total order by key.
    */
  def categoricalGini(df: DataFrame, key: Column,
                      category: Column): DataFrame =
    df.select(key.cast("string").as("key"),
        category.cast("string").as("__c"))
      .filter(col("__c").isNotNull)
      .groupBy(col("key"), col("__c")).agg(count(lit(1)).as("__n"))
      .groupBy(col("key"))
      .agg(sum(col("__n")).as("n"), count(lit(1)).as("n_cats"),
        sum(col("__n").cast("decimal(38,0)") * col("__n")).as("__ss"))
      .withColumn("gini_ppm",
        expr("CAST(1000000L - (1000000L * __ss) DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
      .drop("__ss")
      .orderBy("key")

  /** 2-D Pareto frontier (maximize both axes): the points no other
    * point weakly dominates with at least one strict improvement —
    * cost/quality trade-off curves, model leaderboards, supplier
    * price/volume skylines (Börzsönyi et al., ICDE'01 semantics).
    *
    * A point survives iff (a) its y strictly exceeds every y at
    * strictly larger x, and (b) its y is the maximum at its own x.
    * Exact duplicates of a frontier point all survive (nothing
    * dominates them strictly).
    *
    * Scale posture: rows collapse to an x-keyed (x, max y) aggregate
    * first; the strictly-larger-x running max then follows the
    * [[Relational.globalRank]] discipline — range exchange on x DESC,
    * per-partition running max, O(#partitions) offset maxima — never a
    * single-partition window over data. Survivors join back against
    * the full point set by (x, y) equality; the surviving-x side is
    * frontier-sized (AQE broadcasts it at sane frontier sizes).
    *
    * Output: `pid`, `x` LONG, `y` LONG — total order (x, pid).
    */
  def paretoFrontier2D(df: DataFrame, id: Column, x: Column,
                       y: Column): DataFrame = {
    val pts = df.select(id.as("pid"), x.cast("long").as("__x"),
        y.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    val perX = pts.groupBy(col("__x")).agg(max(col("__y")).as("__ymax"))
    val parted = perX.repartitionByRange(col("__x").desc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val offsets = parted.groupBy(col("__pid"))
      .agg(max(col("__ymax")).as("__pm"))
      .withColumn("__prev_best",
        max(col("__pm")).over(
          BoundedWindow.ordered(col("__pid"), col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pid"), col("__prev_best"))
    val wp = Window.partitionBy(col("__pid")).orderBy(col("__x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = parted.join(broadcast(offsets), "__pid")
      .withColumn("__above",
        greatest(
          coalesce(max(col("__ymax")).over(wp), lit(Long.MinValue)),
          coalesce(col("__prev_best"), lit(Long.MinValue))))
      .filter(col("__ymax") > col("__above"))
      .select(col("__x").as("__fx"), col("__ymax").as("__fy"))
    pts.join(frontier,
        col("__x") === col("__fx") && col("__y") === col("__fy"))
      .select(col("pid"), col("__x").as("x"), col("__y").as("y"))
      .orderBy("x", "pid")
  }

  /** Positional (U/W-shaped) multi-touch attribution: for every
    * conversion, split the credit over the entity's touches in the
    * preceding `windowUs` — 40% first touch, 40% last, 20% spread over
    * the middles — the marketing-analytics counterpart of the
    * streaming last-touch attributor (`streaming.Streams
    * .attributedPurchases`), answering "which first impressions START
    * journeys" where last-touch only sees closers.
    *
    * Credits are integer ppm and sum to EXACTLY 10⁶ per converted
    * conversion, deterministically: 1 touch → 10⁶; 2 → 500 000 each;
    * n ≥ 3 → last = 400 000, middles = 200 000 DIV (n−2) each, and the
    * FIRST touch takes 400 000 plus the middle-division dust
    * (200 000 − m·(n−2)) — truncation never leaks credit. Touches tie
    * on timestamp → ordered by touch id (total order). Conversions with
    * NO touch in window are emitted with a NULL touch and credit 0 —
    * the unattributable volume stays visible.
    *
    * Shape: one entity-keyed equi-join (conversions ⋈ touches) with
    * the window predicate as a post-join filter — fanout per
    * conversion is its in-window touch count, bounded by the window,
    * never the table — then ONE per-conversion window (rank + count
    * share its sort). Output: `entity`, `conversion_id`, `touch_id`
    * (NULL = unattributed), `touch_rank`, `n_touches`, `credit_ppm`;
    * total order (entity, conversion_id, touch_rank). */
  def attributionPositional(events: DataFrame, entity: Column,
                            eventId: Column, tsUs: Column,
                            eventType: Column, touchType: String,
                            conversionType: String,
                            windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be > 0")
    val base = events.select(entity.as("__e"), eventId.as("__id"),
        tsUs.cast("long").as("__t"), eventType.cast("string").as("__ty"))
      .filter(col("__e").isNotNull && col("__t").isNotNull)
    // distinct column names on the two sides — both frames descend from
    // `base`, so shared names would carry IDENTICAL attribute ids and
    // the join condition / drop would misresolve (the classic
    // self-join trap: drop(touch("__e")) removed conv's copy and
    // unmatched conversions surfaced with a NULL entity)
    val conv = base.filter(col("__ty") === conversionType)
      .select(col("__e"), col("__id").as("conversion_id"),
        col("__t").as("__ct"))
    val touch = base.filter(col("__ty") === touchType)
      .select(col("__e").as("__te"), col("__id").as("touch_id"),
        col("__t").as("__tt"))
    // the window predicate lives IN the join condition: a post-join
    // filter would silently drop conversions whose touches all fall
    // outside the window instead of emitting them unattributed
    val joined = conv.join(touch,
        col("__e") === col("__te") &&
          col("__tt") <= col("__ct") &&
          col("__tt") > col("__ct") - windowUs,
        "left")
      .drop("__te")
    val w = Window.partitionBy(col("__e"), col("conversion_id"))
      .orderBy(col("__tt").asc, col("touch_id").asc)
    joined
      .withColumn("touch_rank",
        when(col("touch_id").isNull, lit(0L))
          .otherwise(row_number().over(w).cast("long")))
      .withColumn("n_touches",
        count(col("touch_id")).over(
          Window.partitionBy(col("__e"), col("conversion_id"))))
      .withColumn("credit_ppm",
        when(col("touch_id").isNull, lit(0L))
          .when(col("n_touches") === 1, lit(1000000L))
          .when(col("n_touches") === 2,
            lit(500000L))
          .when(col("touch_rank") === col("n_touches"), lit(400000L))
          .when(col("touch_rank") === 1,
            lit(400000L) + lit(200000L)
              - expr("200000L DIV (n_touches - 2)") * (col("n_touches") - 2))
          .otherwise(expr("200000L DIV (n_touches - 2)")))
      .select(col("__e").as("entity"), col("conversion_id"), col("touch_id"),
        col("touch_rank"), col("n_touches"), col("credit_ppm"))
      .orderBy("entity", "conversion_id", "touch_rank")
  }

  /** RFM segmentation — the classic customer-value grid (recency /
    * frequency / monetary, each quintile-scored 1..5, best = 5) that
    * retention and growth-accounting dashboards drill into.
    *
    * Recency is measured against the OBSERVED max activity date (the
    * freshness-audit convention — wall-clock now() is nondeterministic
    * and untestable). Quintiles use the [[Relational.globalRank]]
    * range-exchange tiling (`((rank−1)·5) DIV n`, remainder tiles
    * first — the decileLift discipline, never an ntile() over a
    * single-partition global sort), one rank per dimension, entity id
    * as the universal tiebreak. Ranking orders put the BEST value in
    * tile 1 (most recent / most frequent / highest spend), so
    * score = 6 − tile.
    *
    * All integer: days via datediff, cents via exact DECIMAL(18,2)
    * sums, codes as r·100 + f·10 + m. Shape: one entity aggregate +
    * three range exchanges over the entity-count-sized frame + narrow
    * projections. Output: `entity`, `recency_days`, `frequency`,
    * `monetary_cents`, `r_score`, `f_score`, `m_score`, `rfm_code`
    * LONG; total order by entity. */
  def rfm(df: DataFrame, entity: Column, activityDate: Column,
          amountCents: Column): DataFrame = {
    val base = df
      .select(entity.cast("long").as("entity"),
        activityDate.cast("date").as("__d"),
        amountCents.cast("long").as("__a"))
      .filter(col("entity").isNotNull && col("__d").isNotNull)
    val perEntity = base.groupBy(col("entity"))
      .agg(max(col("__d")).as("__last"),
        count(lit(1)).as("frequency"),
        coalesce(sum(col("__a")), lit(0L)).as("monetary_cents"))
    val ref = broadcast(perEntity.agg(max(col("__last")).as("__ref")))
    val scored = perEntity.crossJoin(ref)
      .withColumn("recency_days",
        datediff(col("__ref"), col("__last")).cast("long"))
      .drop("__last", "__ref")
    // one range-exchange rank per dimension, tile 1 = best; the entity
    // count arrives as a one-row broadcast (never a window-over-all)
    val n = broadcast(scored.agg(count(lit(1)).as("__n_all")))
    def tiled(in: DataFrame, order: Seq[Column], out: String): DataFrame =
      Relational.globalRank(in.crossJoin(n), order)
        .withColumn(out,
          lit(6L) - (expr("((rank - 1) * 5L) DIV __n_all") + 1L))
        .drop("rank", "__n_all")
    val r = tiled(scored, Seq(col("recency_days").asc, col("entity").asc),
      "r_score")
    val f = tiled(r, Seq(col("frequency").desc, col("entity").asc), "f_score")
    val m = tiled(f, Seq(col("monetary_cents").desc, col("entity").asc),
      "m_score")
    m.select(col("entity"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
          .as("rfm_code"))
      .orderBy("entity")
  }

  /** Markov next-event backtest — does [[transitionMatrix]] actually
    * PREDICT? Train the first-order model on transitions completing
    * before `splitTs`, predict each later transition's next state as
    * the argmax next for its current state, and score hit@1 against
    * the majority-class baseline (always predict the train-globally
    * most frequent next state). The honest check that a transition
    * dashboard encodes structure, not just marginals — and the
    * TEMPORAL split is the point: a random split would leak future
    * behavior into the model.
    *
    * Determinism: a pair belongs to train iff its COMPLETING event's
    * order key is < splitTs; argmaxes tiebreak to the lexically
    * smallest state via struct order (total, engine-stable). Test
    * transitions whose current state never appeared in train count in
    * `n_unseen` and score as misses for the model (the baseline still
    * predicts) — visible, never silently skipped. All rates are
    * positive truncating ppm.
    *
    * Scale posture: ONE entity-keyed exchange builds all transitions;
    * train collapses to a states²-sized cell frame (argmax per state
    * via max(struct) — no window over rows); test joins that tiny
    * frame broadcast-style on the current state.
    *
    * Output (one row): `n_train`, `n_test`, `n_unseen`, `n_hits`,
    * `hit_ppm`, `n_base_hits`, `base_ppm`, `lift_ppm` LONG
    * (hit·10⁶ DIV base; NULL when base is 0).
    */
  def markovBacktest(events: DataFrame, entity: Column, orderTs: Column,
                     tieBreak: Column, state: Column,
                     splitTsUs: Long): DataFrame = {
    val w = Window.partitionBy(col("__e"))
      .orderBy(col("__t"), col("__tb"))
    val pairs = events
      .withColumn("__e", entity)
      .withColumn("__t", orderTs.cast("long"))
      .withColumn("__tb", tieBreak)
      .withColumn("__s", state.cast("string"))
      .filter(col("__e").isNotNull && col("__t").isNotNull)
      .withColumn("__prev", lag(col("__s"), 1).over(w))
      .filter(col("__prev").isNotNull && col("__s").isNotNull)
      .select(col("__prev").as("cur"), col("__s").as("nxt"),
        (col("__t") < splitTsUs).as("__train"))
    val trainCells = pairs.filter(col("__train"))
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("__n"))
    // per-state argmax: highest count, then lexically smallest next
    // min(struct(−n, next)): highest count, then lexically smallest
    val model = trainCells.groupBy(col("cur"))
      .agg(min(struct((-col("__n")).as("n"), col("nxt").as("p")))
        .getField("p").as("pred"))
    val baseline = trainCells.groupBy(col("nxt"))
      .agg(sum(col("__n")).as("__n"))
      .agg(min(struct((-col("__n")).as("n"), col("nxt").as("p")))
        .getField("p").as("base_pred"))
    val nTrain = pairs.agg(coalesce(sum(when(col("__train"), 1L)
      .otherwise(0L)), lit(0L)).as("n_train"))
    val test = pairs.filter(!col("__train"))
      .join(broadcast(model.withColumnRenamed("cur", "__mc")),
        col("cur") === col("__mc"), "left_outer")
      .crossJoin(broadcast(baseline))
    test.agg(
        count(lit(1)).as("n_test"),
        coalesce(sum(when(col("pred").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_unseen"),
        coalesce(sum(when(col("pred") === col("nxt"), 1L)
          .otherwise(0L)), lit(0L)).as("n_hits"),
        coalesce(sum(when(col("base_pred") === col("nxt"), 1L)
          .otherwise(0L)), lit(0L)).as("n_base_hits"))
      .crossJoin(nTrain)
      .withColumn("hit_ppm",
        when(col("n_test") > 0L, expr("(n_hits * 1000000L) DIV n_test")))
      .withColumn("base_ppm",
        when(col("n_test") > 0L,
          expr("(n_base_hits * 1000000L) DIV n_test")))
      .withColumn("lift_ppm",
        when(col("n_base_hits") > 0L,
          expr("(n_hits * 1000000L) DIV n_base_hits")))
      .select(col("n_train"), col("n_test"), col("n_unseen"),
        col("n_hits"), col("hit_ppm"), col("n_base_hits"),
        col("base_ppm"), col("lift_ppm"))
  }

  /** Difference-in-differences — the quasi-experimental readout when a
    * change hits one group mid-stream and there was never a randomized
    * control: the treated group's pre→post shift, net of the control
    * group's shift over the same periods,
    *
    *   DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)
    *
    * (parallel-trends is the caller's modeling assumption; this
    * operator owns the exact arithmetic and the audit surface). Values
    * are required NON-NEGATIVE with visible drops (`n_dropped`) so
    * every cell mean is a positive truncating micro-quotient — the
    * [[Sampling.randomizationTest]] trunc/floor posture; DiD is then a
    * difference of exact longs, and NULL when any of the four cells is
    * empty (a one-sided design has no DiD — never a fake 0).
    *
    * Scale posture: ONE map-side-combined aggregate collapses the
    * corpus to the 2×2 cell counts; everything after is one-row
    * arithmetic.
    *
    * Output (one row): `n_t_pre`, `sum_t_pre`, `n_t_post`,
    * `sum_t_post`, `n_c_pre`, `sum_c_pre`, `n_c_post`, `sum_c_post`,
    * `n_dropped` LONG, `did_micro` LONG-or-NULL.
    */
  def diffInDiff(df: DataFrame, treated: Column, post: Column,
                 value: Column): DataFrame = {
    val all = df.select(treated.cast("boolean").as("__t"),
        post.cast("boolean").as("__p"), value.cast("long").as("__v"))
      .filter(col("__t").isNotNull && col("__p").isNotNull &&
        col("__v").isNotNull)
    def cell(t: Boolean, p: Boolean, suffix: String): Seq[Column] = {
      val in = col("__t") === t && col("__p") === p && col("__v") >= 0L
      Seq(
        coalesce(sum(when(in, 1L).otherwise(0L)), lit(0L))
          .as(s"n_$suffix"),
        coalesce(sum(when(in, col("__v")).otherwise(0L)), lit(0L))
          .as(s"sum_$suffix"))
    }
    val aggs = cell(true, false, "t_pre") ++ cell(true, true, "t_post") ++
      cell(false, false, "c_pre") ++ cell(false, true, "c_post") :+
      coalesce(sum(when(col("__v") < 0L, 1L).otherwise(0L)), lit(0L))
        .as("n_dropped")
    def mean(s: String): String =
      s"(CAST(sum_$s AS DECIMAL(38,0)) * 1000000) DIV n_$s"
    all.agg(aggs.head, aggs.tail: _*)
      .withColumn("did_micro",
        when(col("n_t_pre") > 0L && col("n_t_post") > 0L &&
            col("n_c_pre") > 0L && col("n_c_post") > 0L,
          expr(s"(CAST(${mean("t_post")} AS BIGINT) " +
            s"- CAST(${mean("t_pre")} AS BIGINT)) " +
            s"- (CAST(${mean("c_post")} AS BIGINT) " +
            s"- CAST(${mean("c_pre")} AS BIGINT))")))
      .select(col("n_t_pre"), col("sum_t_pre"), col("n_t_post"),
        col("sum_t_post"), col("n_c_pre"), col("sum_c_pre"),
        col("n_c_post"), col("sum_c_post"), col("n_dropped"),
        col("did_micro"))
  }
}
