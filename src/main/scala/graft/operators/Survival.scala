package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis with right-censoring — the readout retention curves
  * fake by ignoring censoring: of the users who COULD have churned by
  * day t, what share survived? A user last seen near the data's edge
  * hasn't churned, they're CENSORED — counting them as survivors
  * overstates retention, as deaths understates it; Kaplan–Meier is the
  * standard estimator that does neither (Kaplan & Meier '58).
  */
object Survival {

  /** Kaplan–Meier product-limit estimator. Input: one row per subject
    * with `duration` (time-to-event-or-censoring, any integer unit —
    * BUCKET CONTINUOUS DURATIONS FIRST, e.g. to days: the step frame is
    * sized by |distinct durations| and a µs-grained duration would make
    * every subject its own step) and `observed` (true = the event
    * happened at `duration`; false = censored then).
    *
    *   S(t) = Π_{tᵢ ≤ t, events} (1 − dᵢ/nᵢ)
    *
    * with nᵢ = subjects still at risk entering tᵢ and dᵢ = events at tᵢ.
    *
    * Determinism: the product is carried as the cumulative SUM of
    * per-step floor-micro-quantized ln(1 − d/n) terms — integer `log_s_upm`
    * is the exact audit surface (order-free per step, cumulated in time
    * order), and `surv_ppm` is ONE pinned IEEE exp of that integer. A
    * step that kills everyone (d = n) has ln 0 = −∞: its `ln_q_upm` is
    * NULL and survival snaps to exactly 0 from that step on (never a
    * fake large-negative float).
    *
    * Scale posture: one (duration)-keyed aggregate (map-side combined),
    * then the at-risk suffix counts AND both cumulative sums ride ONE
    * range exchange on the step frame — per-partition prefix sums plus
    * an O(#partitions) broadcast offsets cumsum, the
    * [[Relational.globalRank]] discipline; no row-scaled global window
    * anywhere. Output (event steps only, censoring-only times fold into
    * the next step's risk decrement): `t` LONG, `n_risk`, `n_events`,
    * `n_censored` LONG (censored AT t), `log_s_upm` LONG (NULL once
    * survival is exactly 0), `surv_ppm` LONG; total order by t. */
  def kaplanMeier(df: DataFrame, duration: Column,
                  observed: Column): DataFrame = {
    val base = df.select(duration.cast("long").as("__d"),
        observed.cast("boolean").as("__o"))
      .filter(col("__d").isNotNull && col("__o").isNotNull)
    val totals = base.agg(count(lit(1)).as("__N"))
    val perT = base.groupBy(col("__d"))
      .agg(coalesce(sum(when(col("__o"), 1L).otherwise(0L)), lit(0L))
          .as("n_events"),
        coalesce(sum(when(!col("__o"), 1L).otherwise(0L)), lit(0L))
          .as("n_censored"))
    // ONE range exchange carries every cumulative this estimator needs
    // staged on DISK ([[Lifecycle.diskRound]]): the returned plan reads
    // this frame lazily through several windows — it must be
    // recomputable (a re-readable file), not an evictable
    // non-recomputable local-checkpoint block (the r12 q293 flap)
    val parted = Lifecycle.diskRound(perT.repartitionByRange(col("__d"))
      .withColumn("__pid", spark_partition_id()))
    val wRun = Window.partitionBy(col("__pid")).orderBy(col("__d"))
    val wBefore = wRun.rowsBetween(Window.unboundedPreceding, -1)
    val wIncl = wRun.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    // at-risk entering t: N − (events + censored strictly before t)
    val staged = parted.crossJoin(broadcast(totals))
      .withColumn("__gone_in",
        coalesce(sum(col("n_events") + col("n_censored")).over(wBefore),
          lit(0L)))
    val goneOffsets = parted.groupBy(col("__pid"))
      .agg(coalesce(sum(col("n_events") + col("n_censored")), lit(0L))
        .as("__pg"))
      .withColumn("__goff",
        coalesce(sum(col("__pg")).over(BoundedWindow.ordered(col("__pid"), col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__goff"))
    val withRisk = staged.join(broadcast(goneOffsets), "__pid")
      .withColumn("n_risk", col("__N") - col("__goff") - col("__gone_in"))
      // per-step quantized ln(1 − d/n); 0 on non-event rows so the
      // cumulative can ride the SAME partitioning; NULL marks d = n
      .withColumn("__lnq",
        when(col("n_events") === 0L, lit(0L))
          .when(col("n_events") < col("n_risk"),
            floor(log((col("n_risk") - col("n_events")).cast("double") /
              col("n_risk")) * 1000000L + 0.5).cast("long")))
      .withColumn("__zero",
        when(col("n_events") > 0L && col("n_events") === col("n_risk"),
          1L).otherwise(0L))
    val lnOffsets = withRisk.groupBy(col("__pid"))
      .agg(coalesce(sum(col("__lnq")), lit(0L)).as("__pl"),
        coalesce(sum(col("__zero")), lit(0L)).as("__pz"))
      .withColumn("__loff",
        coalesce(sum(col("__pl")).over(BoundedWindow.ordered(col("__pid"), col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__zoff",
        coalesce(sum(col("__pz")).over(BoundedWindow.ordered(col("__pid"), col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__loff"), col("__zoff"))
    withRisk.join(broadcast(lnOffsets), "__pid")
      .withColumn("__zeroSeen",
        col("__zoff") + coalesce(sum(col("__zero")).over(wIncl), lit(0L)))
      .withColumn("__logS",
        col("__loff") + coalesce(sum(col("__lnq")).over(wIncl), lit(0L)))
      .filter(col("n_events") > 0L)
      .withColumn("log_s_upm",
        when(col("__zeroSeen") === 0L, col("__logS")))
      .withColumn("surv_ppm",
        when(col("__zeroSeen") > 0L, lit(0L))
          .otherwise(floor(
            exp(col("__logS").cast("double") / 1000000.0) * 1000000L
              + 0.5).cast("long")))
      .select(col("__d").as("t"), col("n_risk"), col("n_events"),
        col("n_censored"), col("log_s_upm"), col("surv_ppm"))
      .orderBy("t")
  }

  /** Nelson–Aalen cumulative-hazard estimator (Nelson '72, Aalen '78)
    * — [[kaplanMeier]]'s additive sibling: instead of multiplying
    * survival fractions it SUMS hazard increments,
    *
    *   H(t) = Σ_{tᵢ ≤ t, events} dᵢ/nᵢ
    *
    * which is the estimator of choice when hazards are the object
    * (comparing failure INTENSITY between cohorts, feeding a Cox
    * baseline) and is numerically tamer: a step that kills everyone
    * adds a finite dᵢ/nᵢ = 1 instead of KM's ln 0. The Breslow
    * survival S(t) = exp(−H(t)) is published alongside — it never
    * snaps to exact 0, consistent with the estimator.
    *
    * Determinism beats KM's: each increment is the EXACT integer
    * truncation (10⁶·d) DIV n — no float anywhere in the hazard path;
    * the cumulative is a sum of longs in time order, and only
    * `surv_ppm` ends with ONE pinned IEEE exp of that integer (the KM
    * exp precedent).
    *
    * Scale posture: identical to KM — one (duration)-keyed map-side-
    * combined aggregate, then at-risk suffix counts and the hazard
    * cumulative ride ONE range exchange on the step frame
    * (per-partition prefix sums + an O(#partitions) broadcast offsets
    * cumsum, the [[Relational.globalRank]] discipline). Output (event
    * steps only): `t` LONG, `n_risk`, `n_events`, `n_censored` LONG,
    * `haz_inc_upm` LONG (this step's (10⁶·d) DIV n), `cum_haz_upm`
    * LONG, `surv_ppm` LONG (Breslow); total order by t. */
  def nelsonAalen(df: DataFrame, duration: Column,
                  observed: Column): DataFrame = {
    val base = df.select(duration.cast("long").as("__d"),
        observed.cast("boolean").as("__o"))
      .filter(col("__d").isNotNull && col("__o").isNotNull)
    val totals = base.agg(count(lit(1)).as("__N"))
    val perT = base.groupBy(col("__d"))
      .agg(coalesce(sum(when(col("__o"), 1L).otherwise(0L)), lit(0L))
          .as("n_events"),
        coalesce(sum(when(!col("__o"), 1L).otherwise(0L)), lit(0L))
          .as("n_censored"))
    // staged on DISK ([[Lifecycle.diskRound]]): the returned plan reads
    // this frame lazily through several windows — it must be
    // recomputable (a re-readable file), not an evictable
    // non-recomputable local-checkpoint block (the r12 q293 flap)
    val parted = Lifecycle.diskRound(perT.repartitionByRange(col("__d"))
      .withColumn("__pid", spark_partition_id()))
    val wRun = Window.partitionBy(col("__pid")).orderBy(col("__d"))
    val wBefore = wRun.rowsBetween(Window.unboundedPreceding, -1)
    val wIncl = wRun.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val staged = parted.crossJoin(broadcast(totals))
      .withColumn("__gone_in",
        coalesce(sum(col("n_events") + col("n_censored")).over(wBefore),
          lit(0L)))
    val goneOffsets = parted.groupBy(col("__pid"))
      .agg(coalesce(sum(col("n_events") + col("n_censored")), lit(0L))
        .as("__pg"))
      .withColumn("__goff",
        coalesce(sum(col("__pg")).over(BoundedWindow.ordered(col("__pid"), col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__goff"))
    val withRisk = staged.join(broadcast(goneOffsets), "__pid")
      .withColumn("n_risk", col("__N") - col("__goff") - col("__gone_in"))
      // exact integer hazard increment; 0 on censor-only rows so the
      // cumulative rides the SAME partitioning
      .withColumn("__h",
        when(col("n_events") === 0L, lit(0L))
          .otherwise(expr("(1000000L * n_events) DIV n_risk")))
    val hazOffsets = withRisk.groupBy(col("__pid"))
      .agg(coalesce(sum(col("__h")), lit(0L)).as("__ph"))
      .withColumn("__hoff",
        coalesce(sum(col("__ph")).over(BoundedWindow.ordered(col("__pid"), col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__hoff"))
    withRisk.join(broadcast(hazOffsets), "__pid")
      .withColumn("cum_haz_upm",
        col("__hoff") + coalesce(sum(col("__h")).over(wIncl), lit(0L)))
      .filter(col("n_events") > 0L)
      .withColumn("surv_ppm",
        floor(exp(col("cum_haz_upm").cast("double") / -1000000.0) *
          1000000L + 0.5).cast("long"))
      .select(col("__d").as("t"), col("n_risk"), col("n_events"),
        col("n_censored"), col("__h").as("haz_inc_upm"),
        col("cum_haz_upm"), col("surv_ppm"))
      .orderBy("t")
  }

  /** Log-rank (Mantel–Cox) test — "do cohorts A and B have the SAME
    * survival curve?": the hypothesis test [[kaplanMeier]] draws the
    * picture for. Under H₀, group A's expected events at each event
    * time t are d_t·n1_t/n_t (its share of the risk set); the statistic
    * accumulates observed−expected with the hypergeometric variance:
    *
    *   e1 at t:  (d_t·n1_t·10⁶) DIV n_t
    *   v  at t:  (d_t·n1_t·(n_t−n1_t)·(n_t−d_t)·10⁶)
    *               DIV (n_t²·(n_t−1))            (0 when n_t = 1)
    *   z = (o1·10⁶ − Σe1) / (1000·√(Σv))
    *
    * Every per-step term is a truncating quotient of exact POSITIVE
    * integers (DECIMAL(38,0)-widened products — n_t³-scale operands),
    * summed order-free; z is one pinned IEEE sequence (sqrt → mul →
    * div), NULL when Σv = 0 (no comparable event step — never ±∞).
    *
    * Scale posture: [[kaplanMeier]]'s exactly — one (duration)-keyed
    * map-side-combined aggregate carrying per-GROUP event/censor
    * counts, then both groups' at-risk suffix counts ride ONE range
    * exchange (per-partition prefix sums + O(#partitions) broadcast
    * offsets). Bucket continuous durations first, same contract as KM.
    * Rows with NULL duration/side/observed are dropped (bucket upstream
    * or gate with KM's quarantine).
    *
    * Output (one row): `n_a`, `n_b`, `o_a`, `o_b` LONG (subjects and
    * observed events per side), `e_a_micro`, `var_micro` LONG,
    * `z` DOUBLE-or-NULL.
    */
  def logRank(df: DataFrame, sideA: Column, duration: Column,
              observed: Column): DataFrame = {
    val base = df.select(sideA.cast("boolean").as("__a"),
        duration.cast("long").as("__d"),
        observed.cast("boolean").as("__o"))
      .filter(col("__a").isNotNull && col("__d").isNotNull &&
        col("__o").isNotNull)
    val totals = base.agg(
      coalesce(sum(when(col("__a"), 1L).otherwise(0L)), lit(0L)).as("n_a"),
      coalesce(sum(when(!col("__a"), 1L).otherwise(0L)), lit(0L)).as("n_b"))
    val perT = base.groupBy(col("__d"))
      .agg(
        coalesce(sum(when(col("__a") && col("__o"), 1L).otherwise(0L)),
          lit(0L)).as("__d1"),
        coalesce(sum(when(col("__a") && !col("__o"), 1L).otherwise(0L)),
          lit(0L)).as("__c1"),
        coalesce(sum(when(!col("__a") && col("__o"), 1L).otherwise(0L)),
          lit(0L)).as("__d2"),
        coalesce(sum(when(!col("__a") && !col("__o"), 1L).otherwise(0L)),
          lit(0L)).as("__c2"))
    // staged on DISK ([[Lifecycle.diskRound]]): the returned plan reads
    // this frame lazily through several windows — it must be
    // recomputable (a re-readable file), not an evictable
    // non-recomputable local-checkpoint block (the r12 q293 flap)
    val parted = Lifecycle.diskRound(perT.repartitionByRange(col("__d"))
      .withColumn("__pid", spark_partition_id()))
    val wBefore = Window.partitionBy(col("__pid")).orderBy(col("__d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = parted.groupBy(col("__pid"))
      .agg(coalesce(sum(col("__d1") + col("__c1")), lit(0L)).as("__p1"),
        coalesce(sum(col("__d2") + col("__c2")), lit(0L)).as("__p2"))
      .withColumn("__off1",
        coalesce(sum(col("__p1")).over(BoundedWindow.ordered(col("__pid"), col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__off2",
        coalesce(sum(col("__p2")).over(BoundedWindow.ordered(col("__pid"), col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off1"), col("__off2"))
    val steps = parted.join(broadcast(offsets), "__pid")
      .crossJoin(broadcast(totals))
      .withColumn("__n1", col("n_a") - col("__off1") -
        coalesce(sum(col("__d1") + col("__c1")).over(wBefore), lit(0L)))
      .withColumn("__n2", col("n_b") - col("__off2") -
        coalesce(sum(col("__d2") + col("__c2")).over(wBefore), lit(0L)))
      .filter(col("__d1") + col("__d2") > 0L)
      .withColumn("__n", col("__n1") + col("__n2"))
      .withColumn("__dt", col("__d1") + col("__d2"))
      .withColumn("__e1", expr(
        """(CAST(__dt AS DECIMAL(38,0)) * __n1 * 1000000) DIV __n"""))
      .withColumn("__v",
        when(col("__n") > 1L, expr(
          """(CAST(__dt AS DECIMAL(38,0)) * __n1 * (__n - __n1) *
            | (__n - __dt) * 1000000)
            | DIV (CAST(__n AS DECIMAL(38,0)) * __n * (__n - 1))"""
            .stripMargin)).otherwise(0L))
    steps
      .agg(
        coalesce(sum(col("__d1")), lit(0L)).as("o_a"),
        coalesce(sum(col("__d2")), lit(0L)).as("o_b"),
        coalesce(sum(col("__e1")), lit(0L)).as("e_a_micro"),
        coalesce(sum(col("__v")), lit(0L)).as("var_micro"))
      .crossJoin(broadcast(totals))
      .withColumn("z",
        when(col("var_micro") > 0L,
          (col("o_a") * 1000000L - col("e_a_micro")).cast("double") /
            (sqrt(col("var_micro").cast("double")) * 1000.0)))
      .select(col("n_a"), col("n_b"), col("o_a"), col("o_b"),
        col("e_a_micro"), col("var_micro"), col("z"))
  }

  /** Cumulative incidence under COMPETING risks (Aalen–Johansen) — the
    * estimator for "what share will hit event TYPE k by time t when
    * other event types remove subjects first": churn vs conversion,
    * error vs completion. The naive per-type KM (censoring the other
    * types) OVERSTATES every curve — the type-k incidence can only
    * claim subjects still event-free of everything,
    *
    *   CIF_k(t) = Σ_{tᵢ ≤ t} S(tᵢ⁻) · d_{k,i} / nᵢ
    *
    * with S the ALL-CAUSE Kaplan–Meier. Sanity property the spec pins:
    * Σ_k CIF_k(∞) + S(∞) = 1 (every subject ends somewhere).
    *
    * Determinism: S(t⁻) is [[kaplanMeier]]'s published pinned-exp
    * integer of the PREVIOUS event step (10⁶ before the first); each
    * increment is then the exact positive quotient
    * (surv_prev_ppm · d_k) DIV n_risk in micro-ppm units, and the CIF
    * is a cumulative sum of longs in time order — no new float
    * anywhere.
    *
    * Scale posture: KM's range-exchange staging + one (duration, type)
    * cells aggregate joined on the steps frame; the prev-step lag and
    * per-type cumulative run on the STEPS frame (bucket durations
    * first — KM's contract). `event` NULL means censored.
    *
    * Output (one row per (event step, type)): `t` LONG, `event`,
    * `n_risk`, `n_type_events` LONG, `surv_prev_ppm`, `inc_upm`,
    * `cif_upm` LONG — total order (event, t).
    */
  def cumulativeIncidence(df: DataFrame, duration: Column,
                          event: Column): DataFrame = {
    val base = df.select(duration.cast("long").as("__d"),
        event.cast("string").as("__e"))
      .filter(col("__d").isNotNull)
    val km = kaplanMeier(base, col("__d"), col("__e").isNotNull)
    // steps-frame windows by KM's bucketing contract
    val wPrev = BoundedWindow.ordered(col("t"), col("t"))
    val steps = km.select(col("t"), col("n_risk"), col("surv_ppm"))
      .withColumn("surv_prev_ppm",
        coalesce(lag(col("surv_ppm"), 1).over(wPrev), lit(1000000L)))
    val cells = base.filter(col("__e").isNotNull)
      .groupBy(col("__d").as("t"), col("__e").as("event"))
      .agg(count(lit(1)).as("n_type_events"))
    val wCum = Window.partitionBy(col("event")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(steps, Seq("t"))
      .withColumn("inc_upm",
        expr("(surv_prev_ppm * n_type_events) DIV n_risk"))
      .withColumn("cif_upm", sum(col("inc_upm")).over(wCum))
      .select(col("t"), col("event"), col("n_risk"),
        col("n_type_events"), col("surv_prev_ppm"), col("inc_upm"),
        col("cif_upm"))
      .orderBy(col("event"), col("t"))
  }

  /** Restricted mean survival time — the AREA under the [[kaplanMeier]]
    * curve up to a horizon τ: "expected event-free time within the
    * first τ units", the one-number summary medians can't give when
    * survival never crosses 50% and hazard ratios can't give when
    * curves cross (Royston & Parmar '13). For retention: expected
    * active days per user in their first τ days.
    *
    *   RMST(τ) = ∫₀^τ S(t) dt = Σ_steps S(tᵢ)·(min(tᵢ₊₁, τ) − tᵢ)
    *
    * with S = 1 on [0, t₁). Exact integers on top of KM's published
    * `surv_ppm` longs: each segment contributes surv_ppm·width, so
    * `rmst_time_ppm` = RMST·10⁶ in duration units with NO new float —
    * the only libm in the chain stays KM's one pinned exp per step.
    *
    * Scale posture: [[kaplanMeier]]'s range-exchange staging does the
    * heavy lifting; the segment-width lead() and the final sum run on
    * the STEPS frame (|distinct event durations| — bucket durations
    * first, KM's own contract), one documented steps-sized window.
    *
    * Output (one row): `horizon`, `n_steps`, `n_subjects`,
    * `rmst_time_ppm` LONG (RMST·10⁶), `mean_surv_ppm` LONG
    * (= rmst_time_ppm DIV τ — time-averaged survival).
    */
  def rmst(df: DataFrame, duration: Column, observed: Column,
           horizon: Long): DataFrame = {
    require(horizon >= 1L, s"horizon must be >= 1, got $horizon")
    val subjects = df.select(duration.cast("long").as("__d"),
        observed.cast("boolean").as("__o"))
      .filter(col("__d").isNotNull && col("__o").isNotNull)
    val nSub = subjects.agg(count(lit(1)).as("n_subjects"))
    val km = kaplanMeier(subjects, col("__d"), col("__o"))
    // steps-sized frame by KM's bucketing contract: the single window
    // is over |distinct event durations| rows, never subjects
    val w = BoundedWindow.ordered(col("t"), col("t"))
    val segs = km
      .withColumn("__tnext",
        coalesce(lead(col("t"), 1).over(w), lit(horizon)))
      .filter(col("t") < horizon)
      .withColumn("__width",
        least(col("__tnext"), lit(horizon)) - col("t"))
      .agg(count(lit(1)).as("n_steps"),
        coalesce(sum(col("surv_ppm") * col("__width")), lit(0L))
          .as("__area"),
        coalesce(min(col("t")), lit(horizon)).as("__t1"))
    // the pre-first-event segment [0, min(t1, horizon)) at S = 1; when
    // no step falls below the horizon the whole area is that segment
    segs.crossJoin(nSub)
      .withColumn("rmst_time_ppm",
        least(col("__t1"), lit(horizon)) * 1000000L + col("__area"))
      .withColumn("mean_surv_ppm",
        expr(s"rmst_time_ppm DIV ${horizon}L"))
      .select(lit(horizon).as("horizon"), col("n_steps"),
        col("n_subjects"), col("rmst_time_ppm"), col("mean_surv_ppm"))
  }
}
