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

    val w = Window.orderBy(col("stage_idx"))
    counts
      .withColumn("__prev", lag(col("n_users"), 1).over(w))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        when(col("__prev").isNull, lit(1.0))
          .when(col("__prev") === 0, lit(0.0))
          .otherwise(floor(col("n_users").cast("double") / col("__prev") * 10000 + 0.5) / 10000)
          .as("pct_of_prev"))
      .orderBy("stage_idx")
  }
}
