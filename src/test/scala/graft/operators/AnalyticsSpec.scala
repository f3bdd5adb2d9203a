package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.{Date, Timestamp}

import graft.SharedSpark

/** Cohort retention + funnel semantics on hand-built event fixtures. */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("retention: cohorts by first week, offsets count distinct active users") {
    // u1 first active wk of Jan-01 (Mon), again wk of Jan-08 and Jan-15;
    // u2 first active wk of Jan-01 only; u3 first active wk of Jan-08.
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-09 10:00:00")), (1L, ts("2024-01-16 10:00:00")),
      (2L, ts("2024-01-04 10:00:00")),
      (3L, ts("2024-01-10 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Analytics.retention(ev, col("user_id"), col("ts"))
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0, 2L, 1.0),   // u1,u2
      ("2024-01-01", 1, 1L, 0.5),   // u1
      ("2024-01-01", 2, 1L, 0.5),   // u1
      ("2024-01-08", 0, 1L, 1.0)))  // u3 (u1 belongs to the earlier cohort)
  }

  test("retention: duplicate events in one week count a user once") {
    val ev = Seq(
      (1L, ts("2024-01-02 10:00:00")), (1L, ts("2024-01-02 11:00:00")),
      (1L, ts("2024-01-05 10:00:00"))
    ).toDF("user_id", "ts")
    val out = Analytics.retention(ev, col("user_id"), col("ts")).collect()
    assert(out.length === 1 && out(0).getLong(2) === 1L)
  }

  test("funnel: strictly-after ordering — pre-stage events don't convert") {
    // u1 completes view→click→purchase in order;
    // u2 clicks BEFORE its first view (doesn't count), never re-clicks;
    // u3 views only; u4 view→click but purchase precedes the click.
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click"),
      (1L, ts("2024-01-01 11:00:00"), "purchase"),
      (2L, ts("2024-01-01 08:00:00"), "click"),
      (2L, ts("2024-01-01 09:00:00"), "view"),
      (3L, ts("2024-01-01 09:00:00"), "view"),
      (4L, ts("2024-01-01 09:00:00"), "view"),
      (4L, ts("2024-01-01 10:30:00"), "purchase"),
      (4L, ts("2024-01-01 11:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1, "view", 4L, 1.0),
      (2, "click", 2L, 0.5),      // u1, u4
      (3, "purchase", 1L, 0.5)))  // u1 only: u4's purchase precedes its click
  }

  test("funnel: equal timestamps do NOT advance (strict >)") {
    val ev = Seq(
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-01 09:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val out = Analytics.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click")).collect().map(r => r.getLong(2))
    assert(out.toSeq === Seq(1L, 0L))
  }

  test("funnel: zero-user middle stage yields 0.0 conversion downstream, not NULL") {
    val ev = Seq((1L, ts("2024-01-01 09:00:00"), "view")).toDF("user_id", "ts", "event_type")
    val out = Analytics.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 1.0), (0L, 0.0), (0L, 0.0)))
  }
}
