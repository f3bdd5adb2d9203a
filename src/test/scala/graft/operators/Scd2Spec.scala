package graft.operators

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

class Scd2Spec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  private def dim0 = {
    import spark.implicits._
    Scd2.initialize(
      Seq((1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
        .toDF("id", "name", "score"),
      lit("2024-01-01 00:00:00"))
  }

  test("merge: changed closes + inserts, unchanged and untouched stay, new key inserts") {
    import spark.implicits._
    val updates = Seq(
      (1L, "alice", 11.0),  // changed → close + new version
      (2L, "bob", 20.0),    // identical → no new version
      (9L, "zoe", 90.0)     // new key → insert
    ).toDF("id", "name", "score")
    val out = Scd2.merge(dim0, updates, Seq("id"), Seq("name", "score"),
      lit("2024-06-01 00:00:00"))
    val rows = out.orderBy("id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getTimestamp(3), r.getTimestamp(4), r.getBoolean(5)))

    assert(rows.length === 5)
    // id=1: closed old + new current
    assert(rows(0) === ((1L, "alice", 10.0, ts("2024-01-01 00:00:00"),
      ts("2024-06-01 00:00:00"), false)))
    assert(rows(1) === ((1L, "alice", 11.0, ts("2024-06-01 00:00:00"), null, true)))
    // id=2 (identical update) and id=3 (absent) unchanged
    assert(rows(2) === ((2L, "bob", 20.0, ts("2024-01-01 00:00:00"), null, true)))
    assert(rows(3) === ((3L, "carol", 30.0, ts("2024-01-01 00:00:00"), null, true)))
    // id=9 inserted as current
    assert(rows(4) === ((9L, "zoe", 90.0, ts("2024-06-01 00:00:00"), null, true)))
  }

  test("merge is idempotent: replaying the same batch adds no versions") {
    import spark.implicits._
    val updates = Seq((1L, "alice", 11.0)).toDF("id", "name", "score")
    val once = Scd2.merge(dim0, updates, Seq("id"), Seq("name", "score"),
      lit("2024-06-01 00:00:00"))
    val twice = Scd2.merge(once, updates, Seq("id"), Seq("name", "score"),
      lit("2024-07-01 00:00:00"))
    assert(twice.count() === once.count())
    // and history rows pass through byte-identical
    val hist = twice.filter(!col("is_current")).collect()
    assert(hist.length === 1 && hist.head.getTimestamp(4) === ts("2024-06-01 00:00:00"))
  }

  test("asOf: range predicate returns the version in effect") {
    import spark.implicits._
    val updates = Seq((1L, "alice", 11.0)).toDF("id", "name", "score")
    val dim = Scd2.merge(dim0, updates, Seq("id"), Seq("name", "score"),
      lit("2024-06-01 00:00:00"))
    val before = Scd2.asOf(dim, lit("2024-03-01 00:00:00"))
      .filter(col("id") === 1).collect().head
    assert(before.getDouble(2) === 10.0)
    val after = Scd2.asOf(dim, lit("2024-06-01 00:00:00"))
      .filter(col("id") === 1).collect().head
    assert(after.getDouble(2) === 11.0)
    // every key resolves to exactly one version at any time
    assert(Scd2.asOf(dim, lit("2024-03-01 00:00:00")).count() === 3)
    assert(Scd2.asOf(dim, lit("2024-08-01 00:00:00")).count() === 3)
  }

  test("null-safe change detection: null → value and value → null both version") {
    import spark.implicits._
    val d0 = Scd2.initialize(
      Seq((1L, Option.empty[String]), (2L, Option("x"))).toDF("id", "tag"),
      lit("2024-01-01 00:00:00"))
    val updates = Seq((1L, Option("y")), (2L, Option.empty[String])).toDF("id", "tag")
    val out = Scd2.merge(d0, updates, Seq("id"), Seq("tag"),
      lit("2024-06-01 00:00:00"))
    assert(out.count() === 4) // both keys versioned
    assert(out.filter(col("is_current")).count() === 2)
  }
}
