package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

class ProfileSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("profile: one row per column with exact stats, nulls counted, type-aware fields") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("ab")),
      (2L, None, Some("abcd")),
      (2L, Some(7.5), None)
    ).toDF("id", "score", "tag")
    val rep = Profile.profile(df, Seq("id", "score", "tag"))
      .collect().map(r => r.getString(0) -> r).toMap
    val id = rep("id")
    assert(id.getLong(1) === 3 && id.getLong(2) === 0 && id.getLong(3) === 2)
    assert(id.getDouble(4) === 1.0 && id.getDouble(5) === 2.0)
    assert(id.isNullAt(6)) // avg_len only for strings
    val score = rep("score")
    assert(score.getLong(2) === 1 && score.getLong(3) === 2)
    assert(score.getDouble(4) === 2.5 && score.getDouble(5) === 7.5)
    val tag = rep("tag")
    assert(tag.getLong(2) === 1 && tag.getLong(3) === 2)
    assert(tag.isNullAt(4) && tag.isNullAt(5))
    assert(tag.getDouble(6) === 3.0) // (2+4)/2
  }

  test("profile runs as ONE aggregate over one scan") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val plan = Profile.profile(df, Seq("id", "s")).queryExecution.optimizedPlan
    // multiple exact countDistincts rewrite to Expand + a two-level
    // aggregate — that's still ONE pass; the claim to pin is one LEAF
    // (no per-column self-scans or joins)
    assert(plan.collectLeaves().size === 1, s"expected one scan, got:\n$plan")
  }

  test("histogram: exact bucket counts, clamping, conservation") {
    import spark.implicits._
    val df = (0 until 100).map(_.toDouble).toDF("x")
    val h = Profile.histogram(df, $"x", 0.0, 100.0, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(h === Map(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 25L))
    // out-of-range values clamp into the end buckets; counts conserve
    val h2 = Profile.histogram(df, $"x", 25.0, 75.0, 2).collect()
    assert(h2.map(_.getLong(3)).sum === 100)
    assert(h2.find(_.getLong(0) === 0L).get.getLong(3) === 50) // 0..49
    assert(h2.find(_.getLong(0) === 1L).get.getLong(3) === 50) // 50..99
  }
}
