package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark
import graft.sources.Tables
import graft.operators.Relational

/** The native as-of operator must agree exactly with the composed
  * union+window reference on real and adversarial data, and must actually
  * plan through AsOfJoinExec. */
class AsOfJoinPlanSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  def viaNative(clicks: org.apache.spark.sql.DataFrame,
                purchases: org.apache.spark.sql.DataFrame) =
    AsOf.join(clicks, purchases, Seq("user_id"), "ts", "p_ts")
      .select("event_id", "user_id", "ts", "p_value")

  def viaComposed(clicks: org.apache.spark.sql.DataFrame,
                  purchases: org.apache.spark.sql.DataFrame) =
    Relational.asOfJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts")
      .select("event_id", "user_id", "ts", "p_value")

  def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("native == composed on the events corpus") {
    val ev = Tables.events(spark, SharedSpark.sf0001)
    val clicks = ev.filter($"event_type" === "click").select("event_id", "user_id", "ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"value".as("p_value"))
    assert(rowsOf(viaNative(clicks, purchases)) === rowsOf(viaComposed(clicks, purchases)))
  }

  test("native == composed on adversarial data (ties, empty groups, no-match users)") {
    val clicks = Seq(
      (1L, 1L, 10L), (2L, 1L, 10L),          // duplicate left timestamps
      (3L, 2L, 5L),                          // user with no purchases
      (4L, 3L, 7L), (5L, 3L, 100L)
    ).map { case (e, u, t) => (e, u, new java.sql.Timestamp(t * 1000)) }
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (1L, 10L, 1.0),                        // tie with click ts (inclusive)
      (3L, 7L, 3.0), (3L, 8L, 4.0), (3L, 99L, 5.0)
    ).map { case (u, t, v) => (u, new java.sql.Timestamp(t * 1000), v) }
      .toDF("user_id", "p_ts", "p_value")
    assert(rowsOf(viaNative(clicks, purchases)) === rowsOf(viaComposed(clicks, purchases)))
    // spot-check semantics
    val m = viaNative(clicks, purchases).collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(m(1L) === Some(1.0) && m(2L) === Some(1.0)) // inclusive tie
    assert(m(3L) === None)
    assert(m(4L) === Some(3.0))                        // 7 <= 7, not 8
    assert(m(5L) === Some(5.0))                        // latest of three
  }

  test("null handling: null right-ts rows skipped, null carried values propagate") {
    val clicks = Seq((1L, 1L, 10L), (2L, 2L, 10L))
      .map { case (e, u, t) => (e, u, new java.sql.Timestamp(t * 1000)) }
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      // user 1: a null-ts row must NOT stall the group — the 09:00 row matches
      (1L, None, Some(111.0)),
      (1L, Some(9L), Some(42.0)),
      // user 2: the LATEST row carries a null value — that null must win
      (2L, Some(8L), Some(7.0)),
      (2L, Some(9L), None)
    ).map { case (u, t, v) =>
      (u, t.map(x => new java.sql.Timestamp(x * 1000)).orNull,
        v.map(java.lang.Double.valueOf).orNull)
    }.toDF("user_id", "p_ts", "p_value")

    for ((impl, name) <- Seq(
        (viaNative(clicks, purchases), "native"),
        (viaComposed(clicks, purchases), "composed"))) {
      val m = impl.collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
      assert(m(1L) === Some(42.0), s"$name: null-ts row stalled the key group")
      assert(m(2L) === None, s"$name: latest row's null value must propagate")
    }
  }

  test("pre-partitioned children with DIFFERENT partition counts join correctly") {
    // adversarial: both sides already hash-partitioned on the join key but
    // with unequal counts — the planner must re-equalize (zipPartitions
    // requires identical counts) and the merge must not drop matches
    val clicks = Seq((1L, 1L, 10L), (2L, 2L, 10L), (3L, 3L, 10L), (4L, 4L, 10L))
      .map { case (e, u, t) => (e, u, new java.sql.Timestamp(t * 1000)) }
      .toDF("event_id", "user_id", "ts")
      .repartition(7, col("user_id"))
    val purchases = Seq((1L, 9L, 1.0), (2L, 9L, 2.0), (3L, 9L, 3.0), (4L, 9L, 4.0))
      .map { case (u, t, v) => (u, new java.sql.Timestamp(t * 1000), v) }
      .toDF("user_id", "p_ts", "p_value")
      .repartition(13, col("user_id"))
    val m = viaNative(clicks, purchases).collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(m === Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(3.0), 4L -> Some(4.0)))
  }

  test("a side pre-partitioned on a key SUBSET is re-shuffled, not trusted") {
    // two join keys; right side arrives clustered on only one of them —
    // satisfying a subset-clustering distribution but NOT co-partitioned
    // with a full-key left. requireAllClusterKeys must force a re-shuffle.
    val left = Seq((1L, "a", 1L, 10L), (2L, "b", 2L, 10L), (3L, "a", 3L, 10L))
      .map { case (u, g, e, t) => (u, g, e, new java.sql.Timestamp(t * 1000)) }
      .toDF("user_id", "grp", "event_id", "ts")
      .repartition(6, col("user_id"), col("grp"))
    val right = Seq((1L, "a", 9L, 1.0), (2L, "b", 9L, 2.0), (3L, "a", 9L, 3.0))
      .map { case (u, g, t, v) => (u, g, new java.sql.Timestamp(t * 1000), v) }
      .toDF("user_id", "grp", "p_ts", "p_value")
      .repartition(6, col("user_id")) // subset clustering, same count
    val joined = AsOf.join(left, right, Seq("user_id", "grp"), "ts", "p_ts")
    val m = joined.collect().map(r => r.getAs[Long]("event_id") -> Option(r.getAs[Any]("p_value"))).toMap
    assert(m === Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(3.0)))
  }

  test("plans through AsOfJoinExec (no window, no nested loop)") {
    val ev = Tables.events(spark, SharedSpark.sf0001)
    val clicks = ev.filter($"event_type" === "click").select("event_id", "user_id", "ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("p_ts"), $"value".as("p_value"))
    val p = viaNative(clicks, purchases).queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"plan missing AsOfJoinExec:\n$p")
    assert(!p.contains("Window"))
  }
}
