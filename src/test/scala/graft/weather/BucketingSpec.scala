package graft.weather

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark
import graft.sources.Tables

/** Bucketed co-located joins: the join between two tables bucketed on the
  * join key must plan WITHOUT a shuffle exchange — the write-time
  * pre-shuffle is the amortization that makes repeated fact⋈fact joins
  * cheap at scale. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("co-bucketed fact join plans with zero hash exchanges") {
    val d = SharedSpark.sf0001
    Store.writeBucketed(Tables.orders(spark, d), "b_orders", "o_orderkey", 8,
      sortCol = Some("o_orderkey"))
    Store.writeBucketed(Tables.lineitem(spark, d), "b_lineitem", "l_orderkey", 8,
      sortCol = Some("l_orderkey"))
    try {
      // disable broadcast so the join must use the bucketed layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val hashExchanges = plan.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning")
      // bucketed join itself needs none; only the 5-group agg re-shuffles
      assert(hashExchanges <= 1, s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // and the result is right
      val n = joined.agg(sum(col("n"))).head().getLong(0)
      assert(n === Tables.lineitem(spark, d).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
