package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** Bucketed tables must deliver the one thing they exist for: joins and
  * aggregations on the bucket key WITHOUT a shuffle — durable across
  * sessions, unlike a clustered persist(). */
class BucketedSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit(); d.toString
  }

  private def withNoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-bucketed two-table join and groupBy plan with ZERO exchanges") {
    val a = (0L until 5000L).map(i => (i % 97, i)).toDF("k", "va")
    val b = (0L until 5000L).map(i => (i * 7 % 97, i)).toDF("k", "vb")
    Bucketed.writeBucketed(a, "bspec_a", 8, Seq("k"),
      path = Some(tmp("bspec_a")))
    Bucketed.writeBucketed(b, "bspec_b", 8, Seq("k"),
      path = Some(tmp("bspec_b")))
    withNoBroadcast {
      val ta = Bucketed.readTable(spark, "bspec_a")
      val tb = Bucketed.readTable(spark, "bspec_b")
      val joined = ta.join(tb, "k")
      assert(Bucketed.countExchanges(joined) === 0)
      // the same join over plain parquet shuffles BOTH sides
      val pa = tmp("bspec_pa"); val pb = tmp("bspec_pb")
      a.write.mode("overwrite").parquet(pa)
      b.write.mode("overwrite").parquet(pb)
      val plain = spark.read.parquet(pa).join(spark.read.parquet(pb), "k")
      assert(Bucketed.countExchanges(plain) === 2)
      // bucket-keyed aggregation is exchange-free too
      assert(Bucketed.countExchanges(
        ta.groupBy("k").agg(sum("va").as("s"))) === 0)
      // and the results are identical to the plain-parquet plan's
      val gotJ = joined.groupBy("k").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val expJ = plain.groupBy("k").count().collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(gotJ === expJ)
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffling) plan") {
    val a = (0L until 2000L).map(i => (i % 53, i)).toDF("k", "va")
    val b = (0L until 2000L).map(i => (i % 53, i * 2)).toDF("k", "vb")
    Bucketed.writeBucketed(a, "bspec_m8", 8, Seq("k"),
      path = Some(tmp("bspec_m8")))
    Bucketed.writeBucketed(b, "bspec_m4", 4, Seq("k"),
      path = Some(tmp("bspec_m4")))
    withNoBroadcast {
      val j = Bucketed.readTable(spark, "bspec_m8")
        .join(Bucketed.readTable(spark, "bspec_m4"), "k")
      // correctness never depends on the layout
      assert(j.count() === (0L until 2000L).groupBy(_ % 53)
        .map { case (_, xs) => xs.size.toLong * xs.size }.sum)
    }
  }
}
