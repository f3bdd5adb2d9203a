package graft.weather

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** Upsert-policy divergence + idempotence (SURVEY.md §5.3, FIXTURES.md §2:
  * "same (city_id, dt) twice with changed temp — DO UPDATE keeps the new
  * value, DO NOTHING keeps the old"). */
class StoreSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  def existing = Seq((1L, "2025-11-26 04:00:00", 22.0), (2L, "2025-11-26 04:00:00", 25.0))
    .toDF("city_id", "dt", "temp")
  def batch = Seq((1L, "2025-11-26 04:00:00", 99.0), (3L, "2025-11-26 04:00:00", 30.0))
    .toDF("city_id", "dt", "temp")
  val keys = Seq("city_id", "dt")

  test("DO UPDATE keeps the new value (etl.py:97-114)") {
    val m = Store.upsertLastWins(existing, batch, keys)
    assert(m.count() === 3)
    assert(m.filter($"city_id" === 1L).head().getAs[Double]("temp") === 99.0)
    assert(m.filter($"city_id" === 3L).head().getAs[Double]("temp") === 30.0)
  }

  test("DO NOTHING keeps the old value (notebook cell 19)") {
    val m = Store.upsertDoNothing(existing, batch, keys)
    assert(m.count() === 3)
    assert(m.filter($"city_id" === 1L).head().getAs[Double]("temp") === 22.0)
    assert(m.filter($"city_id" === 3L).head().getAs[Double]("temp") === 30.0)
  }

  test("upsert is idempotent under replay (ST2: re-runs are no-ops)") {
    val once  = Store.upsertLastWins(existing, batch, keys)
    val twice = Store.upsertLastWins(once, batch, keys)
    assert(twice.exceptAll(once).count() === 0)
    assert(once.exceptAll(twice).count() === 0)
  }

  test("orphanedFacts flags FK violations; cascadeDelete removes them (S7)") {
    val dim = Seq((1L, "Hanoi"), (2L, "Hue")).toDF("city_id", "city_name")
    val fact = Seq((1L, 22.0), (2L, 25.0), (9L, 0.0)).toDF("city_id", "temp")
    assert(Store.orphanedFacts(fact, dim, "city_id").select("city_id").head().getLong(0) === 9L)
    val (d2, f2) = Store.cascadeDelete(dim, fact, "city_id", col("city_name") === "Hue")
    assert(d2.count() === 1)
    assert(f2.select("city_id").as[Long].collect().toSet === Set(1L))
  }

  test("partitioned fact write: dynamic overwrite touches only present dates") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fact").toString
    val day1 = Seq((1L, java.sql.Timestamp.valueOf("2025-11-26 04:00:00"), 22.0))
      .toDF("city_id", "dt", "temp")
    val day2 = Seq((1L, java.sql.Timestamp.valueOf("2025-11-27 04:00:00"), 23.0))
      .toDF("city_id", "dt", "temp")
    Store.writeFactPartitioned(day1.unionByName(day2), dir)
    // overwrite day2 only; day1 partition must survive
    val day2v2 = Seq((1L, java.sql.Timestamp.valueOf("2025-11-27 04:00:00"), 99.0))
      .toDF("city_id", "dt", "temp")
    Store.writeFactPartitioned(day2v2, dir)
    val back = Store.readFact(spark, dir).orderBy("dt")
      .select("temp").as[Double].collect().toSeq
    assert(back === Seq(22.0, 99.0))
  }
}
