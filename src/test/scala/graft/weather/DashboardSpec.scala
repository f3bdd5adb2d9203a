package graft.weather

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** Dashboard queries Q1–Q6 over a two-hour two-city fixture; golden values
  * hand-computed. */
class DashboardSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  def ts(s: String) = java.sql.Timestamp.valueOf(s)

  def fact = Seq(
    (1L, ts("2025-11-26 04:00:00"), 20.0, 70, 1010, 2.0),
    (1L, ts("2025-11-26 05:00:00"), 22.0, 60, 1012, 3.0),
    (2L, ts("2025-11-26 04:00:00"), 30.0, 80, 1008, 1.0),
    (2L, ts("2025-11-26 05:00:00"), 32.0, 90, 1006, 2.0)
  ).toDF("city_id", "dt", "temp", "humidity", "pressure", "wind_speed")

  def cities = Seq(
    (1L, "Hanoi", 21.02, 105.84), (2L, "Hue", 16.46, 107.59)
  ).toDF("city_id", "city_name", "coord_lat", "coord_lon")

  test("Q1 latest per city") {
    val r = Dashboard.latestPerCity(fact).orderBy("city_id")
      .select("temp").as[Double].collect().toSeq
    assert(r === Seq(22.0, 32.0))
  }

  test("Q2-Q4 scorecards") {
    val r = Dashboard.scorecards(fact).head()
    assert(r.getAs[Double]("avg_humidity") === 75.0)
    assert(r.getAs[Double]("avg_pressure") === 1009.0)
    assert(r.getAs[Double]("avg_wind_speed") === 2.0)
  }

  test("Q5 temperature by hour ordered on the time axis") {
    val r = Dashboard.temperatureByHour(fact).select("avg_temp").as[Double].collect().toSeq
    assert(r === Seq(25.0, 27.0))
  }

  test("Q6 map join carries coords for latest reading; scale has min/max") {
    val m = Dashboard.cityMap(fact, cities).collect()
    assert(m.length === 2)
    assert(m.head.getAs[String]("city_name") === "Hanoi")
    assert(m.head.getAs[Double]("temp") === 22.0)
    val s = Dashboard.temperatureScale(fact).head()
    assert(s.getAs[Double]("temp_min") === 20.0 && s.getAs[Double]("temp_max") === 32.0)
  }

  test("F3/F4 filters parameterize any dashboard query") {
    val withName = fact.join(cities, "city_id")
    assert(Dashboard.withFilters(withName, city = Some("Hue")).count() === 2)
    assert(Dashboard.withFilters(withName, from = Some("2025-11-26 04:30:00")).count() === 2)
    assert(Dashboard.withFilters(withName, city = Some("Hue"),
      to = Some("2025-11-26 04:30:00")).count() === 1)
  }

  test("X6 compactNumber: Looker-style 1.0K/2.3M tiles, boundary-safe, signed, null-safe") {
    val cases = Seq(
      0L -> "0", 999L -> "999", 1000L -> "1.0K", 1049L -> "1.0K",
      1500L -> "1.5K", 9949L -> "9.9K", 9950L -> "10K", 456000L -> "456K",
      999499L -> "999K", 999500L -> "1.0M", // rounding boundary, NOT "1,000K"
      1200000L -> "1.2M", 2000000000L -> "2.0B", -1500L -> "-1.5K",
      -42L -> "-42")
    val got = cases.map(_._1).toDF("n")
      .select(col("n"), Dashboard.compactNumber(col("n")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (n, want) => assert(got(n) === want, s"n=$n") }
    val nulls = Seq(Some(1L), None).toDF("n")
      .select(Dashboard.compactNumber(col("n")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(nulls.toSet === Set("1", null))
  }
}
