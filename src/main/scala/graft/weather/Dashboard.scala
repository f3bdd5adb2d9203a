package graft.weather

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The dashboard query set Q1–Q6 (SURVEY.md §3.3) — the Looker-Studio
  * widgets' generated SQL re-expressed as parameterized DataFrame
  * programs. All take the fact (and dim where needed) as inputs plus
  * optional city/date filters (F3/F4); filters are plain Catalyst
  * predicates so they push down to the parquet scan and prune date
  * partitions.
  */
object Dashboard {

  /** F3/F4 parameterization: build the filter conjunction once. */
  def withFilters(df: DataFrame, city: Option[String] = None,
                  from: Option[String] = None, to: Option[String] = None): DataFrame = {
    val preds = Seq(
      city.map(c => col("city_name") === lit(c)),
      from.map(f => col("dt") >= lit(f).cast("timestamp")),
      to.map(t => col("dt") <= lit(t).cast("timestamp"))
    ).flatten
    preds.foldLeft(df)(_ filter _)
  }

  /** Q1 (A7/W1): latest reading per city — "stores latest weather readings
    * per city" (README.md:66,111). */
  def latestPerCity(fact: DataFrame): DataFrame =
    Relational.latestPerKey(fact, Seq("city_id"), Seq(col("dt").desc))

  /** Q2–Q4 (A2–A4): the scorecard averages — humidity, pressure, wind. */
  def scorecards(fact: DataFrame): DataFrame =
    fact.agg(
      round(avg(col("humidity")), 4).as("avg_humidity"),
      round(avg(col("pressure")), 4).as("avg_pressure"),
      round(avg(col("wind_speed")), 4).as("avg_wind_speed"))

  /** Q5 (A5/O2): temperature time series by hour. */
  def temperatureByHour(fact: DataFrame): DataFrame =
    fact.groupBy(date_trunc("hour", col("dt")).as("hour"))
      .agg(round(avg(col("temp")), 4).as("avg_temp"))
      .orderBy("hour")

  /** Q6 (J1/A6): the map — latest temp per city joined to the broadcast
    * cities dim for name/coords, plus the min/max color scale. */
  def cityMap(fact: DataFrame, cities: DataFrame): DataFrame =
    latestPerCity(fact)
      .join(broadcast(cities), "city_id")
      .select("city_id", "city_name", "coord_lat", "coord_lon", "temp", "dt")
      .orderBy("city_id")

  def temperatureScale(fact: DataFrame): DataFrame =
    fact.agg(min(col("temp")).as("temp_min"), max(col("temp")).as("temp_max"))
}
