package graft.weather

import org.apache.spark.sql.types._

/** Explicit schemas for the weather ingest surface — schema-on-read with
  * declared StructTypes, never inferSchema in a production path
  * (SURVEY.md §1.3). Shapes follow the reference's API payloads:
  * current weather per dags/etl.py:38-62, forecast per notebook cell 11
  * (fixtures in FIXTURES.md §1). All fields nullable: absent JSON keys
  * must yield NULL, never a default (SURVEY.md §1.4 trap 3).
  */
object Schemas {

  /** weather[] array element (take [0] downstream — etl.py:40-42). */
  val weatherCondition: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("main", StringType),
    StructField("description", StringType),
    StructField("icon", StringType)
  ))

  /** `/data/2.5/weather` document (one per city). `cod` is declared
    * STRING: the API sends number 200 on success but string codes on
    * error payloads; parsing both as text keeps the S3 gate total. */
  val currentWeatherRaw: StructType = StructType(Seq(
    StructField("coord", StructType(Seq(
      StructField("lon", DoubleType), StructField("lat", DoubleType)))),
    StructField("weather", ArrayType(weatherCondition)),
    StructField("base", StringType),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType), StructField("feels_like", DoubleType),
      StructField("temp_min", DoubleType), StructField("temp_max", DoubleType),
      StructField("pressure", IntegerType), StructField("humidity", IntegerType),
      StructField("sea_level", IntegerType), StructField("grnd_level", IntegerType)))),
    StructField("visibility", IntegerType),
    StructField("wind", StructType(Seq(
      StructField("speed", DoubleType), StructField("deg", IntegerType),
      StructField("gust", DoubleType)))),
    StructField("clouds", StructType(Seq(StructField("all", IntegerType)))),
    StructField("dt", LongType),
    StructField("sys", StructType(Seq(
      StructField("country", StringType),
      StructField("sunrise", LongType), StructField("sunset", LongType)))),
    StructField("timezone", IntegerType),
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("cod", StringType),
    StructField("message", StringType)
  ))

  /** One `/data/2.5/forecast` list[] entry (40 per city: 5 day × 3 h). */
  val forecastEntry: StructType = StructType(Seq(
    StructField("dt", LongType),
    StructField("dt_txt", StringType),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType), StructField("feels_like", DoubleType),
      StructField("temp_min", DoubleType), StructField("temp_max", DoubleType),
      StructField("pressure", IntegerType), StructField("sea_level", IntegerType),
      StructField("grnd_level", IntegerType), StructField("humidity", IntegerType),
      StructField("temp_kf", DoubleType)))),
    StructField("weather", ArrayType(weatherCondition)),
    StructField("clouds", StructType(Seq(StructField("all", IntegerType)))),
    StructField("wind", StructType(Seq(
      StructField("speed", DoubleType), StructField("deg", IntegerType),
      StructField("gust", DoubleType)))),
    StructField("visibility", IntegerType),
    StructField("pop", DoubleType),
    StructField("sys", StructType(Seq(StructField("pod", StringType))))
  ))

  /** `/data/2.5/forecast` document (one per city). */
  val forecastRaw: StructType = StructType(Seq(
    StructField("list", ArrayType(forecastEntry)),
    StructField("city", StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("country", StringType),
      StructField("coord", StructType(Seq(
        StructField("lat", DoubleType), StructField("lon", DoubleType)))),
      StructField("population", LongType), StructField("timezone", IntegerType),
      StructField("sunrise", LongType), StructField("sunset", LongType)))),
    StructField("cod", StringType),
    StructField("message", StringType)
  ))

  /** cities dim — sql/createtable.sql:2-9. */
  val cityDimColumns: Seq[String] =
    Seq("city_id", "city_name", "country", "coord_lat", "coord_lon", "timezone")

  /** current_weather fact, DDL order — sql/createtable.sql:12-33. */
  val currentWeatherColumns: Seq[String] = Seq(
    "city_id", "dt", "weather_id", "weather_main", "description", "base",
    "temp", "feels_like", "temp_min", "temp_max", "pressure", "humidity",
    "visibility", "wind_speed", "wind_deg", "wind_gust", "clouds_all",
    "sunrise", "sunset")

  /** forecast_weather fact — notebook cells 23/25 (no DDL in reference). */
  val forecastWeatherColumns: Seq[String] = Seq(
    "city_id", "dt", "dt_txt", "temp", "feels_like", "temp_min", "temp_max",
    "pressure", "sea_level", "grnd_level", "humidity", "temp_kf",
    "weather_id", "weather_main", "description", "clouds_all",
    "wind_speed", "wind_deg", "wind_gust", "visibility", "pop", "sys_pod",
    "sunrise", "sunset")
}
