package graft.weather

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** End-to-end §3.1 pipeline replay: two hourly runs + an exact re-run
  * (idempotence, SURVEY.md §5.4), plus the SQL dashboard path. */
class IngestSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  def payload(cityId: Long, name: String, dt: Long, temp: Double): String =
    s"""{"coord":{"lon":105.8,"lat":21.0},
       |"weather":[{"id":802,"main":"Clouds","description":"d","icon":"03d"}],
       |"main":{"temp":$temp,"feels_like":$temp,"temp_min":$temp,"temp_max":$temp,"pressure":1021,"humidity":37},
       |"wind":{"speed":4.0,"deg":355},"clouds":{"all":34},"dt":$dt,
       |"sys":{"country":"VN","sunrise":1764112440,"sunset":1764152047},
       |"timezone":25200,"id":$cityId,"name":"$name","cod":200}""".stripMargin.replace("\n", "")

  test("two-hour replay: upsert accumulates, exact re-run is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val cities = s"$base/cities"
    val fact = s"$base/current_weather"

    val hour1 = Seq(
      payload(1, "Hanoi", 1764129600, 22.0),
      payload(2, "Hue", 1764129600, 28.0),
      """{"cod":"404","message":"city not found"}""")
    val r1 = Ingest.run(spark, Ingest.CannedSource(hour1), cities, fact)
    assert(r1.okCount === 2 && r1.badCount === 1)
    assert(r1.fact.count() === 2 && r1.cities.count() === 2)

    // hour 2: new dt per city + a corrected hour-1 reading for city 1
    val hour2 = Seq(
      payload(1, "Hanoi", 1764133200, 23.0),
      payload(2, "Hue", 1764133200, 29.0),
      payload(1, "Hanoi", 1764129600, 22.5))
    val r2 = Ingest.run(spark, Ingest.CannedSource(hour2), cities, fact)
    assert(r2.fact.count() === 4)
    val corrected = r2.fact
      .filter(col("city_id") === 1 && col("dt") === timestamp_seconds(lit(1764129600)))
      .head().getAs[Double]("temp")
    assert(corrected === 22.5) // DO UPDATE last-write-wins

    // snapshot r2 rows before replaying (r2.fact is a lazy reader over
    // files the replay's partition overwrite will replace)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.map(_.toString).sorted
    val before = rowsOf(r2.fact)

    // replay hour 2 verbatim — must be a no-op (ST2 idempotence)
    val r3 = Ingest.run(spark, Ingest.CannedSource(hour2), cities, fact)
    assert(r3.fact.count() === 4)
    assert(rowsOf(r3.fact) === before)
  }

  test("bad records land in an append-only quarantine with replayable payloads") {
    val base = java.nio.file.Files.createTempDirectory("graft_quar").toString
    val rejects = s"$base/rejects"
    val bad404 = """{"cod":"404","message":"city not found"}"""
    val truncated = """{"cod":"5""" // unparseable — raw bytes must survive
    val r1 = Ingest.run(spark,
      Ingest.CannedSource(Seq(payload(1, "Hanoi", 1764129600, 22.0), bad404, truncated)),
      s"$base/cities", s"$base/fact")
    assert(r1.badCount === 2 && r1.bad.count() === 2)
    Ingest.quarantine(r1.bad, rejects)
    Ingest.quarantine(r1.bad, rejects) // second run appends, never rewrites
    val q = spark.read.parquet(rejects)
    assert(q.count() === 4)
    val payloads = q.select("payload").collect().map(_.getString(0)).toSet
    // quarantine holds the ORIGINAL bytes, not a lossy re-serialization
    assert(payloads === Set(bad404, truncated))
  }

  test("forecast backfill: 40-entry fan-out, upsert refresh on re-pull (§3.2)") {
    val base = java.nio.file.Files.createTempDirectory("graft_fc").toString
    def fcPayload(temp0: Double): String =
      s"""{"list":[
         |{"dt":1764136800,"dt_txt":"2025-11-26 06:00:00",
         | "main":{"temp":$temp0,"feels_like":21.9,"temp_min":22.6,"temp_max":23.9,
         |   "pressure":1021,"sea_level":1021,"grnd_level":1018,"humidity":38,"temp_kf":-1.25},
         | "weather":[{"id":802,"main":"Clouds","description":"d","icon":"03d"}],
         | "clouds":{"all":26},"wind":{"speed":3.3,"deg":354,"gust":4.4},
         | "visibility":10000,"pop":0.0,"sys":{"pod":"d"}},
         |{"dt":1764147600,"dt_txt":"2025-11-26 09:00:00",
         | "main":{"temp":25.0,"feels_like":25.0,"temp_min":24.0,"temp_max":26.0,
         |   "pressure":1020,"humidity":40},
         | "weather":[{"id":800,"main":"Clear","description":"c","icon":"01d"}],
         | "clouds":{"all":5},"wind":{"speed":2.0,"deg":10},"pop":0.2,"sys":{"pod":"d"}}],
         |"city":{"id":1581130,"name":"Hanoi","country":"VN",
         | "coord":{"lat":21.0,"lon":105.8},"population":1431270,"timezone":25200,
         | "sunrise":1764112440,"sunset":1764152047},"cod":"200"}""".stripMargin.replace("\n", "")

    val r1 = Ingest.runForecast(spark, Ingest.CannedSource(Seq(fcPayload(22.6))),
      s"$base/cities", s"$base/forecast")
    assert(r1.fact.count() === 2 && r1.cities.count() === 1)
    assert(r1.fact.columns.toSeq === Schemas.forecastWeatherColumns)

    // re-pull with an updated forecast for the same horizon → refresh
    val r2 = Ingest.runForecast(spark, Ingest.CannedSource(Seq(fcPayload(23.5))),
      s"$base/cities", s"$base/forecast")
    assert(r2.fact.count() === 2)
    val t = r2.fact.filter(col("dt_txt") === "2025-11-26 06:00:00")
      .head().getAs[Double]("temp")
    assert(t === 23.5)
  }

  test("SQL dashboard path over the registered weather views (§3.3)") {
    val base = java.nio.file.Files.createTempDirectory("graft_ingest_sql").toString
    val r = Ingest.run(spark,
      Ingest.CannedSource(Seq(
        payload(1, "Hanoi", 1764129600, 22.0), payload(2, "Hue", 1764129600, 28.0))),
      s"$base/cities", s"$base/fact")
    graft.sources.Catalog.registerWeather(spark, r.cities, r.fact)
    val avg = spark.sql(
      """SELECT round(avg(humidity), 1) AS h, round(avg(temp), 1) AS t
        |FROM current_weather""".stripMargin).head()
    assert(avg.getAs[Double]("h") === 37.0 && avg.getAs[Double]("t") === 25.0)
    val map = spark.sql(
      """SELECT c.city_name, w.temp
        |FROM current_weather w JOIN cities c USING (city_id)
        |ORDER BY c.city_name""".stripMargin).collect()
    assert(map.map(_.getString(0)).toSeq === Seq("Hanoi", "Hue"))
  }

  test("corpus SQL catalog exposes tables + graft functions") {
    graft.sources.Catalog.registerAll(spark, SharedSpark.sf0001)
    val r = spark.sql(
      """SELECT graft_lang_id(text) AS lg, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY n DESC""".stripMargin).collect()
    assert(r.nonEmpty)
    val cos = spark.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .head().getDouble(0)
    assert(cos >= -1.0 && cos <= 1.0)
  }
}
