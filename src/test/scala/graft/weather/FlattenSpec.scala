package graft.weather

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** Golden-value tests for the flatten layer, fixtures from FIXTURES.md §1
  * (values observed in the reference's notebook cell 9/11 outputs). */
class FlattenSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  val currentJson: String =
    """{"coord":{"lon":105.8412,"lat":21.0245},
      |"weather":[{"id":802,"main":"Clouds","description":"mây rải rác","icon":"03d"}],
      |"base":"stations",
      |"main":{"temp":22.0,"feels_like":21.22,"temp_min":22.0,"temp_max":22.0,"pressure":1021,"humidity":37},
      |"visibility":10000,"wind":{"speed":4.12,"deg":355,"gust":5.89},
      |"clouds":{"all":34},"dt":1764129959,
      |"sys":{"country":"VN","sunrise":1764112440,"sunset":1764152047},
      |"timezone":25200,"id":1581130,"name":"Hà Nội","cod":200}""".stripMargin.replace("\n", "")

  // optional keys absent: visibility, wind.gust, base
  val sparseJson: String =
    """{"coord":{"lon":1.0,"lat":2.0},
      |"weather":[{"id":800,"main":"Clear","description":"clear sky","icon":"01d"}],
      |"main":{"temp":30.0,"feels_like":31.0,"temp_min":29.0,"temp_max":31.0,"pressure":1000,"humidity":50},
      |"wind":{"speed":1.5,"deg":90},
      |"clouds":{"all":0},"dt":1764129959,
      |"sys":{"country":"VN","sunrise":1764112440,"sunset":1764152047},
      |"timezone":25200,"id":99,"name":"X","cod":200}""".stripMargin.replace("\n", "")

  val errorJson = """{"cod":"404","message":"city not found"}"""

  def flatCurrent = {
    implicit val s = spark
    import s.implicits._
    Flatten.flattenCurrent(Flatten.parseCurrent(
      s.createDataset(Seq(currentJson, sparseJson, errorJson))))
  }

  test("S3 gate rejects non-200 payloads, keeps 200 (etl.py:34)") {
    assert(flatCurrent.count() === 2)
    implicit val s = spark
    import s.implicits._
    val bad = Flatten.badRecords(Flatten.parseCurrent(s.createDataset(Seq(currentJson, errorJson))))
    assert(bad.count() === 1)
  }

  test("P1/P2/P6 golden values incl. UTF-8 Vietnamese description") {
    val r = flatCurrent.filter(col("city_id") === 1581130L).collect().head
    assert(r.getAs[String]("city_name") === "Hà Nội")
    assert(r.getAs[String]("description") === "mây rải rác")
    assert(r.getAs[Int]("weather_id") === 802)
    assert(r.getAs[String]("weather_main") === "Clouds")
    assert(r.getAs[Double]("coord_lat") === 21.0245)
    assert(r.getAs[Double]("temp") === 22.0)
    assert(r.getAs[Int]("humidity") === 37)
    assert(r.getAs[Double]("wind_gust") === 5.89)
  }

  test("X1 epoch→UTC golden pairs (FIXTURES.md §1.3)") {
    val r = flatCurrent.filter(col("city_id") === 1581130L)
      .select(date_format(col("dt"), "yyyy-MM-dd HH:mm:ss"),
        date_format(col("sunrise"), "yyyy-MM-dd HH:mm:ss"),
        date_format(col("sunset"), "yyyy-MM-dd HH:mm:ss"))
      .collect().head
    assert(r.getString(0) === "2025-11-26 04:05:59")
    assert(r.getString(1) === "2025-11-25 23:14:00")
    assert(r.getString(2) === "2025-11-26 10:14:07")
  }

  test("X2 presentation tz conversion to Asia/Ho_Chi_Minh (+07)") {
    val local = Flatten.toLocalTime(flatCurrent.filter(col("city_id") === 1581130L), Seq("dt"))
    val s = local.select(date_format(col("dt"), "yyyy-MM-dd HH:mm:ss")).collect().head.getString(0)
    assert(s === "2025-11-26 11:05:59")
  }

  test("null-by-absence: optional keys produce NULL, never defaults (§1.4)") {
    val r = flatCurrent.filter(col("city_id") === 99L).collect().head
    assert(r.isNullAt(r.fieldIndex("visibility")))
    assert(r.isNullAt(r.fieldIndex("wind_gust")))
    assert(r.isNullAt(r.fieldIndex("base")))
  }

  test("citiesDim dedups on repeated payloads (A1)") {
    implicit val s = spark
    import s.implicits._
    val twice = Flatten.flattenCurrent(Flatten.parseCurrent(
      s.createDataset(Seq(currentJson, currentJson))))
    assert(Flatten.citiesDim(twice).count() === 1)
  }

  test("P3 forecast explode: one row per list entry, city attrs broadcast") {
    implicit val s = spark
    import s.implicits._
    val fc =
      """{"list":[
        |{"dt":1764136800,"dt_txt":"2025-11-26 06:00:00",
        | "main":{"temp":22.62,"feels_like":21.93,"temp_min":22.62,"temp_max":23.87,
        |   "pressure":1021,"sea_level":1021,"grnd_level":1018,"humidity":38,"temp_kf":-1.25},
        | "weather":[{"id":802,"main":"Clouds","description":"mây rải rác","icon":"03d"}],
        | "clouds":{"all":26},"wind":{"speed":3.31,"deg":354,"gust":4.41},
        | "visibility":10000,"pop":0.0,"sys":{"pod":"d"}},
        |{"dt":1764147600,"dt_txt":"2025-11-26 09:00:00",
        | "main":{"temp":25.0,"feels_like":25.0,"temp_min":24.0,"temp_max":26.0,
        |   "pressure":1020,"humidity":40},
        | "weather":[{"id":800,"main":"Clear","description":"clear","icon":"01d"}],
        | "clouds":{"all":5},"wind":{"speed":2.0,"deg":10},
        | "pop":0.2,"sys":{"pod":"d"}}],
        |"city":{"id":1581130,"name":"Hà Nội","country":"VN",
        | "coord":{"lat":21.0245,"lon":105.8412},"population":1431270,"timezone":25200,
        | "sunrise":1764112440,"sunset":1764152047},"cod":"200"}""".stripMargin.replace("\n", "")
    val flat = Flatten.flattenForecast(Flatten.parseForecast(s.createDataset(Seq(fc))))
    assert(flat.count() === 2)
    val rows = flat.orderBy("dt").collect()
    assert(rows.forall(_.getAs[Long]("city_id") == 1581130L))
    assert(rows.forall(_.getAs[Long]("population") == 1431270L))
    assert(rows(0).getAs[Double]("temp") === 22.62)
    assert(rows(0).getAs[Int]("sea_level") === 1021)
    assert(rows(1).isNullAt(rows(1).fieldIndex("sea_level"))) // absent ⇒ null
    assert(rows(1).getAs[Double]("pop") === 0.2)
    // fact projection drops dim columns (P4/P5) in DDL order
    val fact = Flatten.forecastFact(flat)
    assert(fact.columns.toSeq === Schemas.forecastWeatherColumns)
  }
}
