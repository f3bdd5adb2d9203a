package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

/** Both conflict policies round-tripped through a REAL JDBC connection
  * (embedded Derby — on the Spark classpath — supports SQL:2003 MERGE),
  * plus the full ingest pipeline running against JDBC storage. */
class JdbcMergeSinkSpec extends AnyFunSuite {
  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private val keys = Seq("city_id", "dt")

  private def fact(rows: (Long, String, Double)*) =
    rows.map { case (id, t, v) => (id, ts(t), v) }.toDF("city_id", "dt", "temp")

  test("DO UPDATE (MERGE WHEN MATCHED): conflicts refresh, absent keys insert") {
    val sink = JdbcMergeSink(url, "fact_upd")
    sink.mergeLastWins(fact((1L, "2025-11-26 04:00:00", 22.0), (2L, "2025-11-26 04:00:00", 25.0)), keys)
    sink.mergeLastWins(fact((1L, "2025-11-26 04:00:00", 99.0), (3L, "2025-11-26 04:00:00", 30.0)), keys)
    val back = sink.read(spark).orderBy("city_id")
      .select("city_id", "temp").as[(Long, Double)].collect().toSeq
    assert(back === Seq((1L, 99.0), (2L, 25.0), (3L, 30.0)))
  }

  test("DO NOTHING (MERGE insert-only): existing rows kept verbatim") {
    val sink = JdbcMergeSink(url, "fact_nothing")
    sink.mergeIfAbsent(fact((1L, "2025-11-26 04:00:00", 22.0)), keys)
    sink.mergeIfAbsent(fact((1L, "2025-11-26 04:00:00", 99.0), (2L, "2025-11-26 04:00:00", 30.0)), keys)
    val back = sink.read(spark).orderBy("city_id")
      .select("city_id", "temp").as[(Long, Double)].collect().toSeq
    assert(back === Seq((1L, 22.0), (2L, 30.0)))
  }

  test("replaying the same batch is a no-op (idempotence under retry)") {
    val sink = JdbcMergeSink(url, "fact_replay")
    val batch = fact((1L, "2025-11-26 04:00:00", 22.0), (2L, "2025-11-26 05:00:00", 25.0))
    sink.mergeLastWins(batch, keys)
    sink.mergeLastWins(batch, keys)
    assert(sink.read(spark).count() === 2)
  }

  test("within-batch duplicate keys collapse instead of failing MERGE") {
    val sink = JdbcMergeSink(url, "fact_dup")
    sink.mergeLastWins(
      fact((1L, "2025-11-26 04:00:00", 22.0), (1L, "2025-11-26 04:00:00", 23.0)), keys)
    assert(sink.read(spark).count() === 1)
  }

  test("ingest pipeline end-to-end against JDBC storage (etl.py load path)") {
    def payload(cityId: Long, name: String, dt: Long, temp: Double): String =
      s"""{"coord":{"lon":105.8,"lat":21.0},
         |"weather":[{"id":802,"main":"Clouds","description":"d","icon":"03d"}],
         |"main":{"temp":$temp,"feels_like":$temp,"temp_min":$temp,"temp_max":$temp,"pressure":1021,"humidity":37},
         |"wind":{"speed":4.0,"deg":355},"clouds":{"all":34},"dt":$dt,
         |"sys":{"country":"VN","sunrise":1764112440,"sunset":1764152047},
         |"timezone":25200,"id":$cityId,"name":"$name","cod":200}""".stripMargin.replace("\n", "")

    val cities = JdbcMergeSink(url, "jdbc_cities")
    val factSink = JdbcMergeSink(url, "jdbc_current")
    val r1 = graft.weather.Ingest.runCurrent(spark,
      graft.weather.Ingest.CannedSource(Seq(
        payload(1, "Hanoi", 1764129600, 22.0), payload(2, "Hue", 1764129600, 28.0))),
      cities, factSink)
    assert(r1.okCount === 2 && r1.cities.count() === 2 && r1.fact.count() === 2)

    // hour 2: correction for city 1 + a fresh reading per city
    val r2 = graft.weather.Ingest.runCurrent(spark,
      graft.weather.Ingest.CannedSource(Seq(
        payload(1, "Hanoi", 1764129600, 22.5), payload(1, "Hanoi", 1764133200, 23.0),
        payload(2, "Hue", 1764133200, 29.0))),
      cities, factSink)
    assert(r2.fact.count() === 4)
    val corrected = r2.fact
      .filter(col("city_id") === 1 && col("dt") === timestamp_seconds(lit(1764129600)))
      .head().getAs[Double]("temp")
    assert(corrected === 22.5)
  }

  test("quoteTable: simple parts raw, pre-quoted verbatim, symbols quoted, dots-in-quotes kept") {
    val sink = JdbcMergeSink("jdbc:derby:memory:quoting;create=true", "t")
    val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:derby:memory:q")
    def qt(n: String) = sink.quoteTable(dialect, n)
    assert(qt("weather_fact") === "weather_fact")
    assert(qt("app.weather_fact") === "app.weather_fact")
    assert(qt("\"order\"") === "\"order\"")              // reserved word, caller-quoted
    assert(qt("sch.\"my.table\"") === "sch.\"my.table\"") // dot inside quotes ≠ separator
    assert(qt("my table") === "\"my table\"")             // symbol part gets quoted
    assert(qt("a.my-tbl") === "a.\"my-tbl\"")
    intercept[IllegalArgumentException](qt("bad\"name"))  // unbalanced quote rejected
    // a part that merely starts/ends with quotes but is NOT a well-formed
    // delimited identifier must NOT pass through verbatim (injection)
    val evil = "\"t\" t2 USING \"t\" s2 ON 1=1 WHEN MATCHED THEN DELETE --\"\""
    assert(qt(evil) !== evil, "malicious name must not be emitted raw")
    assert(qt(evil).startsWith("\"") && qt(evil).count(_ == '"') > evil.count(_ == '"'),
      "interior quotes must be escaped by the dialect helper")
    assert(qt("\"with\"\"doubled\"") === "\"with\"\"doubled\"") // doubled quotes are legit
  }
}
