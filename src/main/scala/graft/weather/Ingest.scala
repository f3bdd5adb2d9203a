package graft.weather

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The scheduled ingest pipeline — the engine equivalent of the
  * reference's `dags/etl.py main()` (SURVEY.md §3.1): fetch payloads →
  * flatten → upsert cities dim (DO UPDATE) + current_weather fact
  * (DO UPDATE on (city_id, dt)).
  *
  * The payload source is pluggable (S1 note in SURVEY.md §2.1): the same
  * pipeline runs from a canned fixture list, a directory of dropped JSON
  * files, or — on a real deployment — a distributed fetch stage. Nothing
  * downstream changes because every stage is DataFrame→DataFrame.
  */
object Ingest {

  /** Payload source abstraction: yields raw JSON documents (one per
    * city-fetch). */
  trait PayloadSource {
    def fetch(spark: SparkSession): Dataset[String]
  }

  /** Driver-side canned payloads (the 14-row case — mirrors the
    * reference's sequential REST loop, minus the network). */
  final case class CannedSource(payloads: Seq[String]) extends PayloadSource {
    def fetch(spark: SparkSession): Dataset[String] = {
      import spark.implicits._
      spark.createDataset(payloads)
    }
  }

  /** Distributed file-drop source: payloads landed as one-JSON-per-line
    * files; scales to any volume (each executor parses its split). */
  final case class FileSource(dir: String) extends PayloadSource {
    def fetch(spark: SparkSession): Dataset[String] = {
      import spark.implicits._
      spark.read.textFile(dir)
    }
  }

  final case class IngestResult(cities: DataFrame, fact: DataFrame,
                                okCount: Long, badCount: Long)

  /** One batch run: parse → gate → flatten → merge into the stored dim
    * and fact. `citiesPath`/`factPath` absent (first run) start empty. */
  def run(spark: SparkSession, source: PayloadSource,
          citiesPath: String, factPath: String): IngestResult = {
    implicit val s: SparkSession = spark
    val parsed = Flatten.parseCurrent(source.fetch(spark))
    val wide = Flatten.flattenCurrent(parsed).cache()
    val okCount = wide.count()
    val badCount = Flatten.badRecords(parsed).count()

    val newCities = Flatten.citiesDim(wide)
    val newFacts  = Flatten.currentFact(wide)

    val mergedCities = readOr(spark, citiesPath, newCities) match {
      case Some(existing) => Store.upsertLastWins(existing, newCities, Seq("city_id"))
      case None           => newCities
    }
    val mergedFact = readOr(spark, factPath, newFacts) match {
      case Some(existing) => Store.upsertLastWins(existing, newFacts, Seq("city_id", "dt"))
      case None           => newFacts
    }

    mergedCities.write.mode("overwrite").parquet(citiesPath)
    Store.writeFactPartitioned(mergedFact, factPath)
    wide.unpersist()
    IngestResult(
      spark.read.parquet(citiesPath),
      Store.readFact(spark, factPath),
      okCount, badCount)
  }

  /** Forecast backfill (the notebook's §3.2 path): 40-entry fan-out per
    * city (P3 explode), upsert keyed (city_id, dt) — re-pulls refresh
    * forecasts for the same horizon (DO UPDATE). Also refreshes the
    * cities dim (the forecast payload carries the same city attributes
    * plus population). */
  def runForecast(spark: SparkSession, source: PayloadSource,
                  citiesPath: String, factPath: String): IngestResult = {
    implicit val s: SparkSession = spark
    val parsed = Flatten.parseForecast(source.fetch(spark))
    val wide = Flatten.flattenForecast(parsed).cache()
    val okCount = wide.count()
    val badCount = Flatten.badRecords(parsed).count()

    val newCities = Flatten.citiesDim(wide)
    val newFacts  = Flatten.forecastFact(wide)

    val mergedCities = readOr(spark, citiesPath, newCities) match {
      case Some(existing) => Store.upsertLastWins(existing, newCities, Seq("city_id"))
      case None           => newCities
    }
    val mergedFact = readOr(spark, factPath, newFacts) match {
      case Some(existing) => Store.upsertLastWins(existing, newFacts, Seq("city_id", "dt"))
      case None           => newFacts
    }
    mergedCities.write.mode("overwrite").parquet(citiesPath)
    Store.writeFactPartitioned(mergedFact, factPath)
    wide.unpersist()
    IngestResult(
      spark.read.parquet(citiesPath),
      Store.readFact(spark, factPath),
      okCount, badCount)
  }

  private def readOr(spark: SparkSession, path: String,
                     template: DataFrame): Option[DataFrame] =
    if (graft.sources.FsUtil.hasData(spark, path)) {
      val raw = spark.read.parquet(path)
      val df = if (raw.columns.contains("p_date")) raw.drop("p_date") else raw
      // align column order to the incoming batch for unionByName safety
      Some(df.select(template.columns.map(org.apache.spark.sql.functions.col): _*))
    } else None
}
