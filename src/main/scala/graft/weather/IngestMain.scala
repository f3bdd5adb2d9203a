package graft.weather

/** Operational entry point — the engine's equivalent of the reference's
  * cron-invoked `python dags/etl.py` (SURVEY.md §3.1 / weather.yml:4-5):
  * an external scheduler runs this hourly via spark-submit.
  *
  * {{{
  * spark-submit --class graft.weather.IngestMain <jar> \
  *   current|forecast <payloadDir> <citiesPath> <factPath>
  * }}}
  *
  * `payloadDir` holds the run's fetched JSON payloads (one document per
  * line/file — the distributed drop-zone replacing the driver-side REST
  * loop). Exit code 0 with per-run counts on stdout (the reference's
  * Inserted/Failed log, ST5).
  */
object IngestMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 4 || args.length == 5,
      "usage: IngestMain current|forecast <payloadDir> <citiesPath> <factPath> [rejectsPath]")
    val mode = args(0); val payloadDir = args(1)
    val citiesPath = args(2); val factPath = args(3)
    val spark = graft.GraftSession.getOrCreate(s"graft-ingest-$mode")
    val source = Ingest.FileSource(payloadDir)
    val result = mode match {
      case "current"  => Ingest.run(spark, source, citiesPath, factPath)
      case "forecast" => Ingest.runForecast(spark, source, citiesPath, factPath)
      case other      => sys.error(s"unknown mode $other")
    }
    // optional append-only quarantine of the gated-out documents (ST5)
    if (args.length == 5 && result.badCount > 0) Ingest.quarantine(result.bad, args(4))
    println(s"[ingest] mode=$mode ok=${result.okCount} bad=${result.badCount} " +
      s"cities=${result.cities.count()} facts=${result.fact.count()}")
    spark.stop()
  }
}
