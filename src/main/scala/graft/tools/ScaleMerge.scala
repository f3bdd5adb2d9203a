package graft.tools

import org.apache.spark.sql.functions._

import graft.weather.Store

/** Dev probe: incremental-merge cost vs stored-table size.
  *
  * Builds a date-partitioned fact of N days × rowsPerDay, then times
  * `Store.mergeFactLastWins` of a ONE-day batch into it. Because the
  * merge reads and rewrites only the touched partition, the time must
  * stay flat as N grows — the property that separates O(touched days)
  * from the round-1 O(table) rewrite. Run with several N and compare:
  *
  *   sbt "runMain graft.tools.ScaleMerge 15 60"
  */
object ScaleMerge {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.getOrCreate("scale-merge")
    val dayList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(15, 60)
    val rowsPerDay = 200000

    for (days <- dayList) {
      val dir = java.nio.file.Files.createTempDirectory(s"merge_scale_$days").toString
      val epoch0 = 1704067200L // 2024-01-01 UTC
      def fact(nDays: Int, dayOffset: Int, temp0: Double) =
        spark.range(nDays.toLong * rowsPerDay).select(
          (col("id") % 50000).as("city_id"),
          timestamp_seconds(lit(epoch0) +
            (col("id") / rowsPerDay + dayOffset) * 86400 + (col("id") % 17280) * 5).as("dt"),
          ((col("id") % 1000) / 10.0 + temp0).as("temp"))

      Store.writeFactPartitioned(fact(days, 0, 0.0), dir)

      // one-day correction batch into the LAST day
      val batch = fact(1, days - 1, 100.0)
      val t0 = System.nanoTime()
      Store.mergeFactLastWins(batch, dir, Seq("city_id", "dt"))
      val sec = (System.nanoTime() - t0) / 1e9
      val total = Store.readFact(spark, dir).count()
      println(f"""{"days":$days,"rows":$total,"one_day_merge_sec":$sec%.2f}""")
    }
    spark.stop()
  }
}
