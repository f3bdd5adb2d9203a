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

    val epoch0 = 1704067200L // 2024-01-01 UTC
    // key derivation depends only on the WITHIN-day index `j`, so a
    // correction batch for day D carries exactly day D's stored
    // (city_id, dt) keys — a genuine last-wins UPDATE, not an insert.
    // (`DIV`: Spark's `/` on longs is double division and would bleed
    // fractional days into dt.) Keys are unique within a day because
    // lcm(50000, 17280) ≫ rowsPerDay.
    def fact(nDays: Int, dayOffset: Int, temp0: Double) = {
      val j = col("id") % rowsPerDay
      spark.range(nDays.toLong * rowsPerDay).select(
        (j % 50000).as("city_id"),
        timestamp_seconds(lit(epoch0) +
          (expr(s"id DIV $rowsPerDay") + dayOffset) * 86400 +
          (j % 17280) * 5).as("dt"),
        ((col("id") % 1000) / 10.0 + temp0).as("temp"))
    }

    def measure(days: Int): (Long, Double) = {
      val dir = java.nio.file.Files.createTempDirectory(s"merge_scale_$days").toString
      Store.writeFactPartitioned(fact(days, 0, 0.0), dir)
      val batch = fact(1, days - 1, 100.0) // correction batch, LAST day
      val t0 = System.nanoTime()
      Store.mergeFactLastWins(batch, dir, Seq("city_id", "dt"))
      val sec = (System.nanoTime() - t0) / 1e9
      (Store.readFact(spark, dir).count(), sec)
    }

    // the same one-day correction driven through the SQL surface:
    // MERGE INTO must lower onto the identical incremental merge
    // (fast path), so its curve must be as flat as the DataFrame call
    def measureSql(days: Int): (Long, Double) = {
      val dir = java.nio.file.Files.createTempDirectory(s"merge_sql_$days").toString
      Store.writeFactPartitioned(fact(days, 0, 0.0), dir)
      graft.plans.SqlMerge.register(spark, "scale_fact",
        Store.ParquetDateSink(dir))
      fact(1, days - 1, 100.0).createOrReplaceTempView("scale_batch")
      val t0 = System.nanoTime()
      spark.sql(
        """MERGE INTO scale_fact USING scale_batch
          |ON scale_fact.city_id = scale_batch.city_id
          |  AND scale_fact.dt = scale_batch.dt
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val sec = (System.nanoTime() - t0) / 1e9
      (Store.readFact(spark, dir).count(), sec)
    }

    // one-day SQL DELETE against a txn table of `days` days: the
    // partition-pruned path must stay flat as history grows
    def measureSqlDelete(days: Int): (Long, Double) = {
      val dir = java.nio.file.Files.createTempDirectory(s"del_sql_$days").toString
      val sink = graft.sources.TxnParquet.TxnParquetSink(dir)
      sink.overwriteAll(fact(days, 0, 0.0))
      graft.plans.SqlMerge.register(spark, "scale_del", sink)
      val cutoff = java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(epoch0 / 86400 + days - 1))
      val t0 = System.nanoTime()
      spark.sql(s"DELETE FROM scale_del WHERE to_date(dt) = DATE'$cutoff'")
      val sec = (System.nanoTime() - t0) / 1e9
      (sink.read(spark).count(), sec)
    }

    measure(2); measureSql(2); measureSqlDelete(2) // warmup, discarded
    for (days <- dayList) {
      val (total, sec) = measure(days)
      val (totalSql, secSql) = measureSql(days)
      val (totalDel, secDel) = measureSqlDelete(days)
      val expect = days.toLong * rowsPerDay
      val expectDel = (days - 1).toLong * rowsPerDay
      println(f"""{"days":$days,"rows":$total,"updated_not_inserted":${total == expect && totalSql == expect},"deleted_one_day":${totalDel == expectDel},"one_day_merge_sec":$sec%.2f,"one_day_sql_merge_sec":$secSql%.2f,"one_day_sql_delete_sec":$secDel%.2f}""")
    }
    spark.stop()
  }
}
