package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: stage-level timing for the small uniform-overshoot
  * queries (q86/q87/q237) — where does a sub-2 s query spend it? */
object ProfSmall {
  def main(a: Array[String]): Unit = {
    val b = graft.GraftSession.builder("profsmall")
    b.config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    b.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm everything once
    graft.sources.Tables.events(spark, d).count()
    graft.sources.Tables.documents(spark, d).count()
    for (_ <- 1 to 3) {
      t("events_load_only") { graft.sources.Tables.events(spark, d) }
      t("events_count") { graft.sources.Tables.events(spark, d).count() }
      t("events_union_window") {
        val ev = graft.sources.Tables.events(spark, d)
        val deltas = ev.select(col("event_type").as("__g"), col("ts").as("__t"), lit(1L).as("__d"))
          .unionByName(ev.select(col("event_type").as("__g"), (col("ts") + expr("INTERVAL 30 MINUTES")).as("__t"), lit(-1L).as("__d")))
        deltas.write.format("noop").mode("overwrite").save()
      }
      t("q86_full") {
        graft.operators.Analytics.peakConcurrency(
          graft.sources.Tables.events(spark, d), col("event_type"),
          col("ts"), col("ts") + expr("INTERVAL 30 MINUTES"))
          .write.format("noop").mode("overwrite").save()
      }
      t("q87_full") {
        graft.operators.Analytics.trend(
          graft.sources.Tables.events(spark, d), col("event_type"),
          col("ts").cast("long"),
          floor(col("value") * 1000000 + 0.5).cast("long"))
          .write.format("noop").mode("overwrite").save()
      }
      t("q237_full") {
        graft.operators.Classify.isotonicCalibrate(
          graft.sources.Tables.documents(spark, d),
          least(lit(1000000L), col("n_chars") * 1800L),
          col("lang") === "en", nBins = 10)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
