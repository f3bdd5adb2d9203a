package graft.tools

import org.apache.spark.sql.functions._

/** Microbenchmark for the per-round state substrate: localCheckpoint
  * vs [[graft.operators.Lifecycle.diskRound]] (parquet write +
  * read-back) on a rank-frame-shaped (id LONG, val LONG) dataset, so
  * the fixed per-round cost of the iterative operators' barrier is a
  * measured number, not a guess. */
object DiskRoundBench {
  def main(a: Array[String]): Unit = {
    val rows = a.headOption.map(_.toInt).getOrElse(50000)
    val spark = graft.GraftSession.getOrCreate("diskroundbench")
    spark.sparkContext.setLogLevel("WARN")
    def frame() = spark.range(rows.toLong).toDF("id")
      .withColumn("v", col("id") * 7L % 1000L)
      .repartition(32, col("id"))
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"TIMING $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm
    frame().write.format("noop").mode("overwrite").save()
    time("localCheckpoint x5") {
      (1 to 5).foreach(_ => frame().localCheckpoint(true))
    }
    time("diskRound x5") {
      (1 to 5).foreach(_ => graft.operators.Lifecycle.diskRound(frame()))
    }
    time("diskRound+release x5") {
      var prev: org.apache.spark.sql.DataFrame = null
      (1 to 5).foreach { _ =>
        val d = graft.operators.Lifecycle.diskRound(frame())
        graft.operators.Lifecycle.releaseDiskRound(spark, prev)
        prev = d
      }
    }
    time("write-only x5") {
      (1 to 5).foreach(i => frame().write.mode("overwrite")
        .parquet(s"/tmp/drb-$i"))
    }
    time("read-create-only x5") {
      (1 to 5).foreach(i => spark.read.parquet(s"/tmp/drb-$i"))
    }
    time("readback-count x5") {
      (1 to 5).foreach(i => spark.read.parquet(s"/tmp/drb-$i").count())
    }
    time("frame-build-noop x5") {
      (1 to 5).foreach(_ =>
        frame().write.format("noop").mode("overwrite").save())
    }
    time("write-coalesced x5") {
      (1 to 5).foreach(i => frame().coalesce(4).write.mode("overwrite")
        .parquet(s"/tmp/drbc-$i"))
    }
    spark.stop()
  }
}
