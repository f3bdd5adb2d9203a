package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Streaming CUSUM: recurrence parity with the offline reference in
  * one batch and across micro-batch boundaries; alarm on a planted
  * level shift; bounded state (output carries no history). */
class StreamCusumSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  // key "stable" oscillates around the target; key "drift" shifts +30
  // from seq 20 — S+ must cross the threshold soon after
  private val rows: Seq[(String, Long, Long)] =
    (0L until 40L).map(i => ("stable", i, 100L + (if (i % 2 == 0) 3 else -3))) ++
      (0L until 40L).map(i => ("drift", i, if (i < 20) 100L else 130L))

  private def runStream(batches: Seq[Seq[(String, Long, Long)]]): Seq[StreamCusum.CusumOut] = {
    implicit val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_scusum").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      b.map(t => StreamCusum.Obs(t._1, t._2, t._3)).toDF()
        .coalesce(1).write.mode(if (i == 0) "overwrite" else "append")
        .parquet(s"$dir/data")
    }
    val stream = spark.readStream
      .schema("key STRING, seq BIGINT, cents BIGINT")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/data")
      .as[StreamCusum.Obs]
    val name = s"scusum_${System.identityHashCode(batches)}"
    val q = StreamCusum.cusumStream(stream, targetCents = 100L,
        slackCents = 5L, thresholdCents = 100L)
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).as[StreamCusum.CusumOut].collect().toSeq
      .sortBy(o => (o.key, o.seq))
  }

  test("single-batch stream equals the offline recurrence; drift alarms, stable never does") {
    val got = runStream(Seq(rows))
    val ref = StreamCusum.referenceTrail(rows, 100L, 5L, 100L)
    assert(got === ref)
    assert(got.filter(_.key == "stable").forall(!_.alarm))
    val firstAlarm = got.filter(o => o.key == "drift" && o.alarm).map(_.seq)
    assert(firstAlarm.nonEmpty && firstAlarm.min >= 20L && firstAlarm.min <= 26L)
  }

  test("state carries across micro-batches: split replay equals single-batch replay") {
    val (b1, b2) = rows.partition(_._2 < 25L)
    val got = runStream(Seq(b1, b2))
    val ref = StreamCusum.referenceTrail(rows, 100L, 5L, 100L)
    assert(got === ref)
  }
}
