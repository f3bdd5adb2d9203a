package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  def ts(m: Int) = new java.sql.Timestamp(3600000L + m * 60000L)

  // user 1: two sessions (gap 30m ≥ 10m); user 2: one session
  def eventsSeq = Seq(
    Sessionize.Event(1L, ts(0), 1.0),
    Sessionize.Event(1L, ts(5), 2.0),
    Sessionize.Event(1L, ts(35), 4.0),
    Sessionize.Event(1L, ts(38), 8.0),
    Sessionize.Event(2L, ts(1), 16.0)
  )

  test("batch sessionization: gap splitting, bounds, aggregates") {
    import spark.implicits._
    val df = eventsSeq.toDF()
    val r = Sessionize.sessionizeBatch(df, gapMinutes = 10)
      .orderBy("user_id", "session_start").collect()
    assert(r.length === 3)
    val s1 = r(0)
    assert(s1.getAs[Long]("user_id") === 1L)
    assert(s1.getAs[java.sql.Timestamp]("session_start") === ts(0))
    assert(s1.getAs[java.sql.Timestamp]("session_end") === ts(5))
    assert(s1.getAs[Int]("n_events") === 2 && s1.getAs[Double]("sum_value") === 3.0)
    assert(r(1).getAs[Double]("sum_value") === 12.0)
    assert(r(2).getAs[Long]("user_id") === 2L && r(2).getAs[Int]("n_events") === 1)
  }

  test("batch and stream agree at sub-second timestamp precision") {
    implicit val s = spark
    import s.implicits._
    // gap 1 minute; actual gap 59.4s spans a whole-second boundary:
    // second-truncated arithmetic would split, microsecond math must not
    def tsMs(ms: Long) = new java.sql.Timestamp(ms)
    val evs = Seq(
      Sessionize.Event(1L, tsMs(900), 1.0),
      Sessionize.Event(1L, tsMs(60300), 2.0),
      Sessionize.Event(1L, tsMs(200000), 4.0))
    val batch = Sessionize.sessionizeBatch(evs.toDF(), gapMinutes = 1)
      .orderBy("session_start").collect()
    assert(batch.length === 2)
    assert(batch(0).getAs[Int]("n_events") === 2) // 0.9s + 60.3s same session

    // same data through the STREAMING path: the first session closes when
    // the 200s event opens a new one, and must match batch's first session
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_subsec").toString
    evs.toDF().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(evs.toDF().schema).parquet(dir)
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.Event]
    val q = Sessionize.sessionizeStream(stream, gapMinutes = 1)
      .writeStream.outputMode("append").format("memory").queryName("subsec_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("subsec_out")
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(_.toString)
    val want = batch.take(1)
      .map(r => org.apache.spark.sql.Row(
        r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("session_start"),
        r.getAs[java.sql.Timestamp]("session_end"), r.getAs[Int]("n_events"),
        r.getAs[Double]("sum_value")).toString)
    assert(got.toSeq === want.toSeq)
  }

  test("streaming sessionization emits gap-closed sessions matching batch") {
    implicit val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    eventsSeq.toDF().write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(eventsSeq.toDF().schema).parquet(dir)
      .withWatermark("ts", "0 seconds")
      .as[Sessionize.Event]
    val q = Sessionize.sessionizeStream(stream, gapMinutes = 10)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sess_out")
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(_.toString).toSet
    // within one batch, only sessions closed by a LATER event emit;
    // user 1's first session is closed by its second session's start
    val batch = Sessionize.sessionizeBatch(eventsSeq.toDF(), 10)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect().map(_.toString).toSet
    assert(got.nonEmpty)
    assert(got.subsetOf(batch))
    assert(got.exists(_.contains("1970-01-01 01:00:00"))) // user 1 session 1 closed
  }
}
