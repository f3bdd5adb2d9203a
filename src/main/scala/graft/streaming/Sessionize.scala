package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful processing (SURVEY.md §2.9 surface:
  * `KeyValueGroupedDataset.flatMapGroupsWithState`): gap-based user
  * sessionization over the events stream.
  *
  * A session = consecutive events of one user with gaps < `gapMinutes`.
  * State per user is one open session (bounded: O(|active users|)), closed
  * and emitted when the event-time watermark passes its gap horizon — the
  * streaming-correct definition, not a processing-time approximation.
  *
  * `sessionizeBatch` is the batch-equivalent plan (lag window → gap flags
  * → running session ids) used to cross-check results in tests: for any
  * fully-arrived input, streaming output must equal the batch output.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, end: Long, n: Int, sum: Double)
  final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                               session_end: java.sql.Timestamp, n_events: Int,
                               sum_value: Double)

  /** Streaming sessionization. Input must carry (user_id, ts, value) with
    * a watermark already set on ts. */
  // (helpers live inside the method: closures must not capture this object)
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int)
                      (implicit spark: SparkSession): Dataset[UserSession] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L

    // epoch microseconds — java.sql.Timestamp keeps sub-ms precision in
    // nanos; getTime alone would truncate to ms and disagree with the
    // batch plan's unix_micros. Local defs: a method on the enclosing
    // object would drag the (non-serializable) object into the closure.
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def fromMicros(us: Long): java.sql.Timestamp = {
      // floorDiv/floorMod: plain /,% go negative for pre-1970 instants
      // and setNanos throws on negative values
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    def toSession(uid: Long, s: SessionState): UserSession =
      UserSession(uid, fromMicros(s.start), fromMicros(s.end), s.n, s.sum)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed the open session's gap horizon → close it
            val out = state.getOption.map(toSession(uid, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.end < gapUs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= toSession(uid, s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout API takes milliseconds
              state.setTimeoutTimestamp(Math.floorDiv(s.end, 1000L) + gapMinutes * 60000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Batch-equivalent: lag-gap flags + running sum of flags = session id,
    * then one aggregation — two window passes + one shuffle on user_id. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("__prev")) >= gapMinutes * 60000000L, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__new_session"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).cast("int").as("n_events"),
        sum(col("value")).as("sum_value"))
      .drop("__sid")
  }
}
