package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift alarms — the online twin of
  * [[graft.operators.TimeSeries.cusum]]'s batch closed form, for the
  * monitoring path where "the metric drifted" must fire DURING
  * ingestion, not at the nightly audit.
  *
  * Page's recurrences per key, in exact integer cents against a FIXED
  * target (streaming cannot know the global mean; the target is the
  * SLO/setpoint, which is also the textbook CUSUM formulation):
  *
  *   S⁺ ← max(0, S⁺ + (x − target − slack))
  *   S⁻ ← max(0, S⁻ − (x − target + slack))
  *
  * State per key is two longs + the last-processed position — O(keys),
  * no event retention. Within a micro-batch, rows apply in (ts, seq)
  * order; the caller guarantees cross-batch order per key (or accepts
  * batch-boundary reordering, the standard streaming-CUSUM caveat —
  * the spec replays single-batch and multi-batch splits and checks
  * both equal the offline recurrence when order holds).
  *
  * Emits one row per INPUT event (the alarm trail, replayable against
  * the batch op): key, seq, s_pos, s_neg, alarm.
  */
object StreamCusum {

  final case class Obs(key: String, seq: Long, cents: Long)
  final case class CusumState(sPos: Long, sNeg: Long)
  final case class CusumOut(key: String, seq: Long, s_pos: Long,
                            s_neg: Long, alarm: Boolean)

  def cusumStream(obs: Dataset[Obs], targetCents: Long, slackCents: Long,
                  thresholdCents: Long)
                 (implicit spark: SparkSession): Dataset[CusumOut] = {
    import spark.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Obs], state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L))
          val out = rows.toSeq.sortBy(_.seq).map { o =>
            val d = o.cents - targetCents
            val sPos = math.max(0L, st.sPos + d - slackCents)
            val sNeg = math.max(0L, st.sNeg - d - slackCents)
            st = CusumState(sPos, sNeg)
            CusumOut(o.key, o.seq, sPos, sNeg,
              sPos > thresholdCents || sNeg > thresholdCents)
          }
          state.update(st)
          out.iterator
      }
  }

  /** Offline reference: the same recurrence as a driver-side fold —
    * what any replay of the full, ordered input must equal. */
  def referenceTrail(xs: Seq[(String, Long, Long)], targetCents: Long,
                     slackCents: Long, thresholdCents: Long): Seq[CusumOut] =
    xs.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      var sPos = 0L
      var sNeg = 0L
      rows.sortBy(_._2).map { case (_, seq, cents) =>
        val d = cents - targetCents
        sPos = math.max(0L, sPos + d - slackCents)
        sNeg = math.max(0L, sNeg - d - slackCents)
        CusumOut(k, seq, sPos, sNeg,
          sPos > thresholdCents || sNeg > thresholdCents)
      }
    }.sortBy(o => (o.key, o.seq))
}
