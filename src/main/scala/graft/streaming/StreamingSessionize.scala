package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}

/**
 * Streaming gap-based sessionization with EVENT-TIME state timeout — the
 * streaming sibling of the batch vq22 query (a gap longer than
 * `gapSeconds` starts a new session):
 *
 *  - per-user session state merges each micro-batch's events into the
 *    open session, emitting any sessions the batch itself closes;
 *  - the open session closes through the WATERMARK: when event time
 *    passes `session end + gap`, the state times out and the final
 *    session row is emitted — no unbounded state, no polling.
 *
 * Scale shape: state is one (start, end, n) triple per ACTIVE user,
 * sharded by the groupBy key; the watermark bounds both state lifetime
 * and late-data acceptance. Events later than the watermark are dropped
 * by the engine before reaching the function (standard watermark
 * semantics); in-batch disorder is handled by sorting the batch.
 */
object StreamingSessionize {

  /** Emitted row: one completed session. */
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Open-session state in epoch millis. */
  case class OpenSession(start: Long, end: Long, n: Long)

  /**
   * @param events     streaming DataFrame
   * @param userCol    grouping key column (cast to long)
   * @param tsCol      event-time column (must carry the watermark)
   * @param gapSeconds inactivity gap that closes a session
   * @param watermark  late-data horizon, e.g. "1 hour"
   */
  def apply(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapSeconds: Long = 1800L,
      watermark: String = "1 hour"): Dataset[Session] = {
    implicit val sessEnc: Encoder[Session] = Encoders.product[Session]
    implicit val stateEnc: Encoder[OpenSession] = Encoders.product[OpenSession]
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    implicit val pairEnc: Encoder[(Long, java.sql.Timestamp)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.TIMESTAMP)
    val gapMs = gapSeconds * 1000L

    events
      .withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long"), col(tsCol))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) => {
          def emit(s: OpenSession) = Session(user,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n)
          if (state.hasTimedOut) {
            // watermark passed end + gap: the open session is final
            val s = state.get
            state.remove()
            Iterator.single(emit(s))
          } else {
            val times = rows.map(_._2.getTime).toArray
            java.util.Arrays.sort(times)
            val closed = List.newBuilder[OpenSession]
            var cur = state.getOption.orNull
            times.foreach { t =>
              if (cur == null) cur = OpenSession(t, t, 1)
              else if (t - cur.end <= gapMs)
                cur = OpenSession(cur.start, math.max(cur.end, t), cur.n + 1)
              else { closed += cur; cur = OpenSession(t, t, 1) }
            }
            state.update(cur)
            // the timeout must sit beyond the current watermark; a very
            // late (but in-horizon) batch could otherwise set it in the past
            state.setTimeoutTimestamp(
              math.max(cur.end + gapMs, state.getCurrentWatermarkMs() + 1))
            closed.result().iterator.map(emit)
          }
        })
  }
}
