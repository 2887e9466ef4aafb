package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with CUSTOM state — the
  * `flatMapGroupsWithState` twin of q17's batch gap-sessionizer (30-min
  * inactivity gap) and of the built-in `session_window` aggregation that
  * q17's spec pins against. The built-in covers count/min/max-style
  * session aggregates; this operator is the extension point for session
  * logic the built-in cannot express (per-session event ordering,
  * custom accumulators, early emission policies), so the engine carries
  * both.
  *
  * Mechanics: events are keyed by user; per-user state is one open
  * session (start, last-seen, count — O(1) per key, NOT the event
  * list). A micro-batch's events are sorted per-user in memory (bounded
  * by that user's events in the batch, not the stream) and folded into
  * the state; a gap > `gapSec` closes the open session and emits it. An
  * event-time timeout set to last-seen + gap emits the final session of
  * an idle user once the WATERMARK passes it — without the timeout an
  * idle user's last session would dangle forever, the classic
  * mapGroupsWithState leak. State volume = one small struct per user
  * active inside the watermark horizon.
  *
  * Late data beyond the watermark is dropped by the engine before the
  * function runs, so emitted sessions are final (append mode).
  */
object Sessionize {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp)
  case class Open(startUs: Long, lastUs: Long, n: Long)
  case class Session(
      user_id: Long, session_start: Timestamp, n_events: Long,
      duration_sec: Long)

  /** Exact micros: Timestamp.getTime is millis-truncated, and the events
    * table carries live microseconds (see q17's unix_micros note).
    * Shared across the streaming operators (StreamFingerprint's timeout
    * arithmetic uses exactly this rule).
    */
  private[streaming] def micros(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  /** Exact-micros session interval — [[Session]]'s lossless sibling for
    * consumers that need the endpoints (duration_sec truncates): the
    * stream-side input to interval work like
    * [[StreamSessionOverlap]].
    */
  case class Interval(
      user_id: Long, s_st_us: Long, s_en_us: Long, n_events: Long)

  private def close(userId: Long, s: Open): Session =
    Session(userId, toTs(s.startUs),
      s.n, (s.lastUs - s.startUs) / 1000000L)

  private def closeIv(userId: Long, s: Open): Interval =
    Interval(userId, s.startUs, s.lastUs, s.n)

  /** @param events streaming DataFrame with user_id, event_id, ts
    * @param watermark watermark delay on ts, e.g. "10 minutes"
    * @param gapSec inactivity gap that closes a session
    */
  def sessions(
      events: DataFrame, watermark: String,
      gapSec: Long = 1800L): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    run(events, watermark, gapSec, close)
  }

  /** [[sessions]] emitting exact-micros [[Interval]]s instead of the
    * q17-shaped display row — same state, same closure rules.
    */
  def intervals(
      events: DataFrame, watermark: String,
      gapSec: Long = 1800L): Dataset[Interval] = {
    val spark = events.sparkSession
    import spark.implicits._
    run(events, watermark, gapSec, closeIv)
  }

  private def run[T: org.apache.spark.sql.Encoder](
      events: DataFrame, watermark: String, gapSec: Long,
      emit: (Long, Open) => T): Dataset[T] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "event_id", "ts")
      // NULL keys/timestamps can't be sessionized (and would NPE the
      // primitive-Long encoder) — drop at the boundary, as elsewhere
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[Open]) =>
          if (!it.hasNext) {
            // timeout: the watermark passed last-seen + gap with no new
            // events — the open session is final
            val out = state.getOption.map(emit(userId, _)).toList
            state.remove()
            out.iterator
          } else {
            val gapUs = gapSec * 1000000L
            // sort within the batch: micro-batch arrival order is not
            // event-time order; (ts, event_id) matches q17's ordering
            val evs = it.toArray.sortBy(e => (micros(e.ts), e.event_id))
            var open = state.getOption
            val closed = List.newBuilder[T]
            for (e <- evs) {
              val us = micros(e.ts)
              open match {
                case Some(s) if us - s.lastUs > gapUs =>
                  closed += emit(userId, s)
                  open = Some(Open(us, us, 1L))
                case Some(s) =>
                  // an in-horizon straggler older than the open session's
                  // start stretches it backwards (min) — retroactive
                  // re-splitting of already-emitted sessions is the batch
                  // pass's job (q17), as with any streaming sessionizer
                  open = Some(Open(math.min(s.startUs, us),
                    math.max(s.lastUs, us), s.n + 1L))
                case None =>
                  open = Some(Open(us, us, 1L))
              }
            }
            val s = open.get
            state.update(s)
            // wake up once the watermark proves the gap elapsed
            state.setTimeoutTimestamp(s.lastUs / 1000L + gapSec * 1000L)
            closed.result().iterator
          }
      }
  }
}
