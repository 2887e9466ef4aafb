package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming session × incident interval-overlap — q60's ONLINE form,
  * composed from two pieces the engine already owns: [[Sessionize]]'s
  * exact-micros closed-session stream and
  * [[graft.operators.RangeJoin.intervalOverlap]]'s grid-cell claim-cell
  * join, here as a stream-STATIC join (the incident set is the known
  * side — a maintenance calendar, an outage log — and Spark broadcasts
  * it; no second watermark, no stream-stream state).
  *
  * Semantics vs q60: identical overlap rule (CLOSED intervals, point
  * touches count, exact-micros durations) restricted to sessions the
  * stream has CLOSED — a gap-closed or watermark-timed-out session is
  * final (append mode), so every emitted overlap row is final too.
  * q60's batch pass stays the source of truth for OPEN tails: a
  * still-open session has no right endpoint yet, and any "overlap so
  * far" emission would have to be retracted as the session grows —
  * exactly the non-final row append mode exists to forbid. The spec
  * pins emitted rows equal to the batch overlap computation over the
  * closed-session set, AND the full handoff identity: at any cut
  * point, stream rows ∪ batch q60 over the not-yet-closed events
  * (open tails replayed in full, plus post-cut arrivals) equals the
  * all-events batch result, with no row claimed by both legs — a
  * session spanning the cut surfaces once, from the batch leg, at its
  * full extent.
  *
  * Scale: session state is [[Sessionize]]'s O(1)-per-active-user
  * struct; the overlap side adds NO state at all — each closed session
  * explodes to its covering grid cells and hash-joins the broadcast
  * incident cells within its micro-batch, the claim-cell rule keeping
  * each (session, incident) pair exactly once with no pair-grain
  * dedup. Incident sets large enough to outgrow a broadcast shift to
  * the batch q60; this operator's contract is the bounded-static-side
  * case.
  */
object StreamSessionOverlap {

  /** Per closed session × overlapped incident: exact-micros overlap.
    * Columns: incident_id, user_id, s_st_us, s_en_us, ov_us.
    */
  def overlaps(
      events: DataFrame, incidents: DataFrame, watermark: String,
      gapSec: Long = 1800L, cell: Long = 3600000000L): DataFrame = {
    val sess = Sessionize.intervals(events, watermark, gapSec).toDF()
    graft.operators.RangeJoin
      .intervalOverlap(sess, "s_st_us", "s_en_us",
        broadcast(incidents), "i_st", "i_en", cell)
      .select(col("incident_id"), col("user_id"),
        col("s_st_us"), col("s_en_us"),
        (least(col("s_en_us"), col("i_en"))
          - greatest(col("s_st_us"), col("i_st"))).as("ov_us"))
  }
}
