package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming constellation-fingerprint matching — e166's ONLINE form
  * (the real-time contamination / rights alarm): query clips arrive as
  * a stream of landmark-pair fingerprints, hash-join the STATIC
  * inverted index (the corpus side, built once by the batch pipeline
  * and read as a plain table — a stream-static join, no second
  * watermark, no stream-stream state), and each clip's match is
  * decided by the same offset-histogram alignment vote as the batch
  * operator: count votes per (candidate, offset-delta), winner by
  * (votes DESC, cand ASC, delta ASC).
  *
  * The vote needs ALL of a clip's joined rows, which a streaming
  * aggregation can only finalize once the clip is provably complete —
  * so the histogram lives in keyed state ([[Sessionize]]'s
  * flatMapGroupsWithState discipline): per clip, a bounded list of
  * (cand, delta, votes) entries folded batch-by-batch, emitted once
  * the event-time timeout proves no pair OLDER than last-seen + quiet
  * can still arrive (watermark). Late rows beyond the watermark are
  * dropped by the engine before the function runs, so each emitted
  * verdict is final over the pairs it saw (append mode).
  *
  * Producer contract (`quietSec`): one clip's pairs must span less
  * than the quiet gap in EVENT time — a fingerprinter emits a clip's
  * pairs in one shot, so this holds by construction. A producer that
  * violates it (a same-clip pair whose event time lands past the
  * already-fired timeout) gets a SECOND, independent verdict over the
  * late pairs — deterministic and visible, never a silently merged
  * histogram; re-unifying such fragments is the batch operator's job
  * (the [[Sessionize]] open-tail precedent, spec-pinned).
  *
  * State per clip is bounded by its DISTINCT (candidate, delta)
  * matches — hash selectivity keeps that near the clip's own pair
  * count on unrelated corpora (the batch operator's candidate
  * argument); it is the per-clip working set a batch matcher holds
  * anyway, held only inside the watermark horizon.
  */
object StreamFingerprint {

  /** One joined hit: a clip landmark-pair matched an index pair.
    * (Public, not private: Catalyst's generated encoder projections
    * cannot access private classes — the Sessionize convention.)
    */
  case class Hit(clip_id: Long, cand: Long, delta: Long, ts: Timestamp)

  case class Vote(cand: Long, delta: Long, n: Long)

  case class Pending(votes: Seq[Vote], lastUs: Long)

  /** Final per-clip verdict — the batch operator's winner columns. */
  final case class FpMatch(
      clip_id: Long, matched_doc: Long, offset_win: Long, votes: Long)

  private def micros(t: Timestamp): Long = Sessionize.micros(t)

  /** @param clipPairs streaming frame: clip_id, t1c, h, ts — the clip's
    *                  constellation pairs (the batch pipeline's `pc`
    *                  shape plus an event time)
    * @param index     static frame: cand, t1d, h — the corpus inverted
    *                  index (the batch pipeline's `pd` shape)
    * @param watermark watermark delay on ts, e.g. "10 minutes"
    * @param quietSec  event-time quiet gap after a clip's last pair
    *                  that finalizes its verdict
    */
  def matches(
      clipPairs: DataFrame, index: DataFrame, watermark: String,
      quietSec: Long = 60L): Dataset[FpMatch] = {
    val spark = clipPairs.sparkSession
    import spark.implicits._
    clipPairs
      .where(col("clip_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .join(index, "h") // stream-static: per-batch join, no added state
      .select(col("clip_id"), col("cand"),
        (col("t1d") - col("t1c")).as("delta"), col("ts"))
      .as[Hit]
      .groupByKey(_.clip_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (clipId: Long, it: Iterator[Hit], state: GroupState[Pending]) =>
          if (!it.hasNext) {
            // timeout: watermark passed last-seen + quiet — the
            // histogram is complete, emit the argmax verdict
            val out = state.getOption.map { p =>
              val w = p.votes.minBy(v => (-v.n, v.cand, v.delta))
              FpMatch(clipId, w.cand, w.delta, w.n)
            }.toList
            state.remove()
            out.iterator
          } else {
            val prev = state.getOption.getOrElse(Pending(Nil, 0L))
            val acc = scala.collection.mutable.Map.empty[(Long, Long), Long]
            prev.votes.foreach(v => acc((v.cand, v.delta)) = v.n)
            var last = prev.lastUs
            for (h <- it) {
              acc((h.cand, h.delta)) =
                acc.getOrElse((h.cand, h.delta), 0L) + 1L
              last = math.max(last, micros(h.ts))
            }
            val next = Pending(
              acc.toSeq.map { case ((c, d), n) => Vote(c, d, n) }, last)
            state.update(next)
            // wake once the watermark proves the quiet gap elapsed
            state.setTimeoutTimestamp(last / 1000L + quietSec * 1000L)
            Iterator.empty
          }
      }
  }
}
