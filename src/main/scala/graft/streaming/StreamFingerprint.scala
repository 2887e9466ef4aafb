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
  * Index contract (`dfCap`): the batch operator excludes index hashes
  * with df > 256 from voting — a landmark pair shared by hundreds of
  * documents is corpus boilerplate with no identification value — and
  * that cap is ALSO this operator's state bound: one uncapped
  * boilerplate hash fans a single clip pair into up to df distinct
  * (cand, delta) state entries, exactly the blowup the cap exists to
  * prevent. So the cap is applied HERE, to whatever index the caller
  * passes (the raw `pd` shape is fine): a df census plus one semi
  * join, both static-side-only. Pass dfCap = 0 only when the index is
  * already the batch pipeline's capped `pdc` table (at fleet scale the
  * capped index is what the batch pass materializes — recomputing the
  * census per micro-batch is then wasted static-side work).
  *
  * State per clip is bounded by its DISTINCT (candidate, delta)
  * matches over the CAPPED index — df-cap selectivity keeps that near
  * the clip's own pair count on any corpus (the batch operator's
  * boilerplate argument), held only inside the watermark horizon.
  *
  * Verdict margin (the batch operator's abstain rule): `margin` =
  * winner votes − runner-up votes over the clip's (cand, delta)
  * histogram; below `marginFloor` the verdict is 'abstain' instead of
  * 'match' — for a contamination / rights ALARM a wrong confident
  * match is worse than an abstain, and the batch operator's measured
  * misses are precisely deterministic vote TIES (margin 0) on 2–4-pair
  * snippets.
  */
object StreamFingerprint {

  /** One joined hit: a clip landmark-pair matched an index pair.
    * (Public, not private: Catalyst's generated encoder projections
    * cannot access private classes — the Sessionize convention.)
    */
  case class Hit(clip_id: Long, cand: Long, delta: Long, ts: Timestamp)

  case class Vote(cand: Long, delta: Long, n: Long)

  case class Pending(votes: Seq[Vote], lastUs: Long)

  /** Final per-clip verdict — the batch operator's winner columns plus
    * its margin/abstain pair.
    */
  final case class FpMatch(
      clip_id: Long, matched_doc: Long, offset_win: Long, votes: Long,
      margin: Long, verdict: String)

  private def micros(t: Timestamp): Long = Sessionize.micros(t)

  /** @param clipPairs streaming frame: clip_id, t1c, h, ts — the clip's
    *                  constellation pairs (the batch pipeline's `pc`
    *                  shape plus an event time)
    * @param index     static frame: cand, t1d, h — the corpus inverted
    *                  index (the batch pipeline's `pd` shape; capped
    *                  here per `dfCap`)
    * @param watermark watermark delay on ts, e.g. "10 minutes"
    * @param quietSec  event-time quiet gap after a clip's last pair
    *                  that finalizes its verdict
    * @param dfCap     max index df per hash admitted to voting (the
    *                  batch operator's 256); 0 = caller passes the
    *                  pre-capped index
    * @param marginFloor minimum winner-minus-runner-up vote margin for
    *                  a 'match' verdict; below it the clip abstains
    */
  def matches(
      clipPairs: DataFrame, index: DataFrame, watermark: String,
      quietSec: Long = 60L, dfCap: Long = 256L,
      marginFloor: Long = 1L): Dataset[FpMatch] = {
    val spark = clipPairs.sparkSession
    import spark.implicits._
    // Materialized ONCE at wiring time: the static side of a
    // stream-static join is re-evaluated on every micro-batch, so an
    // unpersisted census would re-aggregate the whole index per batch
    // — the exact per-batch waste the dfCap=0 escape hatch documents,
    // silently paid on the default path too (r14 ADVICE). persist()
    // (memory-and-disk, spill-safe for a corpus-scale index) pins the
    // capped frame for the stream's lifetime, which IS the lifetime
    // that needs it; the first batch pays the census once. CAVEAT:
    // each wiring call pins its own copy for the session (no teardown
    // hook exists on a streaming plan) — a caller re-wiring repeatedly
    // in one long-lived session should pass the pre-capped index with
    // dfCap = 0 and manage its persistence itself.
    val capped =
      if (dfCap <= 0L) index
      else index.join(
        index.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") <= dfCap).select("h"), "h")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    clipPairs
      .where(col("clip_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .join(capped, "h") // stream-static: per-batch join, no added state
      .select(col("clip_id"), col("cand"),
        (col("t1d") - col("t1c")).as("delta"), col("ts"))
      .as[Hit]
      .groupByKey(_.clip_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (clipId: Long, it: Iterator[Hit], state: GroupState[Pending]) =>
          // the documented GroupState contract, not iterator emptiness:
          // an empty-iterator invocation WITHOUT timeout must not fire
          // a premature verdict and destroy the clip's state
          if (state.hasTimedOut) {
            // timeout: watermark passed last-seen + quiet — the
            // histogram is complete, emit the margin-gated verdict
            val out = state.getOption.map { p =>
              val sorted = p.votes.sortBy(v => (-v.n, v.cand, v.delta))
              val w = sorted.head
              val margin =
                w.n - sorted.drop(1).headOption.map(_.n).getOrElse(0L)
              FpMatch(clipId, w.cand, w.delta, w.n, margin,
                if (margin >= marginFloor) "match" else "abstain")
            }.toList
            state.remove()
            out.iterator
          } else if (!it.hasNext) {
            Iterator.empty
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
