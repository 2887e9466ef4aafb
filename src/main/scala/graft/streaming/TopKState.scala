package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming per-key top-k — the stateful twin of e43's per-source
  * quota: maintain, per key, the k best (score, id) entries seen so far
  * on an unbounded stream, emitting the updated leaderboard for every
  * key touched by a micro-batch (outputMode=update).
  *
  * State is BOUNDED by construction: exactly ≤ k (score, id) pairs per
  * key, merged incrementally — the streaming analogue of the batch
  * WindowGroupLimit (map-side top-k) and of [[graft.functions
  * .sketches.MinKAgg]]'s bounded buffer. At scale the state store
  * hash-partitions by key across executors; a hot key costs k entries
  * like any other. Deterministic ordering: higher score wins, ties
  * break to the LOWER id, so replayed micro-batches (at-least-once
  * sources) converge to the same leaderboard — entry identity (id) is
  * deduplicated in-state, making the update idempotent under replay.
  */
object TopKState {

  final case class Scored(key: String, id: Long, score: Long)

  final case class Leaderboard(key: String, ids: Seq[Long], scores: Seq[Long])

  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def update(k: Int)(
      key: String, rows: Iterator[Scored],
      state: GroupState[Leaderboard]): Leaderboard = {
    val prev = state.getOption
      .map(l => l.ids.zip(l.scores)).getOrElse(Seq.empty)
    // replace-on-reobserve: same id keeps its best score (idempotent
    // under source replay), then keep the k best
    val merged = (prev ++ rows.map(r => r.id -> r.score))
      .groupBy(_._1).map { case (id, vs) => id -> vs.map(_._2).max }
      .toSeq
      .sortWith(better)
      .take(k)
    val next = Leaderboard(key, merged.map(_._1), merged.map(_._2))
    state.update(next)
    next
  }

  /** Per-key top-`k` leaderboard over a stream of scored entries. */
  def topK(events: Dataset[Scored], k: Int): Dataset[Leaderboard] = {
    require(k > 0, "k must be positive")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[Leaderboard, Leaderboard](
        GroupStateTimeout.NoTimeout)(update(k))
  }
}
