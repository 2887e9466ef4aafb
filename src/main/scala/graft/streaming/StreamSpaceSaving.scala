package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming per-key SpaceSaving heavy hitters (Metwally, Agrawal,
  * El Abbadi, ICDT'05) — the stateful STREAM member of the
  * heavy-hitter family: e29's batch Misra-Gries DECREMENTS (candidate
  * counts underestimate, so e29 needs a second exact pass), while
  * SpaceSaving EVICTS-AND-INHERITS — a new item takes over the minimum
  * counter at `min+1` and records `err = min` — so every tracked count
  * OVERESTIMATES with a per-item error certificate:
  * `count − err ≤ true ≤ count`. That certificate is what a stream can
  * act on without a second pass: `count − err > t` PROVES the item
  * exceeds `t` right now, which no MG sketch can do mid-stream.
  *
  * Guarantees maintained per key (k counters):
  *  - Σ counts = n_seen exactly (each arrival increments total by 1 —
  *    the conservation invariant the spec pins);
  *  - every item with true count > n_seen/k is tracked;
  *  - every err ≤ min counter ≤ n_seen/k.
  *
  * State is BOUNDED by construction: k (item, count, err) triples per
  * key. Content is ARRIVAL-ORDER dependent (which item inherits which
  * counter depends on interleaving), so there is no bit-exact
  * stream-equals-batch — the spec asserts the paper's guarantees
  * against exact batch counts instead, which hold under ANY order.
  * Replay caveat: like [[StreamCms]], counters are linear — duplicate
  * delivery inflates counts but never breaks one-sidedness
  * (`true ≤ count` survives replay; the `count − err ≤ true` lower
  * bound is what replay can violate, so guaranteed-heavy decisions
  * belong behind an exactly-once sink or an upstream dedup gate like
  * [[StreamDedup]]).
  *
  * Eviction here is a linear min-scan (k is tens); the paper's
  * Stream-Summary doubly-linked bucket list makes it O(1) — a
  * constant-factor knob, not a semantics change.
  */
object StreamSpaceSaving {

  /** One observation of `item` in `key`'s population. */
  final case class Obs(key: String, item: Long)

  /** Counter table for one key, sorted by (count desc, item asc):
    * parallel arrays of tracked items, their overestimating counts,
    * and their inherited-error certificates.
    */
  final case class Summary(
      key: String, n_seen: Long,
      items: Seq[Long], counts: Seq[Long], errs: Seq[Long])

  /** State row: parallel counter arrays plus the lifetime count
    * (public: the state encoder's generated code constructs it).
    */
  final case class State(
      items: Vector[Long], counts: Vector[Long], errs: Vector[Long],
      nSeen: Long)

  private def update(k: Int)(
      key: String, rows: Iterator[Obs],
      state: GroupState[State]): Summary = {
    val prev = state.getOption.getOrElse(
      State(Vector.empty, Vector.empty, Vector.empty, 0L))
    val items = scala.collection.mutable.ArrayBuffer(prev.items: _*)
    val counts = scala.collection.mutable.ArrayBuffer(prev.counts: _*)
    val errs = scala.collection.mutable.ArrayBuffer(prev.errs: _*)
    val idx = scala.collection.mutable.HashMap(
      items.zipWithIndex.toSeq: _*)
    var seen = prev.nSeen
    rows.foreach { r =>
      seen += 1
      idx.get(r.item) match {
        case Some(i) => counts(i) += 1L
        case None if items.size < k =>
          idx(r.item) = items.size
          items += r.item; counts += 1L; errs += 0L
        case None =>
          // evict the minimum counter; ties to the LOWER slot index —
          // deterministic given the state, though the state itself is
          // arrival-order shaped (see scaladoc)
          var m = 0
          var i = 1
          while (i < counts.size) {
            if (counts(i) < counts(m)) m = i
            i += 1
          }
          idx.remove(items(m))
          idx(r.item) = m
          errs(m) = counts(m)
          counts(m) += 1L
          items(m) = r.item
      }
    }
    val next = State(items.toVector, counts.toVector, errs.toVector, seen)
    state.update(next)
    val order = items.indices.sortBy(i => (-counts(i), items(i)))
    Summary(key, seen,
      order.map(items(_)), order.map(counts(_)), order.map(errs(_)))
  }

  /** Per-key SpaceSaving summary over an item stream; emits the
    * updated counter table for each touched key per micro-batch
    * (outputMode=update).
    */
  def monitor(events: Dataset[Obs], k: Int): Dataset[Summary] = {
    require(k > 0, "k must be positive")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[State, Summary](
        GroupStateTimeout.NoTimeout)(update(k))
  }
}
