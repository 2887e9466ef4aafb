package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.Portable

/** Streaming per-key distinct-cardinality monitor — the stateful twin of
  * e60's KMV sketch ([[graft.functions.sketches.KmvAgg]]): maintain, per
  * key, the k smallest DISTINCT hash values seen on an unbounded stream
  * and emit the updated cardinality estimate for every key a micro-batch
  * touches (outputMode=update). The ops use-case is ingest monitoring:
  * per-source distinct-document (or distinct-shingle) counts tracked
  * continuously, without ever storing the observed value set.
  *
  * State is BOUNDED by construction: ≤ k longs per key regardless of
  * stream length — the property that makes the monitor viable where a
  * streaming `count(DISTINCT …)` is not (exact distinct state grows with
  * the CARDINALITY of the data; at 100 TB that is the corpus itself).
  * Because the sketch is a set of minima, the update is idempotent under
  * at-least-once replay and the cross-batch merge is exactly the batch
  * aggregate's merge — a streaming state row and a batch partial buffer
  * are the same summary, so the spec cross-checks the stream against
  * [[graft.functions.sketches.KmvAgg]] over the same data verbatim.
  *
  * The estimate is the e60 estimator, same integer arithmetic:
  * `(k−1)·P div h_k` when the sketch is full, else the sketch size
  * (exact by construction below k distinct values).
  */
object CardinalityState {

  /** One observation: a pre-hashed value in [0, [[Portable.P]]) for
    * `key`'s population (hash upstream with `poly_hash`/`word_hashes` —
    * the monitor is hash-domain-agnostic but the estimator assumes
    * uniformity on [0, P)).
    */
  final case class Obs(key: String, h: Long)

  /** Monitor output: observed row count, current sketch occupancy, and
    * the cardinality estimate for the key.
    */
  final case class Card(
      key: String, n_seen: Long, sketch_size: Int, estimate: Long)

  /** State row: the ≤ k smallest distinct hashes (ascending) plus the
    * lifetime observation count.
    */
  final case class Sketch(mins: Seq[Long], nSeen: Long)

  private def update(k: Int)(
      key: String, rows: Iterator[Obs],
      state: GroupState[Sketch]): Card = {
    val prev = state.getOption.getOrElse(Sketch(Seq.empty, 0L))
    val set = new java.util.TreeSet[java.lang.Long]()
    prev.mins.foreach(set.add(_))
    var seen = prev.nSeen
    rows.foreach { r =>
      seen += 1
      if (set.size < k) set.add(r.h)
      else if (r.h < set.last) {
        if (set.add(r.h)) { set.remove(set.last); () }
      }
    }
    val mins = {
      val b = Seq.newBuilder[Long]
      val it = set.iterator()
      while (it.hasNext) b += it.next()
      b.result()
    }
    state.update(Sketch(mins, seen))
    val estimate =
      if (mins.size < k) mins.size.toLong
      else (k - 1).toLong * Portable.P / mins.last
    Card(key, seen, mins.size, estimate)
  }

  /** Per-key KMV cardinality estimates over a stream of hashed
    * observations; emits one updated [[Card]] per touched key per
    * micro-batch.
    */
  def distinctEstimate(events: Dataset[Obs], k: Int): Dataset[Card] = {
    require(k > 1, "KMV sketch size k must be > 1")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[Sketch, Card](
        GroupStateTimeout.NoTimeout)(update(k))
  }
}
