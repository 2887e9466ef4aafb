package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming 1-D Wasserstein drift monitor — the stateful twin of
  * e154's batch earth-mover report: maintain, per key (source, slice,
  * …), an exact VALUE census of an integer measurement stream (doc
  * length, token count) and emit W₁ against a fixed REFERENCE census
  * after every micro-batch that touches the key. PSI ([[StreamPsi]])
  * alarms on how much mass sits in the wrong bucket; W₁ also prices
  * how FAR it moved — the early-warning a token-budget planner wants
  * when a source's documents start growing.
  *
  * The metric is e154's closed form on the merged ordered support:
  * W₁ = Σᵢ |cum_s·N_ref − cum_ref·n| · (vᵢ₊₁ − vᵢ) / (n·N_ref), the
  * numerator accumulated EXACTLY (BigInt — fleet-scale products
  * overflow Long), one float division at the end, rounded to
  * milli-units. Counts are additive, so state after any interleaving
  * of micro-batches equals the batch census over the union of
  * observations — the emitted W₁ is exactly e154's number on the same
  * data (the strongest stream-equals-batch contract, same class as
  * [[StreamLogHist]]).
  *
  * State per key is one (value → count) map bounded by the
  * measurement's CODOMAIN (distinct lengths, not stream length), with
  * a hard `maxSupport` backstop: once a key's support is full, UNSEEN
  * values are dropped (the StreamDiurnal degrade rule — a pathological
  * key loses observations, it does not grow state without bound or
  * kill the query). Additive counting state is NOT idempotent under
  * at-least-once replay — same caveat and remedy as [[StreamDrift]]
  * (exactly-once source or a [[StreamDedup]] admission gate).
  */
object StreamW1 {

  /** One observation: integer measurement `v` (e.g. n_chars) for `key`. */
  final case class Obs(key: String, v: Int)

  /** Monitor output for one touched key: lifetime observation count,
    * current W₁ vs the reference in milli-units of the measurement,
    * and the count of observations dropped by the support backstop.
    */
  final case class W1(key: String, n_obs: Long, w1_milli: Long,
      n_dropped: Long)

  /** State row: exact value census + lifetime and dropped counts. */
  final case class Census(counts: Map[Int, Long], nObs: Long,
      nDropped: Long)

  /** e154's transport sum on the merged ordered support — exact BigInt
    * numerator, one rounded float division. Public within the package
    * so the spec replays it verbatim.
    */
  private[streaming] def w1Milli(
      counts: Map[Int, Long], n: Long,
      ref: Map[Int, Long], nRef: Long): Long = {
    if (n == 0 || nRef == 0) return 0L
    val support = (counts.keySet ++ ref.keySet).toArray.sorted
    var cumS = 0L
    var cumR = 0L
    var num = BigInt(0)
    var i = 0
    while (i < support.length - 1) {
      val v = support(i)
      cumS += counts.getOrElse(v, 0L)
      cumR += ref.getOrElse(v, 0L)
      num += (BigInt(cumS) * nRef - BigInt(cumR) * n).abs *
        (support(i + 1).toLong - v.toLong)
      i += 1
    }
    math.round(1000.0 * num.toDouble / (n.toDouble * nRef))
  }

  private def update(ref: Map[Int, Long], nRef: Long, maxSupport: Int)(
      key: String, rows: Iterator[Obs],
      state: GroupState[Census]): W1 = {
    val counts = scala.collection.mutable.Map.empty[Int, Long]
    var n = 0L
    var dropped = 0L
    state.getOption.foreach { c =>
      counts ++= c.counts
      n = c.nObs
      dropped = c.nDropped
    }
    rows.foreach { o =>
      if (counts.contains(o.v) || counts.size < maxSupport) {
        counts(o.v) = counts.getOrElse(o.v, 0L) + 1L
        n += 1
      } else dropped += 1
    }
    state.update(Census(counts.toMap, n, dropped))
    W1(key, n, w1Milli(counts.toMap, n, ref, nRef), dropped)
  }

  /** Per-key W₁-vs-reference over a stream of integer measurements;
    * emits one updated [[W1]] per touched key per micro-batch.
    * `reference` maps value → count from the trusted batch census
    * (e154's reference side); captured in the update closure, so it
    * ships to executors once per task like a broadcast.
    */
  def monitor(
      obs: Dataset[Obs], reference: Map[Int, Long],
      maxSupport: Int = 65536): Dataset[W1] = {
    require(maxSupport > 0, "maxSupport must be positive")
    require(reference.nonEmpty, "reference census must be non-empty")
    require(reference.valuesIterator.forall(_ >= 0),
      "reference counts must be non-negative")
    val nRef = reference.valuesIterator.sum
    require(nRef > 0, "reference census must have positive mass")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.key)
      .mapGroupsWithState[Census, W1](
        GroupStateTimeout.NoTimeout)(update(reference, nRef, maxSupport))
  }
}
