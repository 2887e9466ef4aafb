package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming Kolmogorov–Smirnov drift monitor — the stateful twin of
  * e160's batch report, and [[StreamW1]]'s sup-norm sibling: maintain,
  * per key, the same exact value census and emit after every
  * micro-batch the WORST single CDF split vs a fixed reference —
  * sup_v |CDF_s(v) − CDF_ref(v)| — together with `ks_at`, the
  * (smallest) value where the supremum is attained. W₁ prices total
  * movement; KS names the split point — "this key departs below/above
  * N" is a filter threshold a pipeline can act on mid-stream, and as
  * the classical two-sample statistic it attaches significance
  * thresholds (c(α)·√((n+m)/nm)) with no new machinery.
  *
  * The metric is e160's exact-integer form on the merged ordered
  * support: gap = |cum_s·N_ref − cum_ref·n| held as BigInt, supremum a
  * plain max with a smallest-v tie-break, ks_bp one floor division at
  * the end — the emitted number equals e160's batch statistic over the
  * union of observations after ANY micro-batch interleaving (additive
  * counts, the [[StreamW1]]/[[StreamLogHist]] stream-equals-batch
  * class).
  *
  * State per key is [[StreamW1.Census]] VERBATIM — one (value → count)
  * map bounded by the measurement codomain with the `maxSupport`
  * degrade-to-counted-drops backstop — so a deployment already running
  * [[StreamW1]] gets KS from the same state for free (one monitor
  * reading both metrics is the production form; the twins are kept
  * separate here so each oracle-pinned contract stays one-metric).
  * Additive counting state shares [[StreamW1]]'s at-least-once caveat.
  */
object StreamKs {

  /** Monitor output for one touched key: lifetime observation count,
    * KS vs the reference in basis points, the (smallest) value where
    * the supremum is attained, and the support-backstop drop count.
    */
  final case class Ks(key: String, n_obs: Long, ks_bp: Long, ks_at: Int,
      n_dropped: Long)

  /** e160's sup-norm on the merged ordered support — exact BigInt gaps,
    * smallest-v tie-break, one floor division. Public within the
    * package so the spec replays it verbatim.
    */
  private[streaming] def ksBpAt(
      counts: Map[Int, Long], n: Long,
      ref: Map[Int, Long], nRef: Long): (Long, Int) = {
    if (n == 0 || nRef == 0) return (0L, 0)
    val support = (counts.keySet ++ ref.keySet).toArray.sorted
    var cumS = 0L
    var cumR = 0L
    var best = BigInt(-1)
    var bestV = support(0)
    var i = 0
    while (i < support.length) {
      val v = support(i)
      cumS += counts.getOrElse(v, 0L)
      cumR += ref.getOrElse(v, 0L)
      val gap = (BigInt(cumS) * nRef - BigInt(cumR) * n).abs
      if (gap > best) { best = gap; bestV = v }
      i += 1
    }
    (((BigInt(10000) * best) / (BigInt(n) * nRef)).toLong, bestV)
  }

  private def update(ref: Map[Int, Long], nRef: Long, maxSupport: Int)(
      key: String, rows: Iterator[StreamW1.Obs],
      state: GroupState[StreamW1.Census]): Ks = {
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
    state.update(StreamW1.Census(counts.toMap, n, dropped))
    val (bp, at) = ksBpAt(counts.toMap, n, ref, nRef)
    Ks(key, n, bp, at, dropped)
  }

  /** Per-key KS-vs-reference over a stream of integer measurements;
    * emits one updated [[Ks]] per touched key per micro-batch.
    */
  def monitor(
      obs: Dataset[StreamW1.Obs], reference: Map[Int, Long],
      maxSupport: Int = 65536): Dataset[Ks] = {
    require(maxSupport > 0, "maxSupport must be positive")
    require(reference.nonEmpty, "reference census must be non-empty")
    require(reference.valuesIterator.forall(_ >= 0),
      "reference counts must be non-negative")
    val nRef = reference.valuesIterator.sum
    require(nRef > 0, "reference census must have positive mass")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.key)
      .mapGroupsWithState[StreamW1.Census, Ks](
        GroupStateTimeout.NoTimeout)(update(reference, nRef, maxSupport))
  }
}
