package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming PSI drift monitor — the stateful twin of e115's batch
  * population-stability-index report: maintain, per key (event type,
  * source, model-input slice …), a bounded bucket census of the value
  * stream and emit PSI against a fixed REFERENCE census after every
  * micro-batch that touches the key. The ops use-case is the online
  * form of e115: the batch job derives thresholds and mixture
  * parameters from a reference week's distribution; this monitor
  * alarms the moment the live distribution walks away from it
  * (0.10/0.25 are the conventional shifting/drifted readings).
  *
  * State is exactly `buckets` longs + one count per key, stream-length
  * independent. The PSI arithmetic is e115's, verbatim: add-one
  * smoothing (`(cnt+1)/(n+B)`), terms folded in BUCKET ORDER (the
  * fixed-order fold that makes the float metric deterministic — a
  * reduction in arbitrary order would be merge-order-dependent),
  * truncated to basis points; StreamPsiSpec pins stream-equals-batch
  * on that exact formula.
  *
  * Counting state is additive, NOT idempotent under at-least-once
  * replay — same caveat and remedy as [[StreamDrift]] (exactly-once
  * source or a [[StreamDedup]] admission gate).
  */
object StreamPsi {

  /** One observation: value bucket `b` in [0, buckets) for `key`
    * (bucket upstream with the e115 rule, e.g.
    * `least(buckets-1, floor(value / width))`).
    */
  final case class Obs(key: String, b: Int)

  /** Monitor output for one touched key: lifetime observation count,
    * current PSI in truncated basis points, and the 0.25-rule flag.
    */
  final case class Psi(key: String, n_obs: Long, psi_bp: Long,
      drifted: Boolean)

  /** State row: the per-bucket census plus the lifetime count. */
  final case class Census(counts: Seq[Long], nObs: Long)

  /** e115's PSI in truncated basis points — add-one smoothing, bucket-
    * order fold, trunc toward zero (PSI is non-negative termwise).
    */
  private[streaming] def psiBp(
      counts: IndexedSeq[Long], n: Long,
      ref: IndexedSeq[Long], nRef: Long): Long = {
    val bCount = counts.length
    var acc = 0.0
    var i = 0
    while (i < bCount) {
      val q = (counts(i) + 1.0) / (n + bCount.toDouble)
      val p = (ref(i) + 1.0) / (nRef + bCount.toDouble)
      acc += (q - p) * math.log(q / p)
      i += 1
    }
    (acc * 10000).toLong
  }

  private def update(buckets: Int, ref: IndexedSeq[Long], nRef: Long)(
      key: String, rows: Iterator[Obs],
      state: GroupState[Census]): Psi = {
    val counts = state.getOption match {
      case Some(c) => c.counts.toArray
      case None => new Array[Long](buckets)
    }
    var n = state.getOption.map(_.nObs).getOrElse(0L)
    rows.foreach { o =>
      counts(o.b) += 1
      n += 1
    }
    state.update(Census(counts.toSeq, n))
    val psi = psiBp(counts, n, ref, nRef)
    Psi(key, n, psi, psi > 2500)
  }

  /** Per-key PSI-vs-reference over a stream of bucketed observations;
    * emits one updated [[Psi]] per touched key per micro-batch.
    * `reference` maps bucket → count from the trusted batch census
    * (absent buckets are zero); captured in the update closure, so it
    * ships to executors once per task like a broadcast.
    */
  def monitor(
      obs: Dataset[Obs], reference: Map[Int, Long],
      buckets: Int = 10): Dataset[Psi] = {
    require(buckets > 0, "buckets must be positive")
    require(reference.keys.forall(b => b >= 0 && b < buckets),
      s"reference buckets outside [0, $buckets)")
    val ref: IndexedSeq[Long] =
      (0 until buckets).map(b => reference.getOrElse(b, 0L))
    val nRef = ref.sum
    require(nRef > 0, "reference census must have positive mass")
    import obs.sparkSession.implicits._
    // Out-of-range buckets are DROPPED before the stateful stage (the
    // StreamDiurnal rule): the bucket index is caller-supplied, and one
    // malformed record must degrade to a lost observation, not an
    // ArrayIndexOutOfBoundsException that kills the query and replays
    // from the checkpoint into the same crash forever.
    obs
      .filter((o: Obs) => o.b >= 0 && o.b < buckets)
      .groupByKey(_.key)
      .mapGroupsWithState[Census, Psi](
        GroupStateTimeout.NoTimeout)(update(buckets, ref, nRef))
  }
}
