package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming per-key log₂-histogram quantiles — the stateful twin of
  * e150: maintain 42 additive bucket counters per key (bucket 0 for
  * x ≤ 0 plus bit lengths 1..41) over an
  * unbounded stream of nonnegative measures (doc lengths, latencies,
  * token counts) and emit the current p50/p90/p99 ESTIMATES every
  * micro-batch the key is touched (outputMode=update). The estimate is
  * e150's contract verbatim: bucket = bit length (2^(b−1) ≤ x < 2^b),
  * rank = ceil-division, estimate = bucket upper bound 2^b − 1 —
  * one-sided with est/true < 2 guaranteed at any stream length.
  *
  * Because bucket counters merge by ADDITION and addition is
  * order-free, the stream state equals the batch histogram EXACTLY for
  * any interleaving — the strongest stream-equals-batch contract in
  * the family (SpaceSaving's content is order-shaped, CMS matches only
  * as a matrix), pinned by the spec. Replay caveat shared with
  * [[StreamCms]]: counters are linear, so at-least-once delivery
  * inflates ranks — the estimates stay within the γ=2 band of the
  * INFLATED distribution, not the true one; put a dedup gate upstream
  * when the source replays.
  *
  * State: 42 longs + 1 count per key. An exact streaming quantile
  * would need the full value multiset per key (unbounded); this is the
  * production trade the e150 docstring prices.
  */
object StreamLogHist {

  /** One observation of nonnegative measure `x` for `key`. */
  final case class Obs(key: String, x: Long)

  /** Current histogram readout: lifetime count, occupied-bucket count,
    * and the one-sided quantile estimates.
    */
  final case class Quantiles(
      key: String, n_seen: Long, n_buckets: Long,
      p50_est: Long, p90_est: Long, p99_est: Long)

  /** State row: the 42 additive bucket counters (public: the state
    * encoder's generated code constructs it).
    */
  final case class Hist(buckets: Seq[Long], nSeen: Long)

  private val Buckets = 42 // bucket 0 (x<=0) + bit lengths 1..40 + cap

  private def bucketOf(x: Long): Int =
    if (x <= 0L) 0 else math.min(64 - java.lang.Long.numberOfLeadingZeros(x), 41)

  private def estAt(buckets: Array[Long], rank: Long): Long = {
    var cum = 0L
    var b = 0
    while (b < Buckets) {
      cum += buckets(b)
      if (cum >= rank) return (1L << b) - 1L
      b += 1
    }
    (1L << (Buckets - 1)) - 1L
  }

  private def update(
      key: String, rows: Iterator[Obs],
      state: GroupState[Hist]): Quantiles = {
    val prev = state.getOption.getOrElse(
      Hist(Vector.fill(Buckets)(0L), 0L))
    val m = prev.buckets.toArray
    var seen = prev.nSeen
    rows.foreach { r =>
      seen += 1
      m(bucketOf(r.x)) += 1L
    }
    state.update(Hist(m.toVector, seen))
    Quantiles(key, seen, m.count(_ > 0L).toLong,
      estAt(m, (seen + 1) / 2),
      estAt(m, (9 * seen + 9) / 10),
      estAt(m, (99 * seen + 99) / 100))
  }

  /** Per-key quantile estimates over a measure stream; one updated
    * [[Quantiles]] per touched key per micro-batch.
    */
  def monitor(events: Dataset[Obs]): Dataset[Quantiles] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[Hist, Quantiles](
        GroupStateTimeout.NoTimeout)(update)
  }
}
