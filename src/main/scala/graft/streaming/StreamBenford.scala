package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming Benford monitor — the stateful twin of e124's batch
  * first-digit audit: maintain, per key (feed, merchant, ledger …), a
  * 9-long first-digit census of the amount stream and emit observed-
  * vs-expected deviations after every micro-batch that touches the
  * key. Forensic amount screening is an online problem (a fabricated
  * feed should alarm while it is still posting), and e124's
  * arithmetic is all-integer over the census, so the stream recomputes
  * it exactly per update with zero drift against the batch report.
  *
  * State is exactly 9 longs + one count per key, stream-length
  * independent. The math is e124's verbatim: first digit by repeated
  * integer division (no log₁₀), expectations the exact ppm constants
  * 301030…45757 (sum 10⁶), the emitted statistic the max absolute
  * per-digit deviation in ppm plus the digit that attains it —
  * max-deviation rather than the full 9-row table because a stream
  * emits one row per key per batch. Amounts < 1 are dropped before
  * the stateful stage (e124's `WHERE o_totalprice >= 1` gate;
  * malformed records must degrade to lost observations, not a
  * poisoned checkpoint — the [[StreamDiurnal]] rule).
  *
  * Counting state is additive, NOT idempotent under at-least-once
  * replay — same caveat and remedy as [[StreamDrift]] / [[StreamPsi]]
  * (exactly-once source or a [[StreamDedup]] admission gate).
  */
object StreamBenford {

  /** One observation: a positive amount for `key` (floor ≥ 1 after the
    * gate). */
  final case class Obs(key: String, amount: Double)

  /** Monitor output for one touched key: lifetime count, the digit
    * with the largest absolute ppm deviation from Benford, that
    * deviation (signed), and the 0.05-rule flag (|dev| > 50 000 ppm on
    * ≥ 100 observations — the conventional screening bar scaled to
    * ppm).
    */
  final case class Dev(key: String, n_obs: Long, worst_digit: Int,
      dev_ppm: Long, flagged: Boolean)

  /** State row: per-digit counts (index 0 = digit 1) + lifetime n. */
  final case class Census(counts: Seq[Long], n: Long)

  /** e124's expectation constants, exact ppm, digits 1–9. */
  private[streaming] val ExpPpm: IndexedSeq[Long] = IndexedSeq(
    301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L,
    51153L, 45757L)

  /** First significant digit of v ≥ 1 by integer division — e124's
    * cascade as a loop. */
  private[streaming] def firstDigit(v: Long): Int = {
    var x = v
    while (x >= 10) x /= 10
    x.toInt
  }

  /** (worst digit, signed ppm deviation) of the census vs Benford —
    * exact integer, e124's obs−exp column maximized by |·| with the
    * lower digit winning ties (deterministic emission).
    *
    * The ppm numerator `counts(d) * 1000000` stays in Long only while
    * the per-key lifetime count is ≤ ~9.2e12; past that the fast path
    * would wrap, so the loop falls back to an exact BigInt division —
    * identical result in the overlap regime (both compute
    * ⌊c·10⁶/n⌋), no wraparound ever. The fallback costs 9 BigInt ops
    * per key per batch, paid only by keys that have already observed
    * nine trillion amounts.
    */
  private[streaming] def worstDev(
      counts: IndexedSeq[Long], n: Long): (Int, Long) = {
    val fastMax = Long.MaxValue / 1000000L // counts ≤ n, so gate on n
    var bestD = 1
    var bestDev = 0L
    var d = 0
    while (d < 9) {
      val obsPpm =
        if (n <= fastMax) counts(d) * 1000000L / n
        else (BigInt(counts(d)) * 1000000 / n).toLong
      val dev = obsPpm - ExpPpm(d)
      if (math.abs(dev) > math.abs(bestDev)) { bestD = d + 1; bestDev = dev }
      d += 1
    }
    (bestD, bestDev)
  }

  private def update(
      key: String, rows: Iterator[Obs],
      state: GroupState[Census]): Dev = {
    val counts = state.getOption match {
      case Some(c) => c.counts.toArray
      case None => new Array[Long](9)
    }
    var n = state.getOption.map(_.n).getOrElse(0L)
    rows.foreach { o =>
      counts(firstDigit(math.floor(o.amount).toLong) - 1) += 1
      n += 1
    }
    state.update(Census(counts.toSeq, n))
    val (d, dev) = worstDev(counts, n)
    Dev(key, n, d, dev, n >= 100 && math.abs(dev) > 50000)
  }

  /** Per-key Benford screen over a stream of amounts; emits one
    * updated [[Dev]] per touched key per micro-batch. Amounts < 1 are
    * dropped (no first digit under e124's integer contract), and so
    * are amounts ≥ 9.2e18: `math.floor(amount).toLong` SATURATES past
    * Long.MaxValue (≈9.223e18), which would silently report first
    * digit 9 whatever the true leading digit — batch e124's BIGINT
    * cast fails loud on the same input, and the stream twin must not
    * silently diverge where the batch errors. Both gates follow the
    * [[StreamDiurnal]] rule: malformed observations degrade to lost
    * rows, never a poisoned checkpoint.
    */
  def monitor(obs: Dataset[Obs]): Dataset[Dev] = {
    import obs.sparkSession.implicits._
    obs
      .filter((o: Obs) => o.amount >= 1 && o.amount < 9.2e18)
      .groupByKey(_.key)
      .mapGroupsWithState[Census, Dev](
        GroupStateTimeout.NoTimeout)(update)
  }
}
