package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming diurnal-uniformity monitor — the stateful twin of e126's
  * batch bot screen: maintain, per user, a 24-long hour-of-day census
  * and emit the exact integer χ²-against-uniform statistic after every
  * micro-batch that touches the user. Bot screening is an ONLINE
  * problem by nature — a scripted client should be flagged while it is
  * still emitting, not at the next nightly batch — and because e126's
  * statistic is all-integer over the census, the stream can recompute
  * it exactly on every update with no drift against the batch report.
  *
  * State is exactly 24 longs + one count per user, stream-length
  * independent. The statistic is e126's, verbatim: Σ_h (24·n_h − N)²
  * over ALL 24 bins (empty bins contribute N²) normalized by 24·N
  * with floor division; emission carries the same N ≥ 48 minimum-mass
  * gate as the batch screen (below it `screened = false` and chi24 is
  * still reported for observability). StreamDiurnalSpec pins
  * stream-equals-batch on the exact formula.
  *
  * Counting state is additive, NOT idempotent under at-least-once
  * replay — same caveat and remedy as [[StreamDrift]] / [[StreamPsi]]
  * (exactly-once source or a [[StreamDedup]] admission gate).
  */
object StreamDiurnal {

  /** One observation: `hr` in [0, 24) for `user`. */
  final case class Obs(user: Long, hr: Int)

  /** Monitor output for one touched user: lifetime event count,
    * distinct active hours, e126's chi24 statistic (0 = uniform =
    * bot-like), and whether the N ≥ 48 screen gate is open.
    */
  final case class Screen(user: Long, n_events: Long,
      active_hours: Int, chi24: Long, screened: Boolean)

  /** State row: the 24-bin census plus the lifetime count. */
  final case class Census(counts: Seq[Long], n: Long)

  /** e126's statistic, exactly: Σ_h (24·c_h − n)² over all 24 bins
    * (the batch form's (24−k)·N² empty-bin term is the h with c_h = 0
    * here), floor-divided by 24·n. 0 for n = 0.
    */
  private[streaming] def chi24(counts: IndexedSeq[Long], n: Long): Long =
    if (n <= 0) 0L
    else {
      var s = 0L
      var h = 0
      while (h < 24) {
        val d = 24L * counts(h) - n
        s += d * d
        h += 1
      }
      s / (24L * n)
    }

  private def update(
      user: Long, rows: Iterator[Obs],
      state: GroupState[Census]): Screen = {
    val counts = state.getOption match {
      case Some(c) => c.counts.toArray
      case None => new Array[Long](24)
    }
    var n = state.getOption.map(_.n).getOrElse(0L)
    rows.foreach { o =>
      counts(o.hr) += 1
      n += 1
    }
    state.update(Census(counts.toSeq, n))
    Screen(user, n, counts.count(_ > 0), chi24(counts, n), n >= 48)
  }

  /** Per-user diurnal screen over a stream of hour observations; emits
    * one updated [[Screen]] per touched user per micro-batch.
    * Observations with `hr` outside [0, 24) are DROPPED before the
    * stateful stage: the hour is caller-supplied (unlike batch e126,
    * which derives it from `hour(ts)`), and one malformed record must
    * degrade to a lost observation, not an
    * ArrayIndexOutOfBoundsException that kills the query and then
    * replays from the checkpoint into the same crash forever.
    */
  def monitor(obs: Dataset[Obs]): Dataset[Screen] = {
    import obs.sparkSession.implicits._
    obs
      .filter((o: Obs) => o.hr >= 0 && o.hr < 24)
      .groupByKey(_.user)
      .mapGroupsWithState[Census, Screen](
        GroupStateTimeout.NoTimeout)(update)
  }
}
