package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming source-drift monitor — the stateful twin of e69's batch
  * total-variation matrix: maintain, per source, a bounded bucket census
  * of the hashed-unigram stream and emit the TV distance against a fixed
  * REFERENCE census (a trusted batch snapshot, e.g. last month's vetted
  * crawl) for every source a micro-batch touches. The ops use-case is
  * ingest monitoring: a source whose live token distribution drifts from
  * the distribution its mixture weight / quality threshold was derived
  * on should alarm before those derived parameters silently skew the
  * training mixture (the e62/e51 failure mode, caught online).
  *
  * State is BOUNDED by construction: exactly `buckets` longs per source
  * regardless of stream length — the census lives in the hashed feature
  * space (word hash mod 4096, e53's discipline), never the vocabulary.
  * The distance uses e69's exact rational form ½·Σ|p−q| =
  * Σ|cnt_f·N_ref − ref_f·N_s| · 5000 / (N_s·N_ref), accumulated here in
  * arbitrary precision (the per-batch cost is one pass over ≤ `buckets`
  * terms, so exactness is free — no int64 headroom cliff at fleet-scale
  * token counts, unlike a fixed-width fold).
  *
  * Counting state is additive, NOT idempotent under at-least-once
  * replay (unlike [[CardinalityState]]'s min-sketch): feed this monitor
  * from an exactly-once source or behind a [[StreamDedup]] admission
  * gate when replayed counts would matter.
  */
object StreamDrift {

  /** One observation: a feature bucket `f` in [0, buckets) for `source`
    * (bucket upstream with `pmod(word_hashes(text), buckets)` — the same
    * domain e53/e69 census).
    */
  final case class Tok(source: String, f: Int)

  /** Monitor output for one touched source: lifetime token count and the
    * current TV distance (basis points, 0..10000) from the reference.
    */
  final case class Drift(source: String, n_tokens: Long, tv_bp: Long)

  /** State row: the per-bucket census plus the lifetime token count. */
  final case class Census(counts: Seq[Long], nTokens: Long)

  /** Exact TV distance in basis points between an observed census and
    * the reference — e69's integer form, arbitrary-precision inside.
    */
  private[streaming] def tvBp(
      counts: IndexedSeq[Long], nS: Long,
      ref: IndexedSeq[Long], nRef: Long): Long = {
    var numer = BigInt(0)
    var f = 0
    while (f < counts.length) {
      numer += (BigInt(counts(f)) * nRef - BigInt(ref(f)) * nS).abs
      f += 1
    }
    (numer * 5000 / (BigInt(nS) * nRef)).toLong
  }

  private def update(buckets: Int, ref: IndexedSeq[Long], nRef: Long)(
      source: String, rows: Iterator[Tok],
      state: GroupState[Census]): Drift = {
    val counts = state.getOption match {
      case Some(c) => c.counts.toArray
      case None => new Array[Long](buckets)
    }
    var n = state.getOption.map(_.nTokens).getOrElse(0L)
    rows.foreach { t =>
      counts(t.f) += 1
      n += 1
    }
    state.update(Census(counts.toSeq, n))
    Drift(source, n, tvBp(counts, n, ref, nRef))
  }

  /** Per-source drift-vs-reference estimates over a stream of bucketed
    * tokens; emits one updated [[Drift]] per touched source per
    * micro-batch. `reference` maps bucket → count from the trusted batch
    * census (absent buckets are zero); it is captured in the update
    * closure, so it ships to executors once per task like a broadcast.
    */
  def tvDrift(
      toks: Dataset[Tok], reference: Map[Int, Long],
      buckets: Int = 4096): Dataset[Drift] = {
    require(buckets > 0, "buckets must be positive")
    require(reference.nonEmpty, "reference census must be non-empty")
    require(reference.keys.forall(f => f >= 0 && f < buckets),
      s"reference buckets outside [0, $buckets)")
    val ref: IndexedSeq[Long] =
      (0 until buckets).map(f => reference.getOrElse(f, 0L))
    val nRef = ref.sum
    require(nRef > 0, "reference census must have positive mass")
    import toks.sparkSession.implicits._
    // Out-of-range buckets dropped before the stateful stage — the
    // StreamDiurnal/StreamPsi rule: a malformed record degrades to a
    // lost observation, never a checkpoint-replaying crash loop.
    toks
      .filter((t: Tok) => t.f >= 0 && t.f < buckets)
      .groupByKey(_.source)
      .mapGroupsWithState[Census, Drift](
        GroupStateTimeout.NoTimeout)(update(buckets, ref, nRef))
  }
}
