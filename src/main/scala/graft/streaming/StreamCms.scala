package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.functions.Portable

/** Streaming per-key n-gram frequency monitor — the stateful twin of
  * e100's Count-Min sketch ([[graft.functions.sketches.CmsAgg]]):
  * maintain, per key, a depth×width counter matrix over an unbounded
  * stream of hashed grams and emit updated point estimates for a fixed
  * probe set every micro-batch the key is touched (outputMode=update).
  * The ops use-case is live contamination/memorization watch: track the
  * frequency of specific benchmark or canary n-grams per source while
  * ingest runs, without ever storing the gram vocabulary.
  *
  * State is BOUNDED by construction: depth·width longs per key at any
  * stream length — viable where a streaming `groupBy(gram).count()` is
  * not (exact state grows with the VOCABULARY; at 100 TB the positional
  * 3-gram space is effectively unbounded). Counters are linear, so the
  * cross-batch update is literally [[graft.functions.sketches.CmsAgg]]'s
  * merge: a streaming state row and a batch partial buffer are the same
  * summary, and the spec cross-checks stream-equals-batch verbatim.
  *
  * Replay caveat (the KMV monitor's inverse): linear counters COUNT
  * duplicates, so at-least-once replay inflates estimates — acceptable
  * because CMS is one-sided (never underestimates; a replay only widens
  * the overestimate), but exactly-once delivery is what makes the
  * estimates tight. Bucket math is the [[Portable.CmsA]]/[[Portable.CmsB]]
  * affine family — identical to the batch aggregate and the e100 oracle.
  */
object StreamCms {

  /** One observation: a pre-hashed gram in [0, [[Portable.P]]) for
    * `key`'s population (hash upstream with `shingle_hashes` et al.).
    */
  final case class Obs(key: String, h: Long)

  /** Monitor output: lifetime observation count and the current CMS
    * point estimate for each probe gram, aligned with the `probes`
    * argument by position.
    */
  final case class Freq(key: String, n_seen: Long, estimates: Seq[Long])

  /** State row: the row-major depth×width counter matrix plus the
    * lifetime observation count.
    */
  final case class Counters(m: Seq[Long], nSeen: Long)

  private def bucket(i: Int, key: Long, width: Int): Int =
    ((Portable.CmsA(i) * Math.floorMod(key, Portable.P) + Portable.CmsB(i))
      % Portable.P % width).toInt

  private def update(depth: Int, width: Int, probes: Seq[Long])(
      key: String, rows: Iterator[Obs],
      state: GroupState[Counters]): Freq = {
    val prev = state.getOption.getOrElse(
      Counters(Vector.fill(depth * width)(0L), 0L))
    val m = prev.m.toArray
    var seen = prev.nSeen
    rows.foreach { r =>
      seen += 1
      var i = 0
      while (i < depth) {
        m(i * width + bucket(i, r.h, width)) += 1L
        i += 1
      }
    }
    state.update(Counters(m.toVector, seen))
    val est = probes.map { p =>
      (0 until depth).map(i => m(i * width + bucket(i, p, width))).min
    }
    Freq(key, seen, est)
  }

  /** Per-key CMS frequency estimates for `probes` over a stream of
    * hashed grams; emits one updated [[Freq]] per touched key per
    * micro-batch.
    */
  def monitor(
      events: Dataset[Obs], depth: Int, width: Int,
      probes: Seq[Long]): Dataset[Freq] = {
    require(depth > 0 && depth <= Portable.CmsA.size,
      s"depth must be in [1, ${Portable.CmsA.size}]")
    require(width > 1, "width must be > 1")
    require(probes.nonEmpty, "probes must be non-empty")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[Counters, Freq](
        GroupStateTimeout.NoTimeout)(update(depth, width, probes))
  }
}
