package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming embedding-centroid drift monitor — e153's stateful twin,
  * completing the ONLINE drift family across all three metric axes:
  * [[StreamPsi]]/[[StreamDrift]] read per-bucket MASS, [[StreamW1]]/
  * [[StreamKs]] read 1-D MAGNITUDE, this reads VECTOR SPACE — the
  * angle between the stream's accumulated class centroid and a trusted
  * reference centroid, the serving-path check that an embedding
  * generation (new encoder build, new preprocessing) hasn't rotated a
  * class's mean direction.
  *
  * State per key is e153's exact fixed-point census VERBATIM: 64
  * integer component sums (unit-normalized vectors quantized at 10⁻⁶,
  * half-up — e153's `round(uv·10⁶)` contract, BigDecimal HALF_UP here
  * so negative components round identically to both engines) plus
  * observation/skip counts. Sums are ADDITIVE, so state after any
  * micro-batch interleaving equals the batch census over the union —
  * the emitted drift equals e153's formula on the same observations
  * (the [[StreamW1]] stream-equals-batch class). Zero-norm vectors are
  * skipped and COUNTED (quantization of a direction is undefined
  * there — e153 filters them; the stream reports them instead of
  * silently narrowing).
  *
  * The readout is e153's scalar tail: dab/√(daa·dbb) from exact BigInt
  * products of the integer sums, rounded to 4 dp half-up before the
  * ten-thousandths conversion, and the mean-resultant-length coherence
  * (√daa/(10⁶·n), in bp) that names the 1/√n noise floor — a centroid
  * angle with coherence at the floor is NOISE, and the monitor hands
  * the reader both numbers, same as the batch audit. An empty census
  * (all rows skipped) emits drift 0 with n_obs 0 — "no evidence", not
  * "maximal drift".
  *
  * State is 64 longs + 2 counters per key — constant, no codomain or
  * backstop concerns. Additive counting state shares [[StreamW1]]'s
  * at-least-once caveat.
  */
object StreamEmbedDrift {

  /** One observation: a raw (not necessarily unit) vector for `key`. */
  final case class Obs(key: String, vec: Array[Double])

  /** Monitor output for one touched key. */
  final case class Em(key: String, n_obs: Long, drift_t: Long,
      coher_bp: Long, n_skipped: Long)

  /** State row: 64 fixed-point component sums + counts. */
  final case class Census(sums: Array[Long], nObs: Long, nSkipped: Long)

  /** e153's quantization: unit-normalize, then round each component to
    * 10⁻⁶ fixed point, HALF_UP (away from zero — Spark/DuckDB round
    * semantics; Scala's math.round differs on negative .5s).
    */
  private[streaming] def quantize(vec: Array[Double]): Option[Array[Long]] = {
    var d = 0.0
    var i = 0
    while (i < vec.length) { d += vec(i) * vec(i); i += 1 }
    val nrm = math.sqrt(d)
    if (nrm <= 0 || nrm.isNaN) None
    else Some(vec.map(x => BigDecimal(x / nrm * 1000000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
  }

  /** e153's scalar tail on two integer sum vectors: (drift_t, coher_bp
    * of the stream side). Exact BigInt quadratics, 4-dp half-up cosine,
    * zero-mass sides emit drift 0.
    */
  private[streaming] def driftT(
      s: Array[Long], n: Long, ref: Array[Long]): (Long, Long) = {
    var dab = BigInt(0)
    var daa = BigInt(0)
    var dbb = BigInt(0)
    var i = 0
    while (i < s.length) {
      dab += BigInt(s(i)) * ref(i)
      daa += BigInt(s(i)) * s(i)
      dbb += BigInt(ref(i)) * ref(i)
      i += 1
    }
    val coher =
      if (n == 0) 0L
      else math.round(math.sqrt(daa.toDouble) / (10000.0 * n) * 100)
    if (daa == 0 || dbb == 0) (0L, coher)
    else {
      val cos = dab.toDouble / math.sqrt(daa.toDouble * dbb.toDouble)
      val c4 = BigDecimal(cos).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble + 0d
      (10000L - math.round(c4 * 10000), coher)
    }
  }

  private def update(ref: Array[Long])(
      key: String, rows: Iterator[Obs],
      state: GroupState[Census]): Em = {
    val dims = ref.length
    val sums = new Array[Long](dims)
    var n = 0L
    var skipped = 0L
    state.getOption.foreach { c =>
      System.arraycopy(c.sums, 0, sums, 0, dims)
      n = c.nObs
      skipped = c.nSkipped
    }
    rows.foreach { o =>
      require(o.vec.length == dims,
        s"expected $dims-dim vector, got ${o.vec.length}")
      quantize(o.vec) match {
        case Some(q) =>
          var i = 0
          while (i < dims) { sums(i) += q(i); i += 1 }
          n += 1
        case None => skipped += 1
      }
    }
    state.update(Census(sums, n, skipped))
    val (drift, coher) = driftT(sums, n, ref)
    Em(key, n, drift, coher, skipped)
  }

  /** Per-key centroid drift vs a trusted reference census over a stream
    * of vectors; emits one updated [[Em]] per touched key per
    * micro-batch. `referenceSums` are e153-convention integer component
    * sums of the reference generation's unit vectors (the batch side a
    * deployment persists — e153/e138's posture).
    */
  def monitor(
      obs: Dataset[Obs], referenceSums: Array[Long]): Dataset[Em] = {
    require(referenceSums.nonEmpty, "reference sums must be non-empty")
    require(referenceSums.exists(_ != 0L),
      "reference census must have positive mass")
    import obs.sparkSession.implicits._
    obs
      .groupByKey(_.key)
      .mapGroupsWithState[Census, Em](
        GroupStateTimeout.NoTimeout)(update(referenceSums))
  }
}
