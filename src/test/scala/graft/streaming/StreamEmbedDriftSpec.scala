package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming centroid drift: e153's fixed-point census accumulated as
  * keyed state, stream-equals-batch by sum additivity, exact-geometry
  * readouts on constructed vectors, zero-norm rows counted not
  * silently dropped, and the all-skipped census reads "no evidence".
  */
class StreamEmbedDriftSpec extends SparkSpecBase {

  /** Batch replay: quantize + sum + e153 scalar tail, the oracle the
    * stream must agree with after any number of micro-batches.
    */
  private def batchDrift(
      obs: Seq[Array[Double]], ref: Array[Long]): (Long, Long, Long) = {
    val qs = obs.flatMap(StreamEmbedDrift.quantize)
    val sums = new Array[Long](ref.length)
    qs.foreach(q => (0 until ref.length).foreach(i => sums(i) += q(i)))
    val (d, c) = StreamEmbedDrift.driftT(sums, qs.size.toLong, ref)
    (qs.size.toLong, d, c)
  }

  private def dim(i: Int, dims: Int = 8): Array[Double] =
    Array.tabulate(dims)(j => if (j == i) 1.0 else 0.0)

  test("census accumulates across micro-batches; aligned mass reads 0, " +
    "orthogonal mass reads 10000, and the mix reads the exact angle") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // reference: 10 unit vectors along axis 0
    val ref = new Array[Long](8)
    ref(0) = 10L * 1000000L
    val ms = MemoryStream[StreamEmbedDrift.Obs]
    val q = StreamEmbedDrift.monitor(ms.toDS(), ref)
      .toDF()
      .writeStream
      .format("memory").queryName("em_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: keyA aligned with the reference; keyB orthogonal
      ms.addData(Seq.fill(5)(StreamEmbedDrift.Obs("keyA", dim(0))) ++
        Seq.fill(5)(StreamEmbedDrift.Obs("keyB", dim(1))): _*)
      q.processAllAvailable()
      // batch 2: keyA gains equal orthogonal mass -> centroid at 45deg
      ms.addData(Seq.fill(5)(StreamEmbedDrift.Obs("keyA", dim(1))): _*)
      q.processAllAvailable()

      val rows = spark.table("em_state").as[StreamEmbedDrift.Em].collect()
      val aEmits = rows.filter(_.key == "keyA").sortBy(_.n_obs)
      val bLast = rows.filter(_.key == "keyB").last

      assert(aEmits.head.n_obs === 5L)
      assert(aEmits.head.drift_t === 0L) // aligned: exact zero
      assert(aEmits.head.coher_bp === 10000L) // identical vectors
      // accumulated: cos(45deg) = 0.7071 (4dp) -> drift 2929
      assert(aEmits.last.n_obs === 10L)
      assert(aEmits.last.drift_t === 2929L)
      val (n, d, c) = batchDrift(
        Seq.fill(5)(dim(0)) ++ Seq.fill(5)(dim(1)), ref)
      assert((aEmits.last.n_obs, aEmits.last.drift_t,
        aEmits.last.coher_bp) === ((n, d, c)))
      // orthogonal: cos 0 -> drift exactly 10000
      assert(bLast.drift_t === 10000L)
    } finally q.stop()
  }

  test("delivery interleaving does not change the final readout " +
    "(sum additivity), on seeded random vectors") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val obs = Seq.fill(12)(Array.fill(8)(rnd.nextGaussian()))
    val refObs = Seq.fill(10)(Array.fill(8)(rnd.nextGaussian() + 0.3))
    val ref = {
      val sums = new Array[Long](8)
      refObs.flatMap(StreamEmbedDrift.quantize)
        .foreach(q => (0 until 8).foreach(i => sums(i) += q(i)))
      sums
    }
    def finalEm(batches: Seq[Seq[Array[Double]]]): (Long, Long, Long) = {
      val ms = MemoryStream[StreamEmbedDrift.Obs]
      val name = s"em_inter_${batches.size}"
      val q = StreamEmbedDrift.monitor(ms.toDS(), ref)
        .toDF()
        .writeStream
        .format("memory").queryName(name).outputMode("update")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        batches.foreach { b =>
          ms.addData(b.map(StreamEmbedDrift.Obs("k", _)): _*)
          q.processAllAvailable()
        }
        val last = spark.table(name).as[StreamEmbedDrift.Em].collect()
          .maxBy(_.n_obs)
        (last.n_obs, last.drift_t, last.coher_bp)
      } finally q.stop()
    }
    val oneShot = finalEm(Seq(obs))
    val chunked = finalEm(Seq(obs.take(1), obs.slice(1, 7), obs.drop(7)))
    assert(oneShot === chunked)
    assert(oneShot === batchDrift(obs, ref))
  }

  test("zero-norm vectors are skipped and counted; an all-skipped " +
    "census reads drift 0 with n_obs 0 — no evidence, not max drift") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ref = new Array[Long](8)
    ref(0) = 1000000L
    val ms = MemoryStream[StreamEmbedDrift.Obs]
    val q = StreamEmbedDrift.monitor(ms.toDS(), ref)
      .toDF()
      .writeStream
      .format("memory").queryName("em_skip").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData(
        StreamEmbedDrift.Obs("k", new Array[Double](8)),
        StreamEmbedDrift.Obs("k", new Array[Double](8)))
      q.processAllAvailable()
      ms.addData(StreamEmbedDrift.Obs("k", dim(0)))
      q.processAllAvailable()
      val rows = spark.table("em_skip").as[StreamEmbedDrift.Em]
        .collect().sortBy(r => (r.n_obs, r.n_skipped))
      assert(rows.head.n_obs === 0L)
      assert(rows.head.n_skipped === 2L)
      assert(rows.head.drift_t === 0L)
      assert(rows.head.coher_bp === 0L)
      assert(rows.last.n_obs === 1L)
      assert(rows.last.n_skipped === 2L)
      assert(rows.last.drift_t === 0L) // the one real vector aligns
    } finally q.stop()
  }

  test("quantize normalizes then fixes the point exactly on " +
    "representable unit vectors, preserving sign") {
    // (0.6, -0.8) is exactly unit in doubles: quantization is exact
    assert(StreamEmbedDrift.quantize(Array(0.6, -0.8)).get.toSeq
      === Seq(600000L, -800000L))
    // scale invariance: the direction, not the magnitude, is censused
    assert(StreamEmbedDrift.quantize(Array(6.0, -8.0)).get.toSeq
      === Seq(600000L, -800000L))
    assert(StreamEmbedDrift.quantize(Array(0.0, 0.0)) === None)
  }
}
