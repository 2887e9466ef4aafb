package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming KS monitor: same census state as StreamW1, sup-norm
  * readout identical to e160's batch statistic over the same
  * observations, split-point localization, saturation on disjoint
  * support (the property that separates KS from W1), and the shared
  * support backstop.
  */
class StreamKsSpec extends SparkSpecBase {

  /** e160's sup-norm in plain Scala — the batch oracle the stream must
    * agree with after any number of micro-batches.
    */
  private def batchKs(obs: Seq[Int], ref: Map[Int, Long]): (Long, Int) = {
    val counts = obs.groupBy(identity).map { case (v, o) =>
      v -> o.size.toLong
    }
    StreamKs.ksBpAt(counts, obs.size.toLong, ref, ref.values.sum)
  }

  test("census accumulates across micro-batches and matches e160's " +
    "sup-norm; the split point localizes where the CDFs diverge") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ref = (100 to 109).map(v => v -> 2L).toMap // nRef = 20
    val ms = MemoryStream[StreamW1.Obs]
    val q = StreamKs.monitor(ms.toDS(), ref)
      .toDF()
      .writeStream
      .format("memory").queryName("ks_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // keyA: matches the reference exactly; keyB: all mass in the
      // reference's lower half — the split point is the half boundary
      val aB1 = (100 to 109).flatMap(v => Seq.fill(2)(v))
      val bB1 = (100 to 104).flatMap(v => Seq.fill(2)(v))
      ms.addData(aB1.map(StreamW1.Obs("keyA", _)) ++
        bB1.map(StreamW1.Obs("keyB", _)): _*)
      q.processAllAvailable()
      // batch 2: keyA's new docs all land at 130 — above the reference
      val aB2 = Seq.fill(20)(130)
      ms.addData(aB2.map(StreamW1.Obs("keyA", _)): _*)
      q.processAllAvailable()

      val rows = spark.table("ks_state").as[StreamKs.Ks].collect()
      val aEmits = rows.filter(_.key == "keyA").sortBy(_.n_obs)
      val bLast = rows.filter(_.key == "keyB").last

      assert(aEmits.head.n_obs === 20L)
      assert(aEmits.head.ks_bp === 0L) // exact match, exact zero
      // accumulated state equals the batch formula over the union:
      // half of keyA's mass sits above the whole reference, so the
      // worst split is at the reference's top (109) with gap 0.5
      assert(aEmits.last.n_obs === 40L)
      assert((aEmits.last.ks_bp, aEmits.last.ks_at)
        === batchKs(aB1 ++ aB2, ref))
      assert(aEmits.last.ks_bp === 5000L)
      assert(aEmits.last.ks_at === 109)
      // keyB: CDF_s hits 1.0 at 104 where CDF_ref is 0.5 — split
      // localized at the half boundary, gap 5000 bp
      assert((bLast.ks_bp, bLast.ks_at) === batchKs(bB1, ref))
      assert(bLast.ks_bp === 5000L)
      assert(bLast.ks_at === 104)
    } finally q.stop()
  }

  test("delivery interleaving does not change the final readout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ref = Map(10 -> 5L, 20 -> 5L, 40 -> 5L)
    val obs = Seq(12, 12, 19, 33, 40, 41, 8, 20, 20, 27)
    def finalKs(batches: Seq[Seq[Int]]): (Long, Int) = {
      val ms = MemoryStream[StreamW1.Obs]
      val name = s"ks_inter_${batches.size}_${batches.head.size}"
      val q = StreamKs.monitor(ms.toDS(), ref)
        .toDF()
        .writeStream
        .format("memory").queryName(name).outputMode("update")
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        batches.foreach { b =>
          ms.addData(b.map(StreamW1.Obs("k", _)): _*)
          q.processAllAvailable()
        }
        val last = spark.table(name).as[StreamKs.Ks].collect()
          .maxBy(_.n_obs)
        (last.ks_bp, last.ks_at)
      } finally q.stop()
    }
    val oneShot = finalKs(Seq(obs))
    val chunked = finalKs(Seq(obs.take(3), obs.slice(3, 4), obs.drop(4)))
    assert(oneShot === chunked)
    assert(oneShot === batchKs(obs, ref))
  }

  test("ksBpAt metric identities: self-distance 0, and a " +
    "disjoint-support shift SATURATES at 10000 bp no matter how far " +
    "— the property that separates KS from W1") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 25) {
      val vals = Seq.fill(30)(rnd.nextInt(400) + 20)
      val counts = vals.groupBy(identity)
        .map { case (v, o) => v -> o.size.toLong }
      val n = vals.size.toLong
      // identity: a census is at distance 0 from itself
      assert(StreamKs.ksBpAt(counts, n, counts, n)._1 === 0L)
      // disjoint support: any shift past the support saturates KS at
      // 10000 bp (W1 would price 500 vs 5000 differently; KS cannot —
      // the two monitors are complements, not substitutes)
      for (shift <- Seq(500, 5000)) {
        val shifted = counts.map { case (v, c) => (v + shift) -> c }
        val (bp, at) = StreamKs.ksBpAt(counts, n, shifted, n)
        assert(bp === 10000L)
        // the split localizes at the original census's top value
        assert(at === counts.keysIterator.max)
      }
    }
  }

  test("support backstop drops unseen values once full and reports " +
    "them, sharing StreamW1's census contract") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ref = Map(1 -> 1L, 2 -> 1L)
    val ms = MemoryStream[StreamW1.Obs]
    val q = StreamKs.monitor(ms.toDS(), ref, maxSupport = 3)
      .toDF()
      .writeStream
      .format("memory").queryName("ks_cap").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData(Seq(1, 2, 3, 4, 5, 1).map(StreamW1.Obs("k", _)): _*)
      q.processAllAvailable()
      val last = spark.table("ks_cap").as[StreamKs.Ks].collect()
        .maxBy(_.n_obs)
      assert(last.n_obs === 4L)
      assert(last.n_dropped === 2L)
      assert((last.ks_bp, last.ks_at) === batchKs(Seq(1, 2, 3, 1), ref))
    } finally q.stop()
  }
}
