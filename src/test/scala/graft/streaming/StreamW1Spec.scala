package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming W₁ monitor: exact per-key value-census state, transport
  * sum identical to e154's batch formula over the same observations,
  * interleaving-invariant by count additivity, and the support
  * backstop degrades to dropped observations instead of unbounded
  * state.
  */
class StreamW1Spec extends SparkSpecBase {

  /** e154's exact transport sum in plain Scala (BigInt numerator, one
    * rounded division) — the batch oracle the stream must agree with
    * after any number of micro-batches.
    */
  private def batchW1(obs: Seq[Int], ref: Map[Int, Long]): Long = {
    val counts = obs.groupBy(identity).map { case (v, o) =>
      v -> o.size.toLong
    }
    val n = obs.size.toLong
    val nRef = ref.values.sum
    val support = (counts.keySet ++ ref.keySet).toArray.sorted
    var cumS = 0L
    var cumR = 0L
    var num = BigInt(0)
    for (i <- 0 until support.length - 1) {
      cumS += counts.getOrElse(support(i), 0L)
      cumR += ref.getOrElse(support(i), 0L)
      num += (BigInt(cumS) * nRef - BigInt(cumR) * n).abs *
        (support(i + 1).toLong - support(i).toLong)
    }
    math.round(1000.0 * num.toDouble / (n.toDouble * nRef))
  }

  test("census accumulates across micro-batches and matches the e154 " +
    "transport sum; a shifted distribution scores its shift, a " +
    "matching one scores 0") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // reference: 100..109 uniform, 2 each
    val ref = (100 to 109).map(v => v -> 2L).toMap
    val ms = MemoryStream[StreamW1.Obs]
    val q = StreamW1.monitor(ms.toDS(), ref)
      .toDF()
      .writeStream
      .format("memory").queryName("w1_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // keyA: matches the reference exactly; keyB: same shape shifted
      // +50 — TV/PSI would read both B batches identically, W1 must
      // price the 50-char move
      val aB1 = (100 to 109).flatMap(v => Seq.fill(2)(v))
      val bB1 = (150 to 159).flatMap(v => Seq.fill(2)(v))
      ms.addData(aB1.map(StreamW1.Obs("keyA", _)) ++
        bB1.map(StreamW1.Obs("keyB", _)): _*)
      q.processAllAvailable()
      // batch 2: keyA drifts to longer docs
      val aB2 = Seq.fill(20)(130)
      ms.addData(aB2.map(StreamW1.Obs("keyA", _)): _*)
      q.processAllAvailable()

      val rows = spark.table("w1_state").as[StreamW1.W1].collect()
      val aEmits = rows.filter(_.key == "keyA").sortBy(_.n_obs)
      val bLast = rows.filter(_.key == "keyB").last

      assert(aEmits.head.n_obs === 20L)
      assert(aEmits.head.w1_milli === 0L) // exact match, exact zero
      assert(aEmits.head.w1_milli === batchW1(aB1, ref))
      // accumulated state equals the batch formula over the union
      assert(aEmits.last.n_obs === 40L)
      assert(aEmits.last.w1_milli === batchW1(aB1 ++ aB2, ref))
      // half the mass moved from mean 104.5 to 130 (+25.5 avg over
      // half the distribution) => W1 = 12750 milli
      assert(aEmits.last.w1_milli === 12750L)
      // the +50 shift prices as exactly 50000 milli-chars
      assert(bLast.w1_milli === 50000L)
      assert(bLast.w1_milli === batchW1(bB1, ref))
    } finally q.stop()
  }

  test("delivery interleaving does not change the final readout " +
    "(count additivity)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ref = Map(10 -> 5L, 20 -> 5L, 40 -> 5L)
    val obs = Seq(12, 12, 19, 33, 40, 41, 8, 20, 20, 27)
    def finalW1(batches: Seq[Seq[Int]]): Long = {
      val ms = MemoryStream[StreamW1.Obs]
      val name = s"w1_inter_${batches.size}_${batches.head.size}"
      val q = StreamW1.monitor(ms.toDS(), ref)
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
        spark.table(name).as[StreamW1.W1].collect()
          .maxBy(_.n_obs).w1_milli
      } finally q.stop()
    }
    val oneShot = finalW1(Seq(obs))
    val chunked = finalW1(Seq(obs.take(3), obs.slice(3, 4), obs.drop(4)))
    assert(oneShot === chunked)
    assert(oneShot === batchW1(obs, ref))
  }

  test("w1Milli metric identities on seeded random censuses: " +
    "self-distance 0, translation invariance, exact shift pricing") {
    val rnd = new scala.util.Random(20260815L)
    for (_ <- 1 to 25) {
      val vals = Seq.fill(30)(rnd.nextInt(400) + 20)
      val counts = vals.groupBy(identity)
        .map { case (v, o) => v -> o.size.toLong }
      val n = vals.size.toLong
      val shift = rnd.nextInt(80) + 1
      val shifted = counts.map { case (v, c) => (v + shift) -> c }
      // identity: a census is at distance 0 from itself
      assert(StreamW1.w1Milli(counts, n, counts, n) === 0L)
      // translation invariance: moving BOTH sides changes nothing
      assert(StreamW1.w1Milli(shifted, n,
        counts.map { case (v, c) => (v + shift) -> c }, n) === 0L)
      // pure shift: W1 between a census and its +s translate is
      // exactly s (in milli-units) — the property that separates W1
      // from TV/PSI, which both read a disjoint-support shift as
      // total drift no matter how far the mass moved
      assert(StreamW1.w1Milli(counts, n, shifted, n) === shift * 1000L)
    }
  }

  test("support backstop drops unseen values once full and reports " +
    "them, instead of growing state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ref = Map(1 -> 1L, 2 -> 1L)
    val ms = MemoryStream[StreamW1.Obs]
    val q = StreamW1.monitor(ms.toDS(), ref, maxSupport = 3)
      .toDF()
      .writeStream
      .format("memory").queryName("w1_cap").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData(Seq(1, 2, 3, 4, 5, 1).map(StreamW1.Obs("k", _)): _*)
      q.processAllAvailable()
      val last = spark.table("w1_cap").as[StreamW1.W1].collect()
        .maxBy(_.n_obs)
      // values 1,2,3 admitted (support full after 3 distincts), the
      // repeat of 1 admitted (already tracked), 4 and 5 dropped
      assert(last.n_obs === 4L)
      assert(last.n_dropped === 2L)
      // the observed census is exactly {1->2, 2->1, 3->1}
      assert(last.w1_milli === batchW1(Seq(1, 2, 3, 1), ref))
    } finally q.stop()
  }
}
