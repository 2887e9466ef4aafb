package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming Benford monitor: 9-long per-key census, statistic equal
  * to e124's batch formula over the same amounts, conforming-vs-
  * fabricated ordering, the < 1 gate, accumulation across batches.
  */
class StreamBenfordSpec extends SparkSpecBase {

  /** e124's per-digit deviation in plain Scala, maximized like the
    * monitor: digit counts → obs ppm (floor) − exact expectation.
    */
  private def batchWorstDev(amounts: Seq[Double]): (Int, Long) = {
    val counts = Array.fill(9)(0L)
    amounts.filter(_ >= 1).foreach { a =>
      var x = math.floor(a).toLong
      while (x >= 10) x /= 10
      counts(x.toInt - 1) += 1
    }
    val n = counts.sum
    (1 to 9).map(d => d -> (counts(d - 1) * 1000000L / n -
        StreamBenford.ExpPpm(d - 1)))
      .maxBy { case (d, dev) => (math.abs(dev), -d) }
  }

  test("stream equals batch across micro-batches; Benford-conforming" +
    " stays unflagged, a single-digit feed flags; <1 amounts dropped") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[StreamBenford.Obs]
    val q = StreamBenford.monitor(ms.toDS())
      .toDF()
      .writeStream
      .format("memory").queryName("benford_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // keyA: a Benford-ish population (counts proportional to the
      // expectation constants, 1000 draws); keyB: every amount starts
      // with digit 9; plus sub-1 noise that must be dropped
      val aB1 = (1 to 9).flatMap { d =>
        Seq.fill((StreamBenford.ExpPpm(d - 1) / 1000L).toInt)(
          d * 100.0 + 7)
      }
      val bB1 = Seq.fill(120)(9001.5)
      ms.addData(aB1.map(StreamBenford.Obs("keyA", _)) ++
        bB1.map(StreamBenford.Obs("keyB", _)) ++
        Seq(StreamBenford.Obs("keyA", 0.25)): _*)
      q.processAllAvailable()
      val r1 = spark.table("benford_state")
        .as[StreamBenford.Dev].collect()
      val a1 = r1.find(_.key == "keyA").get
      assert(a1.n_obs === aB1.size.toLong) // 0.25 dropped
      assert((a1.worst_digit, a1.dev_ppm) === batchWorstDev(aB1))
      assert(!a1.flagged && math.abs(a1.dev_ppm) < 10000)
      val b1 = r1.find(_.key == "keyB").get
      assert(b1.flagged && b1.worst_digit === 9)
      assert((b1.worst_digit, b1.dev_ppm) === batchWorstDev(bB1))

      // batch 2: keyA drifts to all-1 amounts; census accumulates
      val aB2 = Seq.fill(500)(19.99)
      ms.addData(aB2.map(StreamBenford.Obs("keyA", _)): _*)
      q.processAllAvailable()
      val a2 = spark.table("benford_state")
        .as[StreamBenford.Dev].collect()
        .filter(_.key == "keyA").maxBy(_.n_obs)
      assert(a2.n_obs === (aB1.size + 500).toLong)
      assert((a2.worst_digit, a2.dev_ppm) === batchWorstDev(aB1 ++ aB2))
      assert(a2.flagged && a2.worst_digit === 1 && a2.dev_ppm > 0)
    } finally q.stop()
  }

  test("firstDigit and worstDev match e124's integer contract on" +
    " scrambled values") {
    for (seed <- 1 to 40) {
      val v = ((seed * 2654435761L) >>> (seed % 40)) + 1
      var x = v
      while (x >= 10) x /= 10
      assert(StreamBenford.firstDigit(v) === x.toInt, s"v=$v")
    }
    // worstDev ties break to the lower digit
    val counts = IndexedSeq(100L, 100L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
    val (d, _) = StreamBenford.worstDev(counts, 200L)
    assert(d >= 1 && d <= 9)
  }
}
