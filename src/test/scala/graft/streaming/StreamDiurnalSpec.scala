package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming diurnal monitor: bounded 24-long per-user census,
  * statistic identical to e126's batch formula over the same
  * observations, uniform-vs-concentrated ordering, N ≥ 48 gate.
  */
class StreamDiurnalSpec extends SparkSpecBase {

  /** e126's batch statistic in plain Scala (observed-bin sum plus the
    * (24−k)·N² empty-bin term — deliberately the BATCH formulation, so
    * agreement with the stream's all-24-bin fold proves the two forms
    * identical, not just both implemented).
    */
  private def batchChi24(hours: Seq[Int]): Long = {
    val m = hours.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = hours.size.toLong
    val sObs = m.values.map(c => (24 * c - n) * (24 * c - n)).sum
    val k = m.size
    (sObs + (24L - k) * n * n) / (24 * n)
  }

  test("stream equals batch across micro-batches; uniform user reads" +
    " below a concentrated one; N gate opens at 48") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[StreamDiurnal.Obs]
    val q = StreamDiurnal.monitor(ms.toDS())
      .toDF()
      .writeStream
      .format("memory").queryName("diurnal_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // user 1: uniform over all 24 hours (bot-like); user 2: diurnal
      // (mass on hours 9-17); batch 1 leaves user 1 under the gate
      val u1b1 = (0 until 24).map(identity)           // 24 events
      val u2b1 = (0 until 72).map(i => 9 + (i % 9))   // 72 events
      ms.addData(u1b1.map(StreamDiurnal.Obs(1L, _)) ++
        u2b1.map(StreamDiurnal.Obs(2L, _)): _*)
      q.processAllAvailable()
      val r1 = spark.table("diurnal_state")
        .as[StreamDiurnal.Screen].collect()
      val u1First = r1.find(_.user == 1L).get
      assert(u1First.n_events === 24L && !u1First.screened)
      assert(u1First.chi24 === batchChi24(u1b1))
      val u2First = r1.find(_.user == 2L).get
      assert(u2First.screened)
      assert(u2First.chi24 === batchChi24(u2b1))

      // batch 2: user 1 stays uniform and crosses the gate
      val u1b2 = (0 until 48).map(_ % 24)
      ms.addData(u1b2.map(StreamDiurnal.Obs(1L, _)): _*)
      q.processAllAvailable()
      val rows = spark.table("diurnal_state")
        .as[StreamDiurnal.Screen].collect()
      val u1Last = rows.filter(_.user == 1L).maxBy(_.n_events)
      // census accumulated across batches = batch formula on the union
      assert(u1Last.n_events === 72L && u1Last.screened)
      assert(u1Last.chi24 === batchChi24(u1b1 ++ u1b2))
      assert(u1Last.active_hours === 24)
      // perfectly uniform → statistic exactly 0; diurnal user far above
      assert(u1Last.chi24 === 0L)
      val u2Last = rows.filter(_.user == 2L).maxBy(_.n_events)
      assert(u2Last.chi24 > u1Last.chi24)
    } finally q.stop()
  }

  test("stream formula equals batch formula on scrambled profiles") {
    // 50 deterministic pseudo-random profiles: the all-24-bin fold and
    // the observed+(24-k)n² batch form must agree exactly on every one
    for (seed <- 1 to 50) {
      val hours = (0 until 48 + (seed * 7) % 100)
        .map(i => (((i * seed * 2654435761L) >>> 7) % 24).toInt)
      val counts = Array.fill(24)(0L)
      hours.foreach(h => counts(h) += 1)
      assert(StreamDiurnal.chi24(counts.toIndexedSeq, hours.size.toLong)
        === batchChi24(hours), s"seed $seed")
    }
  }
}
