package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming CUSUM: the known-rate recursion must equal a driver-side
  * fold of the same days whatever the micro-batch split, replaying e143's
  * statistic when fed a finished period at refNum = total,
  * refDen = n_days; stale days are dropped, not rewound.
  */
class StreamCusumSpec extends SparkSpecBase {

  /** Driver-side textbook recursion in the same scaled units. */
  private def fold(xs: Seq[Long], refNum: Long, refDen: Long)
      : (Long, Long, Long) = { // (sCur, sMax, argmaxDayIdx 1-based)
    var s = 0L; var best = Long.MinValue; var bestDay = 0L
    xs.zipWithIndex.foreach { case (x, i) =>
      s = math.max(0L, s + (refDen * x - refNum))
      if (s > best) { best = s; bestDay = i + 1 }
    }
    (s, best, bestDay)
  }

  test("stream equals the driver fold across micro-batch splits;" +
    " stale days are dropped") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[StreamCusum.DayCount]
    // keyA: e143's shape — a finished 12-day period monitored at its
    // own mean (refNum = total 132, refDen = 12 days); a mid-period
    // ramp must be caught and dated. keyB: flat at the reference.
    val xsA = Seq(9L, 10L, 8L, 11L, 14L, 16L, 15L, 13L, 9L, 10L, 8L, 9L)
    val xsB = Seq.fill(12)(5L)
    assert(xsA.sum === 132L)
    val q = StreamCusum.monitor(ms.toDS(), refNum = 132L, refDen = 12L)
      .toDF()
      .writeStream
      .format("memory").queryName("cusum_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def rows(key: String, xs: Seq[Long], from: Int, until: Int) =
        (from until until).map(i =>
          StreamCusum.DayCount(key, i + 1L, xs(i)))
      ms.addData(rows("a", xsA, 0, 5) ++ rows("b", xsB, 0, 7): _*)
      q.processAllAvailable()
      // batch 2 replays day 3 with a poisoned count (must be dropped)
      // and finishes both keys
      ms.addData(rows("a", xsA, 5, 12) ++ rows("b", xsB, 7, 12) :+
        StreamCusum.DayCount("a", 3L, 1000L): _*)
      q.processAllAvailable()
      val out = spark.table("cusum_state")
        .as[StreamCusum.Alarm].collect()
      val a = out.filter(_.key == "a").maxBy(_.n_days)
      val b = out.filter(_.key == "b").maxBy(_.n_days)
      val (aCur, aMax, aDay) = fold(xsA, 132L, 12L)
      assert(a.n_days === 12L) // the replayed day 3 was dropped
      assert((a.s_cur, a.s_max, a.alarm_day) === ((aCur, aMax, aDay)))
      // the ramp peaks after day 8 (the last fat day), scaled units
      assert(a.alarm_day === 8L && a.s_max > 0L)
      assert(b.n_days === 12L && b.s_max === 0L && b.s_cur === 0L)
      assert(b.alarm_day === 1L) // earliest-day seed at S = 0
      assert(!b.alarmed)
    } finally q.stop()
  }

  test("alarm bar: a sustained shift of one full reference day alarms") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[StreamCusum.DayCount]
    // reference 10/day; 6 days at 13 accumulate 18 > 10 = refNum·1
    val q = StreamCusum.monitor(ms.toDS(), refNum = 10L, refDen = 1L)
      .toDF()
      .writeStream
      .format("memory").queryName("cusum_alarm").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData((1 to 6).map(d =>
        StreamCusum.DayCount("k", d.toLong, 13L)): _*)
      q.processAllAvailable()
      val k = spark.table("cusum_alarm")
        .as[StreamCusum.Alarm].collect().maxBy(_.n_days)
      assert(k.s_max === 18L && k.alarmed && k.alarm_day === 6L)
    } finally q.stop()
  }
}
