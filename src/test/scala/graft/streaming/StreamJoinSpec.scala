package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Stream-stream interval join: purchases pair with preceding views by
  * the same user within the window, across micro-batches; out-of-window
  * and cross-user purchases don't.
  */
class StreamJoinSpec extends SparkSpecBase {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("attributed joins view->purchase pairs within the window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp, Double)]
    val out = StreamJoin.attributed(
      views.toDF().toDF("event_id", "user_id", "ts"),
      buys.toDF().toDF("event_id", "user_id", "ts", "value"))
    val q = out.writeStream
      .format("memory").queryName("sjoin").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      views.addData((1L, 100L, ts(0)), (2L, 200L, ts(1)))
      buys.addData((10L, 100L, ts(10), 9.5)) // within 15 min of view 1
      q.processAllAvailable()
      assert(spark.table("sjoin").count() === 1)

      // cross-batch: user 200's purchase arrives later, still in window;
      // user 100's second purchase is outside the 15-minute window
      buys.addData((11L, 200L, ts(12), 9.5), (12L, 100L, ts(20), 9.5))
      q.processAllAvailable()
      val pairs = spark.table("sjoin")
        .select("view_id", "buy_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((1L, 10L), (2L, 11L)))
    } finally q.stop()
  }

  test("left_outer emits unconverted views once no match can arrive") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp, Double)]
    val out = StreamJoin.attributed(
      views.toDF().toDF("event_id", "user_id", "ts"),
      buys.toDF().toDF("event_id", "user_id", "ts", "value"),
      watermark = "10 minutes", windowMinutes = 15,
      joinType = "left_outer")
    val q = out.writeStream
      .format("memory").queryName("sjoin_outer").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      views.addData((1L, 100L, ts(0)), (2L, 200L, ts(1)))
      buys.addData((10L, 100L, ts(5), 9.5)) // user 100 converts
      q.processAllAvailable()
      // advance BOTH watermarks far past view_ts + window so view 2's
      // no-match outcome becomes final (two commits to propagate)
      views.addData((3L, 999L, Timestamp.valueOf("2026-01-01 13:00:00")))
      buys.addData((11L, 998L, Timestamp.valueOf("2026-01-01 13:00:00"), 1.0))
      q.processAllAvailable()
      views.addData((4L, 999L, Timestamp.valueOf("2026-01-01 13:30:00")))
      buys.addData((12L, 998L, Timestamp.valueOf("2026-01-01 13:30:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("sjoin_outer")
        .select("view_id", "buy_id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      assert(rows(1L) === 10L)  // converted pair
      assert(rows(2L) === -1L)  // unconverted view emitted with null buy
    } finally q.stop()
  }
}
