package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Proves q14's claim (SURVEY §2.11): the tumbling event-time window
  * aggregation is the SAME declarative plan in batch and streaming —
  * under `readStream` + `withWatermark`, append mode emits exactly the
  * windows the watermark has closed, with values identical to the batch
  * aggregation over the same rows.
  */
class StreamingWindowSpec extends SparkSpecBase {

  private def ts(h: Int, m: Int = 0) =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("windowed agg under watermark: closed windows equal the batch result") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Timestamp, String, Double)]
    val agg = ms.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
    val q = agg.writeStream
      .format("memory").queryName("swin").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val early = Seq(
        (ts(0, 10), "click", 1.5), (ts(0, 40), "click", 2.0),
        (ts(0, 20), "view", 3.25), (ts(1, 15), "click", 4.0))
      ms.addData(early: _*)
      q.processAllAvailable()
      // watermark = max(ts) - 1h = 00:15 -> no window has closed yet
      assert(spark.table("swin").isEmpty)

      // an event at 03:30 advances the watermark to 02:30, closing the
      // hour-0 and hour-1 windows
      ms.addData((ts(3, 30), "view", 9.0))
      q.processAllAvailable()
      ms.addData((ts(3, 45), "view", 1.0)) // nudge a second commit
      q.processAllAvailable()
      val streamed = spark.table("swin")

      val batchTwin = early.toDF("ts", "event_type", "value")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value"))
      assert(streamed.count() === 3) // (h0,click),(h0,view),(h1,click)
      assert(streamed.exceptAll(batchTwin).isEmpty &&
        batchTwin.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }
}
