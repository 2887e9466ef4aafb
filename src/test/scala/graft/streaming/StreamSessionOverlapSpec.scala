package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming session-overlap: emitted rows equal the batch overlap rule
  * over the CLOSED-session set (gap-closed and timeout-closed alike),
  * claim-cell keeps one row per (session, incident) even when a session
  * spans many grid cells, and exact-micros durations match the closed
  * endpoints.
  */
class StreamSessionOverlapSpec extends SparkSpecBase {

  private def ts(h: Int, m: Int) =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")
  private def us(h: Int, m: Int): Long = ts(h, m).getTime * 1000L

  test("emitted overlaps equal the batch rule over closed sessions, " +
    "one row per pair across cell seams") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // incidents: one inside user 1's first session, one straddling its
    // end, one far away (never overlapped)
    val incidents = Seq(
      (100L, us(10, 2), us(10, 4)),   // inside session A [10:00, 10:10]
      (101L, us(10, 8), us(10, 40)),  // straddles A's end, misses B
      (102L, us(18, 0), us(18, 10)))  // overlaps nothing
      .toDF("incident_id", "i_st", "i_en")
    val ms = MemoryStream[(Long, Long, Timestamp)]
    // cell = 5 min so session A [10:00,10:10] spans 3 cells — the seam
    // case the claim-cell rule must keep single
    val out = StreamSessionOverlap.overlaps(
      ms.toDF().toDF("user_id", "event_id", "ts"), incidents,
      watermark = "5 minutes", gapSec = 1800L, cell = 300000000L)
    val q = out.writeStream
      .format("memory").queryName("sess_ov").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // user 1: session A [10:00, 10:10], gap, session B at 11:00;
      // user 2: one event (timeout-closed later)
      ms.addData(Seq((1L, 1L, ts(10, 0)), (1L, 2L, ts(10, 10)),
        (1L, 3L, ts(11, 0)), (2L, 4L, ts(10, 3))))
      q.processAllAvailable()
      // watermark driver: flush everything left via timeout
      ms.addData(Seq((9L, 9L, ts(23, 0))))
      q.processAllAvailable()
      ms.addData(Seq((9L, 10L, ts(23, 50))))
      q.processAllAvailable()

      val got = spark.table("sess_ov")
        .as[(Long, Long, Long, Long, Long)].collect().sorted.toSeq
      // closed sessions: u1 A [10:00,10:10], u1 B [11:00,11:00],
      // u2 [10:03,10:03], u9 [23:00,23:00] (B/u9-last closed by timeout)
      // batch overlap rule over those:
      val expected = Seq(
        // A × 100: fully inside -> 2 min
        (100L, 1L, us(10, 0), us(10, 10), 120000000L),
        // A × 101: [10:08, 10:10] -> 2 min
        (101L, 1L, us(10, 0), us(10, 10), 120000000L),
        // u2 point-session × 100? 10:03 ∈ [10:02,10:04] -> 0-length touch
        (100L, 2L, us(10, 3), us(10, 3), 0L)).sorted
      assert(got === expected)
    } finally q.stop()
  }
}
