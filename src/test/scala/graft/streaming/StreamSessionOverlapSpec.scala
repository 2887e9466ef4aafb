package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
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

  /** Batch q60-shaped overlap over a raw (user_id, event_id, us) event
    * set: gap-sessionize, interval-join, exact-micros overlap — the
    * same rule [[StreamSessionOverlap.overlaps]] applies to its closed
    * sessions.
    */
  private def batchOverlaps(
      events: Seq[(Long, Long, Long)],
      incidents: org.apache.spark.sql.DataFrame,
      cell: Long): Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    if (events.isEmpty) return Set.empty
    val sess = graft.operators.GapSessions
      .sessions(events.toDF("user_id", "event_id", "us"),
        "user_id", "us", "event_id", gap = 1800L * 1000000L)
      .select(col("user_id"), col("session_start").as("s_st_us"),
        col("session_end").as("s_en_us"))
    graft.operators.RangeJoin
      .intervalOverlap(sess, "s_st_us", "s_en_us",
        incidents, "i_st", "i_en", cell)
      .select(col("incident_id"), col("user_id"),
        col("s_st_us"), col("s_en_us"),
        (least(col("s_en_us"), col("i_en"))
          - greatest(col("s_st_us"), col("i_st"))).as("ov_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  test("handoff contract: stream rows over closed sessions ∪ batch over " +
    "the open-tail events = full batch q60, incl. a session spanning " +
    "the cut") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val cell = 300000000L // 5 min
    val incidents = Seq(
      (100L, us(10, 2), us(10, 4)),   // inside closed session A
      (101L, us(12, 0), us(12, 10)))  // overlaps ONLY the cut-spanning B
      .toDF("incident_id", "i_st", "i_en")

    // Pre-cut events (cut at 12:00): u1 session A [10:00,10:10] then B
    // opening at 11:50 (it will span the cut); u2 a point session; u9
    // a late watermark driver. Post-cut: B's 12:05 event.
    val preCut = Seq((1L, 1L, ts(10, 0)), (1L, 2L, ts(10, 10)),
      (2L, 3L, ts(10, 3)), (1L, 4L, ts(11, 50)))
    val driver = Seq((9L, 9L, ts(11, 50)))
    val postCut = Seq((1L, 5L, ts(12, 5)))

    // Stream leg: overlaps over what the stream CLOSES before the cut.
    // Watermark 5 min → after the driver batch the watermark is 11:45:
    // A gap-closes in-batch, u2 timeout-closes, B and u9 stay OPEN.
    val msOv = MemoryStream[(Long, Long, Timestamp)]
    val ov = StreamSessionOverlap.overlaps(
      msOv.toDF().toDF("user_id", "event_id", "ts"), incidents,
      watermark = "5 minutes", gapSec = 1800L, cell = cell)
    val qOv = ov.writeStream.format("memory").queryName("ho_ov")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // Closed-session source for the handoff subtraction — the same
    // Sessionize state fed the same batches makes the same closure
    // decisions (deterministic), so a deployment can read "what is
    // closed" from the sessionize stream itself.
    val msIv = MemoryStream[(Long, Long, Timestamp)]
    val iv = Sessionize.intervals(
      msIv.toDF().toDF("user_id", "event_id", "ts"),
      watermark = "5 minutes", gapSec = 1800L)
    val qIv = iv.toDF().writeStream.format("memory").queryName("ho_iv")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      for (batch <- Seq(preCut, driver)) {
        msOv.addData(batch); msIv.addData(batch)
        qOv.processAllAvailable(); qIv.processAllAvailable()
      }
      val streamRows = spark.table("ho_ov")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val closed = spark.table("ho_iv")
        .select("user_id", "s_st_us", "s_en_us")
        .as[(Long, Long, Long)].collect().toSet
      // the cut-spanning session must NOT be closed by the stream
      assert(closed.map(_._1) === Set(1L, 2L))
      assert(!closed.exists(c => c._1 == 1L && c._3 >= us(11, 50)),
        "B leaked into the closed set")

      // Handoff: batch q60 over events NOT consumed by a closed
      // session (open tails replayed in full + post-cut arrivals).
      val allEvents = (preCut ++ driver ++ postCut)
        .map { case (u, e, t) => (u, e, t.getTime * 1000L) }
      val remaining = allEvents.filterNot { case (u, _, eus) =>
        closed.exists(c => c._1 == u && c._2 <= eus && eus <= c._3)
      }
      val batchLeg = batchOverlaps(remaining, incidents, cell)
      val full = batchOverlaps(allEvents, incidents, cell)

      assert((streamRows ++ batchLeg) === full)
      // the union is a PARTITION: no row claimed by both legs
      assert(streamRows.intersect(batchLeg).isEmpty)
      // and the cut-spanning session's overlap came from the batch leg
      // with its FULL extent (pre-cut start, post-cut end)
      assert(batchLeg.contains(
        (101L, 1L, us(11, 50), us(12, 5), 300000000L)))
    } finally { qOv.stop(); qIv.stop() }
  }
}
