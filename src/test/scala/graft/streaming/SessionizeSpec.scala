package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** flatMapGroupsWithState sessionizer: gap-splitting inside a batch,
  * across batches, per-user isolation, and the event-time TIMEOUT path
  * (an idle user's last session emits once the watermark passes it,
  * without any further events for that user).
  */
class SessionizeSpec extends SparkSpecBase {

  private def ts(h: Int, m: Int) =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  private def run(
      feed: Seq[Seq[(Long, Long, Timestamp)]],
      name: String): Map[(Long, Timestamp), (Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, Long, Timestamp)]
    val out = Sessionize.sessions(
      ms.toDF().toDF("user_id", "event_id", "ts"), "5 minutes")
    val q = out.writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      for (batch <- feed) { ms.addData(batch); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[Sessionize.Session].collect()
      .map(s => (s.user_id, s.session_start) -> (s.n_events, s.duration_sec))
      .toMap
  }

  test("gap splits within and across batches; timeout flushes idle users") {
    val got = run(Seq(
      // batch 1: user 1 session A (2 events), then a >30min gap opens B
      // in the SAME batch; user 2 starts its own session
      Seq((1L, 1L, ts(10, 0)), (1L, 2L, ts(10, 10)), (1L, 3L, ts(11, 0)),
        (2L, 4L, ts(10, 5))),
      // batch 2: user 1 extends B; a later event advances the watermark
      // past user 2's gap, so user 2's session emits via TIMEOUT
      Seq((1L, 5L, ts(11, 20)), (1L, 6L, ts(12, 30))),
      // batch 3: far-future watermark driver flushes everything left
      Seq((9L, 7L, ts(20, 0))),
      Seq((9L, 8L, ts(23, 0)))), "sess1")
    assert(got === Map(
      (1L, ts(10, 0)) -> (2L, 600L),   // session A: 10:00-10:10
      (1L, ts(11, 0)) -> (2L, 1200L),  // session B: 11:00-11:20
      (1L, ts(12, 30)) -> (1L, 0L),    // session C: single event
      (2L, ts(10, 5)) -> (1L, 0L),     // user 2, emitted by timeout
      (9L, ts(20, 0)) -> (1L, 0L)))    // flush driver's own first session
  }

  test("matches the batch q17 sessionizer on a deterministic replay") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // event times span 3 users; batches must be time-ordered (the
    // watermark contract — a replay feeding hour-14 events before hour-8
    // events would legitimately DROP the latter as late), but arrival
    // order WITHIN a batch is scrambled to exercise the in-batch sort
    val evs = (0 until 120).map { i =>
      val u = i % 3
      val t = ts(8 + (i % 7), (i * 17) % 60)
      (u.toLong, i.toLong, t)
    }
    val batches = evs.sortBy(e => (e._3.getTime, e._2))
      .grouped(40).map(_.sortBy(e => (e._2 * 7919) % 41)).toSeq :+
      Seq((99L, 999L, ts(23, 59))) // watermark flush
    val got = run(batches, "sess2")

    // batch oracle: q17 logic over the same rows
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val expect = (evs :+ (99L, 999L, ts(23, 59)))
      .toDF("user_id", "event_id", "ts")
      .select(col("user_id"), col("event_id"), col("ts"),
        lag(col("ts"), 1).over(byUser).as("prev_ts"))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L,
        1).otherwise(0))
      .withColumn("sid", sum(col("is_new"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          / 1000000L).cast("long").as("duration_sec"))
      .as[(Long, Long, Timestamp, Long, Long)].collect()
      .map(r => (r._1, r._3) -> (r._4, r._5)).toMap

    // the flush driver's own session may not emit (nothing after it);
    // compare on all sessions the stream DID emit, and require it
    // emitted every session of the real users
    assert(got.filter(_._1._1 != 99L) === expect.filter(_._1._1 != 99L))
  }
}
