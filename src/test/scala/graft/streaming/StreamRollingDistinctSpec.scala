package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** The custom HLL aggregate inside Structured Streaming's windowed
  * state: emitted windows must equal the batch computation over the
  * full stream (registers are deterministic), and duplicate delivery
  * must be a no-op (register max is idempotent — the at-least-once
  * safety claim, asserted, not just documented).
  */
class StreamRollingDistinctSpec extends SparkSpecBase {

  private case class Ev(user_id: java.lang.Long, ts: Timestamp)
  private def ts(h: Long): Timestamp = new Timestamp(h * 3600 * 1000L)

  test("windowed HLL stream equals batch, duplicates are no-ops") {
    val s = spark.newSession()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val ms = MemoryStream[(java.lang.Long, Timestamp)]
    val events = ms.toDF().toDF("user_id", "ts")
    val q = StreamRollingDistinct
      .estimates(events, watermark = "0 seconds",
        length = "2 hours", slide = "1 hour")
      .writeStream
      .format("memory").queryName("srd").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // hours 0-2: 60 users, some overlapping windows
      val b1 = (1L to 40L).map(u => (Long.box(u), ts(0))) ++
        (21L to 60L).map(u => (Long.box(u), ts(1)))
      ms.addData(b1: _*)
      q.processAllAvailable()
      // duplicates of batch 1 PLUS new hour-2 rows; the replays must
      // not move any window's registers
      val b2 = b1 ++ (41L to 80L).map(u => (Long.box(u), ts(2)))
      ms.addData(b2: _*)
      q.processAllAvailable()
      // late far-future row closes every earlier window (watermark 0s)
      ms.addData((Long.box(999L), ts(100)))
      q.processAllAvailable()
      val rows = s.table("srd")
        .select(col("win_start"), col("est_users"), col("v_zero"),
          col("lc_est"))
        .collect()
      val got = rows.map(r => r.getTimestamp(0).getTime -> r.getLong(1))
        .toMap
      // small-range contract (ADVICE r10): every row carries v_zero,
      // and lc_est is present exactly in its regime (est <= 5m/2 and
      // empty registers exist) with the e134 formula
      rows.foreach { r =>
        val (est, vz) = (r.getLong(1), r.getLong(2))
        assert(vz >= 0L && vz <= 64L)
        val inRegime = est * 2 <= 320 && vz > 0
        assert(!r.isNullAt(3) === inRegime, s"lc regime for est=$est vz=$vz")
        if (inRegime)
          assert(math.abs(r.getDouble(3) - 64d * math.log(64d / vz)) < 1e-4)
      }
      // batch truth over the DISTINCT event set (duplicates removed by
      // construction — equality proves the stream treated them as
      // no-ops too)
      val all = (b1 ++ b2).distinct ++ Seq((Long.box(999L), ts(100)))
      val batch = all.toDF("user_id", "ts")
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(graft.functions.sketches.hll_sketch(col("user_id"))
          .as("regs"))
        .withColumn("s2", expr("aggregate(transform(regs, " +
          "r -> shiftleft(CAST(1 AS BIGINT), CAST(25 - r AS INT))), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x)"))
        .select(col("window.start").as("st"),
          expr(s"${709L * (1L << 37)} div (1000 * s2)").as("est"))
        .collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1))
        .toMap
      // every CLOSED window the stream emitted matches batch exactly
      assert(got.nonEmpty)
      got.foreach { case (st, est) =>
        assert(batch(st) === est, s"window start $st")
      }
      // the fully-covered 2-hour window [0,2): 60 distinct users → the
      // estimate is in the model's range, and hour-1's overlap did not
      // double-count users 21-40
      val w0 = got(ts(0).getTime)
      assert(w0 > 40L && w0 < 90L, s"est $w0 for 60 true")
    } finally q.stop()
  }
}
