package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Chunked gap-sessionization: identical sessions to the plain
  * user-windowed formulation for ANY chunk size (including chunks far
  * smaller than the gap, where most sessions span several chunks and
  * the merge chain does real work), with the event-level window
  * partitioned by (user, chunk) so a hot user's stream cannot
  * serialize into one task.
  */
class GapSessionsSpec extends SparkSpecBase {

  private val gap = 1800L // "30 minutes" in seconds-as-longs

  // 95%-hot fixture: user 7 has 9500 events over a long range with a
  // mix of dense bursts (long sessions crossing chunk boundaries) and
  // sparse singleton sessions; other users get sparse traffic.
  private lazy val events = {
    import spark.implicits._
    (0 until 10000).map { i =>
      val u = if (i % 20 != 0) 7L else (i * 6271) % 50L
      // bursts: runs of 40 events 60s apart, then a 2h jump
      val burst = i / 40
      val t = burst * 7200L + (i % 40) * 60L + (i * 7919) % 7L
      (u, i.toLong, t)
    }.toDF("user_id", "event_id", "ts")
  }

  test("chunked sessions equal plain sessions for small, large, and " +
    "gap-straddling chunk sizes") {
    val plain = GapSessions.sessions(events, "user_id", "ts", "event_id", gap)
    for (chunk <- Seq(600L, 1800L, 7200L, 1000000L)) {
      val chunked = GapSessions.sessionsChunked(
        events, "user_id", "ts", "event_id", gap, chunk)
      assert(chunked.exceptAll(plain).isEmpty &&
        plain.exceptAll(chunked).isEmpty,
        s"chunkSize=$chunk diverged from the plain sessionizer")
    }
  }

  test("hot user's event window is bounded by (user, chunk), and the " +
    "merge chain sees only boundary rows") {
    val chunk = 7200L
    // event-level partition bound: the hot user's largest (user, chunk)
    // group is far below its total volume
    val maxGroup = events
      .groupBy(col("user_id"), floor(col("ts") / chunk).as("c"))
      .count().agg(max("count")).head.getLong(0)
    val hotTotal = events.filter(col("user_id") === 7L).count()
    assert(maxGroup < hotTotal / 4,
      s"largest (user, chunk) group $maxGroup not bounded vs $hotTotal")

    // the phase-1 window really partitions by both columns
    val plan = GapSessions.sessionsChunked(
      events, "user_id", "ts", "event_id", gap, chunk)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id#\\d+L?, __c#\\d+L?".r
      .findFirstIn(plan).isDefined,
      s"no (user, chunk) partitioning:\n${plan.take(3000)}")
  }

  test("single-session chunks merge transitively across many chunks") {
    import spark.implicits._
    // one user, events every 25 min over 10 h: ONE session overall, but
    // with 30-min chunks nearly every chunk holds a single local
    // session — the transitive-merge worst case; plus an isolated
    // trailing event that must stay its own session.
    val ev = ((0 until 24).map(i => (1L, i.toLong, i * 1500L)) :+
      (1L, 99L, 200000L)).toDF("user_id", "event_id", "ts")
    val got = GapSessions.sessionsChunked(
      ev, "user_id", "ts", "event_id", gap, chunkSize = 1800L)
      .orderBy("session_start")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === Array((0L, 23L * 1500L, 24L), (200000L, 200000L, 1L)))
  }
}
