package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming per-key top-k: bounded state, cross-batch merging,
  * deterministic tie-breaks, idempotent under entry replay.
  */
class TopKStateSpec extends SparkSpecBase {

  test("leaderboard merges across micro-batches with bounded k") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[TopKState.Scored]
    val out = TopKState.topK(ms.toDS(), k = 3)
    val q = out.writeStream
      .format("memory").queryName("topk_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData(
        TopKState.Scored("s1", 1L, 50L), TopKState.Scored("s1", 2L, 80L),
        TopKState.Scored("s1", 3L, 10L), TopKState.Scored("s1", 4L, 70L),
        TopKState.Scored("s2", 9L, 5L))
      q.processAllAvailable()
      // batch 2: a new high entry, a replay of id=1 (same score), and a
      // tie with id=4's score that must lose to the lower id
      ms.addData(
        TopKState.Scored("s1", 5L, 90L), TopKState.Scored("s1", 1L, 50L),
        TopKState.Scored("s1", 6L, 70L))
      q.processAllAvailable()
      val rows = spark.table("topk_state").as[TopKState.Leaderboard]
        .collect().filter(_.key == "s1")
      // last update for s1 wins: 90 (id5), 80 (id2), then 70 tie ->
      // id4 < id6 keeps id4; bounded at k=3
      val last = rows.last
      assert(last.ids === Seq(5L, 2L, 4L))
      assert(last.scores === Seq(90L, 80L, 70L))
      // s2 untouched in batch 2 -> its single batch-1 row stands
      val s2 = spark.table("topk_state").as[TopKState.Leaderboard]
        .collect().filter(_.key == "s2")
      assert(s2.map(_.ids).last === Seq(9L))
    } finally q.stop()
  }
}
