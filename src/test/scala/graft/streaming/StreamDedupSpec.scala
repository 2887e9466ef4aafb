package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming first-arrival dedup: replayed content within the watermark
  * horizon is dropped across micro-batches; distinct content passes.
  */
class StreamDedupSpec extends SparkSpecBase {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("dropDuplicatesWithinWatermark keeps first arrival per digest") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, Timestamp, String)]
    val out = StreamDedup.firstArrivalByContent(
      ms.toDF().toDF("doc_id", "event_ts", "text"),
      "event_ts", "30 minutes")
    val q = out.writeStream
      .format("memory").queryName("sdedup").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData((1L, ts(0), "alpha"), (2L, ts(1), "beta"), (3L, ts(2), "alpha"))
      q.processAllAvailable()
      // same-batch replay of "alpha" dropped
      assert(spark.table("sdedup").count() === 2)

      ms.addData((4L, ts(5), "alpha"), (5L, ts(6), "gamma"))
      q.processAllAvailable()
      // cross-batch replay within the horizon dropped; new content kept
      val kept = spark.table("sdedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 5L))
    } finally q.stop()
  }

  test("simhash variant drops light edits with the same word profile") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, Timestamp, String)]
    val out = StreamDedup.firstArrivalBySimhash(
      ms.toDF().toDF("doc_id", "event_ts", "text"),
      "event_ts", "30 minutes")
    val q = out.writeStream
      .format("memory").queryName("sdedup_sim").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // doc 2 differs from doc 1 only by punctuation/casing — identical
      // word-hash multiset, identical simhash; doc 3 is different text
      ms.addData(
        (1L, ts(0), "the quick brown fox"),
        (2L, ts(1), "The QUICK, brown fox!"),
        (3L, ts(2), "an entirely different document body"))
      q.processAllAvailable()
      val kept = spark.table("sdedup_sim").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 3L))
    } finally q.stop()
  }

  test("againstBase drops docs already in the static base, then replays") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val base = Seq("existing doc one", "existing doc two").toDF("text")
    val ms = MemoryStream[(Long, Timestamp, String)]
    val out = StreamDedup.againstBase(
      ms.toDF().toDF("doc_id", "event_ts", "text"),
      base, "event_ts", "30 minutes")
    val q = out.writeStream
      .format("memory").queryName("sdedup_base").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData(
        (1L, ts(0), "existing doc one"), // in base → dropped
        (2L, ts(1), "fresh doc"), // kept
        (3L, ts(2), "fresh doc")) // within-stream replay → dropped
      q.processAllAvailable()
      ms.addData(
        (4L, ts(5), "existing doc two"), // in base → dropped
        (5L, ts(6), "fresh doc"), // cross-batch replay → dropped
        (6L, ts(7), "another fresh doc")) // kept
      q.processAllAvailable()
      val kept = spark.table("sdedup_base").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept === Set(2L, 6L))
    } finally q.stop()
  }
}
