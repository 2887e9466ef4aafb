package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Composed streaming curation: the quality gate drops junk, the
  * watermarked dedup drops replays (same and cross batch), and the
  * chained windowed aggregation emits per-(window, lang) yields once
  * the watermark closes a window.
  */
class StreamPrepSpec extends SparkSpecBase {

  private def ts(h: Int, m: Int) =
    Timestamp.valueOf(f"2026-01-01 $h%02d:$m%02d:00")

  test("gate, dedup and windowed yield across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val good = "the quick brown fox jumps over a lazy dog"  // passes gate
    val short = "tiny text"                                 // <5 words
    val noisy = "@#$% !!! ??? ### &&& *** the a list item"  // punct-heavy
    def row(id: Long, h: Int, m: Int, text: String, lang: String) =
      (id, text, lang, text.length.toLong, ts(h, m))
    val ms = MemoryStream[(Long, String, String, Long, Timestamp)]
    val out = StreamPrep.curate(
      ms.toDF().toDF("doc_id", "text", "lang", "n_chars", "ts"),
      "ts", "30 minutes")
    val q = out.writeStream
      .format("memory").queryName("sprep").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData(
        row(1, 10, 0, good, "en"),
        row(2, 10, 5, good, "en"),        // same-batch replay: dropped
        row(3, 10, 10, good + " again", "en"),
        row(4, 10, 15, short, "en"),      // gated: too short
        row(5, 10, 20, noisy, "en"),      // gated: punctuation ratio
        row(6, 10, 25, good + " encore", "de"))
      q.processAllAvailable()
      ms.addData(row(7, 10, 40, good, "en")) // cross-batch replay: dropped
      q.processAllAvailable()
      // push the watermark past 11:00 + horizon so the 10:00 window closes
      ms.addData(row(8, 12, 0, good + " closer", "en"))
      q.processAllAvailable()

      val got = spark.table("sprep")
        .select("window_start", "lang", "n_docs", "n_words")
        .as[(Timestamp, String, Long, Long)].collect().toSet
      // admitted in 10:00-11:00: docs 1 (9w), 3 (10w) en; 6 (10w) de
      assert(got === Set(
        (ts(10, 0), "en", 2L, 19L),
        (ts(10, 0), "de", 1L, 10L)))
    } finally q.stop()
  }

  test("bloom decontamination gate drops benchmark replays at ingest") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.{sketches, F}
    val (mBits, kHashes) = (1 << 14, 4)
    val bench =
      "the quick brown fox jumps over a lazy dog near the river bank"
    // bitmap from the benchmark's shingles (the e48 build step, batch)
    val bitmap = Seq(bench).toDF("text")
      .select(explode(F.shingle_hashes(col("text"))).as("sh"))
      .agg(sketches.bloom_bitmap(col("sh"), mBits, kHashes))
      .head().getSeq[Long](0).toArray

    val clean = "completely different words about spark shuffles and " +
      "partitions flowing through an engine pipeline tonight"
    val ms = MemoryStream[(Long, String)]
    val out = StreamPrep.decontaminationGate(
      ms.toDF().toDF("doc_id", "text"), bitmap, mBits, kHashes)
    val q = out.writeStream
      .format("memory").queryName("bloomgate").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData(
        (1L, bench),               // verbatim benchmark: must drop (no FN)
        (2L, "prefix words " + bench + " suffix words"), // containment
        (3L, clean))
      q.processAllAvailable()
      val got = spark.table("bloomgate")
        .select("doc_id").as[Long].collect().toSet
      assert(!got.contains(1L) && !got.contains(2L),
        s"contaminated docs admitted: $got")
      assert(got.contains(3L), "clean doc was dropped")
    } finally q.stop()
  }
}
