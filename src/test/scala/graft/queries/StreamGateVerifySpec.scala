package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.streaming.StreamGateVerify

/** e174 — the quarantine-verify loop ONLINE (VERDICT r14 #2): stream
  * verdicts must equal e168's BATCH verdicts on the same delta (the
  * StreamSessionOverlap handoff discipline — one rule, two runtimes),
  * the static sides must be the e172 parquet artifacts read from disk,
  * and the running query must hold ZERO streaming state on both the
  * default and the RocksDB state-store providers (the semi/anti
  * cascade replaces the stateful explode-join-regroup).
  *
  * Lives in graft.queries (not graft.streaming) because the batch
  * reference IS `gateVerifyImpl` — comparing against a re-derivation
  * would let the two sides drift apart unnoticed.
  */
class StreamGateVerifySpec extends SparkSpecBase {

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  private def runStream(
      s: org.apache.spark.sql.SparkSession, name: String,
      delta: Array[(Long, String)],
      dig: org.apache.spark.sql.DataFrame,
      bands: org.apache.spark.sql.DataFrame,
      sigs: org.apache.spark.sql.DataFrame): Map[Long, (String, String)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val ms = MemoryStream[(Long, String, Timestamp)]
    val out = StreamGateVerify.verdicts(
      ms.toDF().toDF("doc_id", "text", "ts"), dig, bands, sigs)
    val q = out.writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // two micro-batches: verdicts must be final inside each batch
      val (a, b) = delta.splitAt(delta.length / 2)
      ms.addData(a.map { case (id, t) => (id, t, ts(0)) }.toSeq)
      q.processAllAvailable()
      ms.addData(b.map { case (id, t) => (id, t, ts(1)) }.toSeq)
      q.processAllAvailable()
      val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
      assert(ops.isEmpty,
        s"expected a stateless plan on $name, got $ops")
      s.table(name)
        .select("doc_id", "gate_verdict", "verdict")
        .as[(Long, String, String)].collect()
        .map { case (id, g, v) => id -> (g, v) }.toMap
    } finally q.stop()
  }

  test("stream verdicts ≡ e168 batch verdicts from the e172 artifacts, " +
    "stateless, on in-memory AND RocksDB providers") {
    val dir = "/root/testdata/sf0.001"
    // batch reference — ALSO writes the three admission artifacts
    // (e172's posture) the stream reads as its static sides
    val batchDf =
      ExtensionQueries.gateVerifyImpl(spark, dir, Some("sgv-admission"))
    val batch = batchDf.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val p = Scratch.dir(spark, "sgv-admission")
    val dig = spark.read.parquet(s"$p/digests.parquet")
    val bands = spark.read.parquet(s"$p/bands.parquet")
    val sigs = spark.read.parquet(s"$p/signatures.parquet")
    val delta = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(batch.nonEmpty && delta.length === batch.size)
    // the fixture exercises every verdict class, including the
    // rejected-quarantine leg (banded but verification said kept)
    assert(batch.values.exists(_ == ("neardup_candidate", "kept")),
      "fixture lost its band-rule false positive")
    assert(batch.values.exists(_._2 == "neardup"))
    assert(batch.values.exists(_._2 == "kept"))

    val gotMem = runStream(spark, "sgv_mem", delta, dig, bands, sigs)
    assert(gotMem === batch,
      "stream (default provider) diverged from e168's batch verdicts")

    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val gotRocks = runStream(rocks, "sgv_rocks", delta,
      rocks.read.parquet(s"$p/digests.parquet"),
      rocks.read.parquet(s"$p/bands.parquet"),
      rocks.read.parquet(s"$p/signatures.parquet"))
    assert(gotRocks === batch,
      "stream (RocksDB provider) diverged from e168's batch verdicts")
  }
}
