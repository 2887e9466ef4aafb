package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming source-drift monitor: bounded per-source census state, TV
  * distance identical to e69's exact integer form computed in batch over
  * the same observations.
  */
class StreamDriftSpec extends SparkSpecBase {

  private val B = 16 // small bucket space keeps the oracle census legible

  /** e69's exact formula in plain Scala — the batch oracle the stream
    * must agree with after any number of micro-batches.
    */
  private def batchTvBp(obs: Seq[Int], ref: Map[Int, Long]): Long = {
    val counts = Array.fill(B)(0L)
    obs.foreach(f => counts(f) += 1)
    val nS = obs.size.toLong
    val refArr = (0 until B).map(f => ref.getOrElse(f, 0L))
    val nRef = refArr.sum
    val numer = (0 until B).map(f =>
      (BigInt(counts(f)) * nRef - BigInt(refArr(f)) * nS).abs).sum
    (numer * 5000 / (BigInt(nS) * nRef)).toLong
  }

  test("streaming census accumulates across batches and matches the " +
    "batch TV formula; identical distribution reads zero") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // reference: uniform over buckets 0..7
    val ref = (0 until 8).map(f => f -> 25L).toMap
    val ms = MemoryStream[StreamDrift.Tok]
    val q = StreamDrift.tvDrift(ms.toDS(), ref, buckets = B)
      .toDF()
      .writeStream
      .format("memory").queryName("drift_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // srcA batch 1: uniform over 0..7 (matches reference exactly);
      // srcB batch 1: concentrated on buckets 8..9 (disjoint support)
      val aB1 = (0 until 8).flatMap(f => Seq.fill(5)(f))
      val bB1 = Seq.fill(10)(8) ++ Seq.fill(10)(9)
      ms.addData(aB1.map(StreamDrift.Tok("srcA", _)) ++
        bB1.map(StreamDrift.Tok("srcB", _)): _*)
      q.processAllAvailable()
      // srcA batch 2: drifts toward bucket 0
      val aB2 = Seq.fill(40)(0)
      ms.addData(aB2.map(StreamDrift.Tok("srcA", _)): _*)
      q.processAllAvailable()

      val rows = spark.table("drift_state").as[StreamDrift.Drift]
        .collect()
      val aEmits = rows.filter(_.source == "srcA").sortBy(_.n_tokens)
      val bLast = rows.filter(_.source == "srcB").last

      // batch-1 emission: identical distribution → exactly zero drift
      assert(aEmits.head.n_tokens === 40L)
      assert(aEmits.head.tv_bp === 0L)
      // batch-2 emission: state accumulated across batches — must equal
      // the batch formula over the UNION of both batches' observations
      assert(aEmits.last.n_tokens === 80L)
      assert(aEmits.last.tv_bp === batchTvBp(aB1 ++ aB2, ref))
      // disjoint support → TV = 1 exactly (10000 bp)
      assert(bLast.tv_bp === 10000L)
      assert(bLast.tv_bp === batchTvBp(bB1, ref))
    } finally q.stop()
  }

  test("tvBp is exact beyond int64 fold headroom") {
    // counts large enough that cnt_f * N_ref overflows a 64-bit fold
    // (the e69 batch form's documented cliff): the arbitrary-precision
    // accumulator must still produce the exact rational answer.
    val big = 4_000_000_000L // 4e9 tokens in one bucket
    val counts = IndexedSeq(big, big)
    val ref = IndexedSeq(big, 0L)
    // p = (1/2, 1/2), q = (1, 0) → TV = 1/2 → 5000 bp; the cross
    // products are ~1.6e19 > Long.MaxValue
    assert(StreamDrift.tvBp(counts, 2 * big, ref, big) === 5000L)
  }
}
