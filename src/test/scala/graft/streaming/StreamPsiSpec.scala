package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming PSI monitor: bounded per-key census state, PSI identical
  * to e115's batch formula (add-one smoothing, bucket-order fold,
  * trunc) computed over the same observations.
  */
class StreamPsiSpec extends SparkSpecBase {

  private val B = 10

  /** e115's PSI in plain Scala — the batch oracle the stream must agree
    * with after any number of micro-batches (same fold order).
    */
  private def batchPsiBp(obs: Seq[Int], ref: Map[Int, Long]): Long = {
    val counts = Array.fill(B)(0L)
    obs.foreach(b => counts(b) += 1)
    val refArr = (0 until B).map(b => ref.getOrElse(b, 0L))
    val nRef = refArr.sum
    var acc = 0.0
    for (i <- 0 until B) {
      val q = (counts(i) + 1.0) / (obs.size + B.toDouble)
      val p = (refArr(i) + 1.0) / (nRef + B.toDouble)
      acc += (q - p) * math.log(q / p)
    }
    (acc * 10000).toLong
  }

  test("streaming census accumulates across batches and matches the" +
    " batch PSI formula; matching distribution stays unflagged and a" +
    " concentrated one crosses the 0.25 rule") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // reference: uniform over all 10 buckets
    val ref = (0 until B).map(b => b -> 20L).toMap
    val ms = MemoryStream[StreamPsi.Obs]
    val q = StreamPsi.monitor(ms.toDS(), ref, buckets = B)
      .toDF()
      .writeStream
      .format("memory").queryName("psi_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // keyA batch 1: uniform (matches reference); keyB: all in bucket 9
      val aB1 = (0 until B).flatMap(b => Seq.fill(4)(b))
      val bB1 = Seq.fill(40)(9)
      ms.addData(aB1.map(StreamPsi.Obs("keyA", _)) ++
        bB1.map(StreamPsi.Obs("keyB", _)): _*)
      q.processAllAvailable()
      // keyA batch 2: drifts hard toward bucket 0
      val aB2 = Seq.fill(120)(0)
      ms.addData(aB2.map(StreamPsi.Obs("keyA", _)): _*)
      q.processAllAvailable()

      val rows = spark.table("psi_state").as[StreamPsi.Psi].collect()
      val aEmits = rows.filter(_.key == "keyA").sortBy(_.n_obs)
      val bLast = rows.filter(_.key == "keyB").last

      // batch-1: matching distribution → tiny PSI (add-one smoothing
      // keeps it near but not exactly zero), not drifted
      assert(aEmits.head.n_obs === 40L)
      assert(aEmits.head.psi_bp === batchPsiBp(aB1, ref))
      assert(aEmits.head.psi_bp < 1000L)
      assert(!aEmits.head.drifted)
      // batch-2: state accumulated across batches — equals the batch
      // formula over the UNION of both batches, and crosses 0.25
      assert(aEmits.last.n_obs === 160L)
      assert(aEmits.last.psi_bp === batchPsiBp(aB1 ++ aB2, ref))
      assert(aEmits.last.drifted)
      // concentrated key drifted from the first batch
      assert(bLast.psi_bp === batchPsiBp(bB1, ref))
      assert(bLast.drifted)
    } finally q.stop()
  }

  test("psiBp folds in bucket order (matches e115's explicit t0..t9 sum)") {
    // An arbitrary-order double reduction could differ in the last ulp;
    // the implementation must fold ascending-bucket exactly like the
    // batch query's t0+t1+...+t9 column sum. Pin against a manual
    // left-to-right fold on a value set chosen to make order matter
    // at double precision.
    val counts = IndexedSeq(1L, 1000000000L, 3L, 7L, 0L, 0L, 0L, 0L, 0L, 1L)
    val ref = IndexedSeq(999L, 1L, 500L, 0L, 0L, 0L, 0L, 0L, 0L, 100L)
    val n = counts.sum
    val nRef = ref.sum
    var acc = 0.0
    for (i <- 0 until 10) {
      val q = (counts(i) + 1.0) / (n + 10.0)
      val p = (ref(i) + 1.0) / (nRef + 10.0)
      acc += (q - p) * math.log(q / p)
    }
    assert(StreamPsi.psiBp(counts, n, ref, nRef) === (acc * 10000).toLong)
  }
}
