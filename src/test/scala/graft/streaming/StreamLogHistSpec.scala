package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming log₂-histogram quantiles: state equals an independent
  * replay of the bucket algebra for any batch split (addition is
  * order-free), and every estimate keeps e150's one-sided γ=2
  * guarantee against exact quantiles.
  */
class StreamLogHistSpec extends SparkSpecBase {

  /** Independent driver-side replay of the e150 contract. */
  private def replay(xs: Seq[Long]): (Long, Long, Long, Long) = {
    val m = Array.fill(42)(0L)
    xs.foreach { x =>
      val b =
        if (x <= 0L) 0
        else math.min(64 - java.lang.Long.numberOfLeadingZeros(x), 41)
      m(b) += 1L
    }
    def est(rank: Long): Long = {
      var cum = 0L
      for (b <- 0 until 42) {
        cum += m(b)
        if (cum >= rank) return (1L << b) - 1L
      }
      (1L << 41) - 1L
    }
    val n = xs.size.toLong
    (m.count(_ > 0L).toLong,
      est((n + 1) / 2), est((9 * n + 9) / 10), est((99 * n + 99) / 100))
  }

  private def exactQ(xs: Seq[Long], num: Long, den: Long): Long = {
    val sorted = xs.sorted
    val rank = ((num * xs.size + num) / den).toInt // ceil(p*n)
    sorted(math.max(rank - 1, 0))
  }

  test("stream state equals the batch bucket algebra for any split, " +
    "and estimates keep the one-sided 2x guarantee") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // heavy-tailed lengths incl. 0 and a >2^40 outlier (cap bucket)
    val xs: Seq[Long] = (1 to 400).map(i => (i * i * 7L) % 5000L) ++
      Seq(0L, 0L, 3L, 1L << 45, (1L << 20) + 17L)
    val ms = MemoryStream[StreamLogHist.Obs]
    val q = StreamLogHist.monitor(ms.toDS())
      .toDF()
      .writeStream
      .format("memory").queryName("lh_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val (b1, rest) = xs.splitAt(xs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 5)
      Seq(b1, b2, b3).foreach { b =>
        ms.addData(b.map(StreamLogHist.Obs("k", _)): _*)
        q.processAllAvailable()
      }
      val last = spark.table("lh_state")
        .as[StreamLogHist.Quantiles].collect()
        .filter(_.key == "k").maxBy(_.n_seen)
      assert(last.n_seen === xs.size.toLong)

      val (nb, p50, p90, p99) = replay(xs)
      assert(last.n_buckets === nb)
      assert((last.p50_est, last.p90_est, last.p99_est) === ((p50, p90, p99)))

      // e150's one-sided gamma=2 band against exact quantiles
      for ((est, (num, den)) <- Seq(last.p50_est -> (1L, 2L),
          last.p90_est -> (9L, 10L), last.p99_est -> (99L, 100L))) {
        val ex = exactQ(xs, num, den)
        assert(ex <= est, s"estimate $est below exact $ex")
        if (ex >= 1) assert(est < 2 * ex, s"estimate $est >= 2x exact $ex")
      }
    } finally q.stop()
  }

  test("per-key isolation: interleaved keys keep independent histograms") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val small = (1 to 50).map(_ => 10L)   // all in bucket 4 -> est 15
    val big = (1 to 50).map(_ => 1000L)   // all in bucket 10 -> est 1023
    val ms = MemoryStream[StreamLogHist.Obs]
    val q = StreamLogHist.monitor(ms.toDS())
      .toDF()
      .writeStream
      .format("memory").queryName("lh_iso").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val mixed = small.map(StreamLogHist.Obs("a", _))
        .zip(big.map(StreamLogHist.Obs("b", _)))
        .flatMap { case (x, y) => Seq(x, y) }
      ms.addData(mixed: _*)
      q.processAllAvailable()
      val rows = spark.table("lh_iso")
        .as[StreamLogHist.Quantiles].collect()
      val a = rows.filter(_.key == "a").maxBy(_.n_seen)
      val b = rows.filter(_.key == "b").maxBy(_.n_seen)
      assert((a.p50_est, a.p99_est) === ((15L, 15L)))
      assert((b.p50_est, b.p99_est) === ((1023L, 1023L)))
      assert(a.n_buckets === 1L && b.n_buckets === 1L)
    } finally q.stop()
  }
}
