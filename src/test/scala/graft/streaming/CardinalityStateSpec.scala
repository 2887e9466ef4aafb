package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.functions.{sketches, Portable}

/** Streaming KMV cardinality monitor: bounded per-key state, cross-batch
  * merge identical to the batch aggregate, idempotent under replay.
  */
class CardinalityStateSpec extends SparkSpecBase {

  private val P = Portable.P

  // the MortonMinKSpec spreading multiplier: products wrap P many times
  // over, so hashes cover [0, P) and the uniformity assumption holds
  private def h(v: Long): Long = (v * 2654435761L) % P

  test("streaming sketch equals the batch KmvAgg over the same data; " +
    "estimate within KMV bounds; replay is idempotent") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val k = 32
    val ms = MemoryStream[CardinalityState.Obs]
    val q = CardinalityState.distinctEstimate(ms.toDS(), k)
      .toDF()
      .writeStream
      .format("memory").queryName("card_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // batch 1: src1 sees 1..400 (each twice — duplicates must not
      // count), src2 sees a sub-k population
      val b1 = (1L to 400L).flatMap(v =>
        Seq(CardinalityState.Obs("src1", h(v)),
          CardinalityState.Obs("src1", h(v)))) ++
        (1L to 10L).map(v => CardinalityState.Obs("src2", h(v)))
      ms.addData(b1: _*)
      q.processAllAvailable()
      // batch 2: src1 grows by 401..1000 plus a full REPLAY of batch 1
      val b2 = (401L to 1000L).map(v => CardinalityState.Obs("src1", h(v))) ++
        (1L to 400L).map(v => CardinalityState.Obs("src1", h(v)))
      ms.addData(b2: _*)
      q.processAllAvailable()

      val rows = spark.table("card_state")
        .as[CardinalityState.Card].collect()
      val src1 = rows.filter(_.key == "src1").last
      val src2 = rows.filter(_.key == "src2").last

      // sub-k population: the sketch IS the distinct set, estimate exact
      assert(src2.sketch_size === 10)
      assert(src2.estimate === 10L)

      // the streaming state after two batches must equal the batch
      // aggregate over the union of all observations — same summary
      val batchSk = (1L to 1000L).map(h).toDF("h")
        .agg(sketches.kmv_sketch(col("h"), k)).head().getSeq[Long](0)
      assert(src1.sketch_size === k)
      val expectEst = (k - 1).toLong * P / batchSk.last
      assert(src1.estimate === expectEst)
      // replayed rows counted in n_seen (observation count, not
      // distinct), but left the sketch unchanged: 800 + 600 + 400
      assert(src1.n_seen === 1800L)
      // estimator sanity on the true cardinality 1000
      val rse = 1.0 / math.sqrt(k - 2.0)
      assert(math.abs(src1.estimate - 1000.0) / 1000.0 < 4 * rse,
        s"estimate ${src1.estimate} too far from 1000")
    } finally q.stop()
  }
}
