package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming shard assignment: equals the batch e34 rule over the same
  * rows, extends (never rewrites) across batches, quarantines
  * out-of-order arrivals without advancing the cursor.
  */
class StreamShardAssignSpec extends SparkSpecBase {

  private val budget = 100L

  /** The batch e34 rule, sequentially: exclusive prefix sum div budget
    * in doc_id order per source.
    */
  private def expected(
      docs: Seq[StreamShardAssign.Doc]): Map[(String, Long), (Long, Long)] =
    docs.groupBy(_.source).flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_.doc_id).map { d =>
        val r = (src, d.doc_id) -> (cum / budget, cum)
        cum += d.n_tok
        r
      }
    }

  test("stream assignments equal the batch prefix-sum rule and appends " +
    "never move earlier shards") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[StreamShardAssign.Doc]
    val q = StreamShardAssign.assign(ms.toDS(), budget)
      .toDF()
      .writeStream
      .format("memory").queryName("shard_assign").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val b1 = Seq(
        StreamShardAssign.Doc("s1", 1L, 40L),
        StreamShardAssign.Doc("s1", 2L, 40L),
        StreamShardAssign.Doc("s1", 3L, 40L), // straddles 100: starts in 0
        StreamShardAssign.Doc("s2", 1L, 250L))
      // delivered unsorted within the batch — the operator must sort
      ms.addData(b1.reverse: _*)
      q.processAllAvailable()
      val b2 = Seq(
        StreamShardAssign.Doc("s1", 4L, 10L),
        StreamShardAssign.Doc("s2", 2L, 10L),
        StreamShardAssign.Doc("s1", 2L, 99L)) // replay: must quarantine
      ms.addData(b2: _*)
      q.processAllAvailable()

      val rows = spark.table("shard_assign")
        .as[StreamShardAssign.Assigned].collect()

      // the replayed doc is quarantined, cursor untouched
      val quarantined = rows.filter(_.shard_id == -1L)
      assert(quarantined.map(r => (r.source, r.doc_id)).toSeq ===
        Seq(("s1", 2L)))

      // every accepted assignment equals the batch rule over the
      // accepted rows (b1 plus b2 minus the replay)
      val accepted = rows.filter(_.shard_id >= 0L)
      val exp = expected(b1 ++ b2.filterNot(d =>
        d.source == "s1" && d.doc_id == 2L))
      accepted.foreach { a =>
        val (shard, cum) = exp((a.source, a.doc_id))
        assert(a.shard_id === shard, s"shard for ${(a.source, a.doc_id)}")
        assert(a.cum_before === cum, s"cum for ${(a.source, a.doc_id)}")
      }
      // batch-2 appends extended s1 without re-emitting docs 1-3: the
      // earlier assignments in the sink are final (arrival-order
      // stability, e77's moved_bp = 0 in streaming form)
      assert(accepted.count(a => a.source == "s1") === 4)
      // doc straddling the boundary stays in the shard it starts in
      val straddler = accepted.find(a => a.source == "s1" && a.doc_id == 3L).get
      assert(straddler.shard_id === 0L && straddler.cum_before === 80L)
      // next doc lands in shard 1
      val next = accepted.find(a => a.source == "s1" && a.doc_id == 4L).get
      assert(next.shard_id === 1L && next.cum_before === 120L)
    } finally q.stop()
  }
}
