package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** Streaming context packing: equals e78's closed-form span over the
  * same rows, seals exactly the crossed boundaries, quarantines
  * replays and empty docs without advancing the cursor.
  */
class StreamPackContextsSpec extends SparkSpecBase {

  private val C = 100L

  /** The batch e78 rule, sequentially per source: exclusive token
    * prefix sum, span = floor(cum/C)..floor((cum+n-1)/C).
    */
  private def expected(docs: Seq[StreamPackContexts.Doc])
    : Map[(String, Long), (Long, Long, Long, Long)] =
    docs.filter(_.n_tok > 0).groupBy(_.source).flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_.doc_id).map { d =>
        val r = (src, d.doc_id) ->
          (cum / C, (cum + d.n_tok - 1) / C, cum % C,
            (cum + d.n_tok) / C - cum / C)
        cum += d.n_tok
        r
      }
    }

  test("stream spans equal the batch closed form; boundaries seal " +
    "exactly once; replays and empty docs quarantine") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[StreamPackContexts.Doc]
    val q = StreamPackContexts.pack(ms.toDS(), C)
      .toDF()
      .writeStream
      .format("memory").queryName("pack_ctx").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val b1 = Seq(
        StreamPackContexts.Doc("s1", 1L, 40L),
        StreamPackContexts.Doc("s1", 2L, 40L),
        StreamPackContexts.Doc("s1", 3L, 250L), // spans ctx 0..3
        StreamPackContexts.Doc("s2", 1L, 100L)) // exactly one context
      ms.addData(b1.reverse: _*) // unsorted delivery — operator sorts
      q.processAllAvailable()
      val b2 = Seq(
        StreamPackContexts.Doc("s1", 4L, 10L),
        StreamPackContexts.Doc("s1", 2L, 99L), // replay: quarantine
        StreamPackContexts.Doc("s2", 2L, 0L))  // empty: quarantine
      ms.addData(b2: _*)
      q.processAllAvailable()

      val rows = spark.table("pack_ctx")
        .as[StreamPackContexts.Packed].collect()

      val quarantined = rows.filter(_.ctx_first == -1L)
      assert(quarantined.map(r => (r.source, r.doc_id)).toSet ===
        Set(("s1", 2L), ("s2", 2L)))
      // quarantine re-emits carry no seals
      assert(quarantined.forall(_.n_sealed == 0L))

      val accepted = rows.filter(_.ctx_first >= 0L)
      val exp = expected(b1 ++ Seq(StreamPackContexts.Doc("s1", 4L, 10L)))
      assert(accepted.length === exp.size)
      accepted.foreach { a =>
        val (f, l, off, sealed0) = exp((a.source, a.doc_id))
        assert(a.ctx_first === f, s"first for ${(a.source, a.doc_id)}")
        assert(a.ctx_last === l, s"last for ${(a.source, a.doc_id)}")
        assert(a.off_in_ctx === off, s"off for ${(a.source, a.doc_id)}")
        assert(a.n_sealed === sealed0, s"sealed for ${(a.source, a.doc_id)}")
      }
      // seals are exact and exactly-once: per source, total sealed ==
      // floor(total tokens / C) — every full context sealed by exactly
      // one emission (s1: 340 tokens -> 3; s2: 100 -> 1)
      val sealedBySource = accepted.groupBy(_.source)
        .view.mapValues(_.map(_.n_sealed).sum).toMap
      assert(sealedBySource === Map("s1" -> 3L, "s2" -> 1L))
      // split continuity: a doc starting mid-context continues its
      // predecessor's last context
      val s1 = accepted.filter(_.source == "s1").sortBy(_.doc_id)
      s1.sliding(2).foreach { case Array(p, n) =>
        if (n.off_in_ctx > 0) assert(n.ctx_first === p.ctx_last)
        else assert(n.ctx_first === p.ctx_last + 1)
      }
    } finally q.stop()
  }
}
