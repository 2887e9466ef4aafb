package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.gen.MockData

/** Streaming priority sampling: bounded k+1 state, stream-equals-batch
  * on any prefix, idempotent under replay, and the scalar draw twin
  * matches the Column draw bit-for-bit.
  */
class StreamPrioritySampleSpec extends SparkSpecBase {

  test("hashLongJvm equals the Column hashLong draw") {
    import spark.implicits._
    val keys = Seq(0L, 1L, 7L, 499L, 123456789L)
    val viaCol = keys.toDF("k")
      .select(MockData.hashLong(7L, "prio", col("k")))
      .as[Long].collect().toSeq
    assert(viaCol === keys.map(MockData.hashLongJvm(7L, "prio", _)))
  }

  test("streamed sample equals the batch DLT sample; replay is idempotent") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val k = 3
    val docs = (0L until 40L).map(i =>
      StreamPrioritySample.Doc(if (i % 2 == 0) "a" else "b", i, 10 + i))
    val ms = MemoryStream[StreamPrioritySample.Doc]
    val out = StreamPrioritySample.sample(ms.toDS(), k)
    val q = out.writeStream
      .format("memory").queryName("prio_sample").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      ms.addData(docs.take(25): _*)
      q.processAllAvailable()
      ms.addData(docs.drop(25): _*)
      q.processAllAvailable()
      // replay a slice (at-least-once source): must not change anything
      ms.addData(docs.slice(10, 30): _*)
      q.processAllAvailable()

      val last = spark.table("prio_sample")
        .as[StreamPrioritySample.Sample].collect()
        .groupBy(_.source).map { case (s, rows) => s -> rows.last }

      // batch reference: per source, top-k by (priority desc, id), tau =
      // (k+1)-th priority — e89's exact rule on the same rows
      docs.groupBy(_.source).foreach { case (src, rows) =>
        val scored = rows.map(d =>
            (d.doc_id, d.weight,
              StreamPrioritySample.priority(7L, d.doc_id, d.weight)))
          .sortBy(t => (-t._3, t._1))
        val tau = if (scored.size > k) scored(k)._3 else 0L
        val expIds = scored.take(k).map(_._1)
        val expEst = scored.take(k).map(t => math.max(t._2 * 1000, tau))
        val got = last(src)
        assert(got.ids === expIds, s"source $src ids")
        assert(got.tauMilli === tau, s"source $src tau")
        assert(got.wEstMilli === expEst, s"source $src estimates")
        assert(got.ids.length <= k && got.priorities.length <= k)
      }
    } finally q.stop()
  }
}
