package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.functions.{sketches, Portable}

/** Streaming CMS frequency monitor: bounded per-key state, cross-batch
  * update identical to the batch aggregate's merge (linear counters),
  * estimates one-sided (never under the true count).
  */
class StreamCmsSpec extends SparkSpecBase {

  private val P = Portable.P

  private def h(v: Long): Long = (v * 2654435761L) % P

  test("streaming counters equal the batch CmsAgg over the same data; " +
    "probe estimates never underestimate and match the batch probe") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val depth = 4
    val width = 64
    // skewed population: gram g in 1..50 arrives 51-g times for src1
    val pop = (1L to 50L).flatMap(g => Seq.fill(51 - g.toInt)(h(g)))
    val probes = Seq(h(1L), h(25L), h(50L), h(999L)) // last: never seen
    val exact = Map(h(1L) -> 50L, h(25L) -> 26L, h(50L) -> 1L, h(999L) -> 0L)

    val ms = MemoryStream[StreamCms.Obs]
    val q = StreamCms.monitor(ms.toDS(), depth, width, probes)
      .toDF()
      .writeStream
      .format("memory").queryName("cms_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val (b1, b2) = pop.splitAt(pop.size / 3)
      ms.addData(b1.map(StreamCms.Obs("src1", _)): _*)
      q.processAllAvailable()
      ms.addData(b2.map(StreamCms.Obs("src1", _)): _*)
      q.processAllAvailable()

      val last = spark.table("cms_state")
        .as[StreamCms.Freq].collect().filter(_.key == "src1").last
      assert(last.n_seen === pop.size.toLong)

      // one-sided guarantee on every probe, exact zero for the unseen
      // gram only if no collision — assert >= always, == where collision
      // cannot have happened is data-dependent, so compare against the
      // BATCH probe instead: stream estimate must equal what CmsAgg +
      // cms_estimate compute over the union of both batches.
      val counters = pop.toDF("h")
        .agg(sketches.cms_sketch(col("h"), depth, width))
        .head().getSeq[Long](0).toArray
      val batchEst = probes.map { p =>
        (0 until depth).map { i =>
          val key = Math.floorMod(p, P)
          val pos = ((Portable.CmsA(i) * key + Portable.CmsB(i)) % P
            % width).toInt
          counters(i * width + pos)
        }.min
      }
      assert(last.estimates === batchEst)
      probes.zip(last.estimates).foreach { case (p, e) =>
        assert(e >= exact(p), s"probe $p: estimate $e < exact ${exact(p)}")
      }
    } finally q.stop()
  }
}
