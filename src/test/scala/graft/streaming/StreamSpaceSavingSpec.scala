package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase

/** SpaceSaving stream monitor: bounded state, conservation invariant,
  * and the paper's guarantees checked against exact counts — the
  * properties that hold under ANY arrival order (the counter table's
  * exact content is order-dependent by design).
  */
class StreamSpaceSavingSpec extends SparkSpecBase {

  test("guarantees hold across micro-batches: conservation, bounded " +
    "state, per-item certificates, and no heavy item is lost") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val k = 8
    // Zipf-ish skew: item g in 1..40 arrives ceil(80/g) times, so the
    // top items far exceed N/k while the tail churns the counters.
    val pop = (1L to 40L).flatMap(g => Seq.fill((80 / g).toInt max 1)(g))
    val exact = pop.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = pop.size.toLong

    val ms = MemoryStream[StreamSpaceSaving.Obs]
    val q = StreamSpaceSaving.monitor(ms.toDS(), k)
      .toDF()
      .writeStream
      .format("memory").queryName("ss_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // three uneven micro-batches exercise the cross-batch state path
      val (b1, rest) = pop.splitAt(pop.size / 4)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      Seq(b1, b2, b3).foreach { b =>
        ms.addData(b.map(StreamSpaceSaving.Obs("src1", _)): _*)
        q.processAllAvailable()
      }
      val last = spark.table("ss_state")
        .as[StreamSpaceSaving.Summary].collect()
        .filter(_.key == "src1").maxBy(_.n_seen)

      assert(last.n_seen === n)
      assert(last.items.size <= k, "state exceeded k counters")
      assert(last.items.distinct.size === last.items.size)
      // conservation: every arrival incremented exactly one counter
      assert(last.counts.sum === n)
      // per-item certificate: count - err <= true <= count
      last.items.indices.foreach { i =>
        val t = exact.getOrElse(last.items(i), 0L)
        assert(t <= last.counts(i),
          s"item ${last.items(i)}: true $t > count ${last.counts(i)}")
        assert(last.counts(i) - last.errs(i) <= t,
          s"item ${last.items(i)}: lower bound broken")
      }
      // every err bounded by N/k, and no item with true > N/k is lost
      assert(last.errs.forall(_ <= n / k))
      val mustTrack = exact.collect { case (it, c) if c > n / k => it }
      val tracked = last.items.toSet
      mustTrack.foreach(it =>
        assert(tracked(it), s"heavy item $it (true ${exact(it)}) lost"))
      // a guaranteed-heavy readout (count - err > t) never lies:
      // every item it certifies above t = n/k truly exceeds it
      last.items.indices
        .filter(i => last.counts(i) - last.errs(i) > n / k)
        .foreach { i =>
          assert(exact(last.items(i)) > n / k,
            s"certificate lied for item ${last.items(i)}")
        }
      // emitted table is sorted (count desc, item asc)
      val pairs = last.counts.zip(last.items)
      assert(pairs === pairs.sortBy(p => (-p._1, p._2)))
    } finally q.stop()
  }
}
