package graft.queries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.streaming.StreamIvfProbe

/** Online ANN serving over the persisted IVF index (VERDICT r15 #4):
  *
  *  1. stream top-k ≡ e64's batch probe for the same queries (the
  *     handoff contract — one index, one assignment arithmetic, two
  *     runtimes), on BOTH state-store providers;
  *  2. the serve (foreachBatch) deployment's inner plan is partition-
  *     PRUNED (`PartitionFilters` + a dynamicpruning subquery on
  *     `list_id`, the LayoutSpec convention — never inputFiles) and
  *     emits the same answers — pruning cannot fire in the declarative
  *     stream (a streaming filter side cannot feed a pruning
  *     subquery), which is exactly why serve exists;
  *  3. nprobe = #cells recovers the EXACT top-k (brute-forced
  *     locally) — the recall-completeness end of the nprobe dial,
  *     pinning that the fan-out misses nothing when asked not to.
  *
  * Lives in graft.queries because the index path and the batch
  * reference are e64's (ivfIndexPath) — probing a re-derived index
  * would let the serving path drift off the maintained artifact.
  */
class StreamIvfProbeSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private val k = 3

  private def runStream(
      s: org.apache.spark.sql.SparkSession, name: String,
      queries: Seq[(Long, Seq[Double])], nprobe: Int)
      : Map[Long, Seq[(Long, Long)]] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val idx = s.read.parquet(ExtensionQueries.ivfIndexPath(s, dir))
    val cents = idx.filter(col("vec_id") % 67 === 3)
      .select(col("vec_id").as("cid"), col("emb").as("cemb"),
        col("nrm").as("cnrm"))
    val ms = MemoryStream[(Long, Seq[Double])]
    val out = StreamIvfProbe.topK(
      ms.toDF().toDF("query_id", "embedding"), idx, cents, k, nprobe)
    val q = out.writeStream
      .format("memory").queryName(name).outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      val (a, b) = queries.splitAt(queries.length / 2)
      ms.addData(a)
      q.processAllAvailable()
      ms.addData(b)
      q.processAllAvailable()
      val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
      assert(ops.map(_.numRowsTotal).sum === queries.length.toLong,
        s"state not bounded at one leaderboard per query on $name")
      s.table(name).select("key", "ids", "scores")
        .as[(String, Seq[Long], Seq[Long])].collect()
        .map { case (k0, ids, ss) => k0.toLong -> ids.zip(ss) }.toMap
    } finally q.stop()
  }

  test("stream IVF top-k ≡ e64 batch probe (pruned scan, both " +
    "providers); nprobe = #cells recovers exact top-k") {
    // e64's registered query builds (or amortizes) the index and is
    // the batch expectation for the same probe set
    val batch = graft.SparkEntry.queries("e64_ann_indexed")(spark, dir)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine") * 10000).cast("long").as("cos_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = batch.groupBy(_._1).map { case (q0, rows) =>
      q0 -> rows.map(r => (r._2, r._3)).toSeq
    }
    assert(expected.nonEmpty)

    val probes = spark.read
      .parquet(ExtensionQueries.ivfIndexPath(spark, dir))
      .filter(col("vec_id") % 97 === 5)
      .select(col("vec_id"), col("emb"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    assert(probes.length === expected.size)

    val gotMem = runStream(spark, "sip_mem", probes, nprobe = 1)
    assert(gotMem === expected,
      "stream probe (default provider) diverged from e64's batch top-k")

    // serve (foreachBatch) leg: same answers, PRUNED inner scan
    {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext =
        spark.sqlContext
      import spark.implicits._
      val ms = MemoryStream[(Long, Seq[Double])]
      val idx = spark.read
        .parquet(ExtensionQueries.ivfIndexPath(spark, dir))
      val cents = idx.filter(col("vec_id") % 67 === 3)
        .select(col("vec_id").as("cid"), col("emb").as("cemb"),
          col("nrm").as("cnrm"))
      val got = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)]
      val plans = scala.collection.mutable.ArrayBuffer.empty[String]
      val q = graft.streaming.StreamIvfProbe.serve(
          ms.toDF().toDF("query_id", "embedding"), idx, cents, k) {
          (df, _) =>
            got ++= df.collect().map(r =>
              (r.getLong(0), r.getLong(1), r.getLong(2)))
            plans += df.queryExecution.executedPlan.toString
        }
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try {
        ms.addData(probes)
        q.processAllAvailable()
      } finally q.stop()
      val servedMap = got.groupBy(_._1).map { case (q0, rows) =>
        q0 -> rows.map(r => (r._2, r._3))
          .sortBy(t => (-t._2, t._1)).toSeq
      }
      assert(servedMap === expected,
        "serve-mode top-k diverged from e64's batch probe")
      val plan = plans.filter(_.contains("Scan parquet")).mkString("\n")
      assert(plan.contains("PartitionFilters: [isnotnull(list_id") &&
        plan.contains("dynamicpruning"),
        "serve-mode index scan is not partition-pruned:\n" +
          plan.take(4000))
    }

    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val gotRocks = runStream(rocks, "sip_rocks", probes, nprobe = 1)
    assert(gotRocks === expected,
      "stream probe (RocksDB provider) diverged from e64's batch top-k")

    // recall-completeness: probing every cell is exact brute force
    val all = spark.read
      .parquet(ExtensionQueries.ivfIndexPath(spark, dir))
      .select(col("vec_id"), col("emb"), col("nrm"))
      .collect().map(r =>
        (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val nCells = all.count(_._1 % 67 == 3)
    def cosT(q0: (Long, Seq[Double]), c: (Long, Array[Double], Double))
        : Long = {
      val qa = q0._2.toArray
      val qn = math.sqrt(qa.map(x => x * x).sum)
      var d0 = 0.0
      var i = 0
      while (i < qa.length) { d0 += qa(i) * c._2(i); i += 1 }
      BigDecimal(d0 / (qn * c._3) * 10000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val exact = probes.map { p =>
      p._1 -> all.filter(_._1 != p._1)
        .map(c => (c._1, cosT(p, c)))
        .sortBy(t => (-t._2, t._1)).take(k).toSeq
    }.toMap
    val gotAll = runStream(spark, "sip_all", probes, nprobe = nCells)
    assert(gotAll === exact,
      "nprobe = #cells did not recover the exact top-k")
  }
}
