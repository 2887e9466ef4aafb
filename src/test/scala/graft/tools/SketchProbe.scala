package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{sketches, F}

/** Dev probe for the e60 scale claim: per-source distinct-shingle
  * cardinality via exact `count(DISTINCT …)` vs the bounded KMV sketch,
  * timed with the shuffle-byte census on the dup-heavy replicas
  * (`PROBE_DIR` = /tmp/probe10x | /tmp/probe100x — the ProbeMain
  * convention). The exact path must shuffle the (source, hash) distinct
  * set — cardinality of the data; the sketch path shuffles ≤ k longs per
  * partial aggregate per source. Results land in SCALING.md.
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/tmp/probe10x")

    val shuffleW = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })

    def ex = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), explode(F.shingle_hashes(col("text"))).as("h"))
    def exact: DataFrame =
      ex.groupBy("source").agg(countDistinct(col("h")).as("n_exact"))
    def kmv: DataFrame =
      ex.groupBy("source").agg(sketches.kmv_sketch(col("h"), 64).as("sk"))

    for ((name, mk) <- Seq[(String, () => DataFrame)](
        "exact_distinct" -> (() => exact), "kmv_sketch" -> (() => kmv))) {
      mk().queryExecution.toRdd.foreach(_ => ()) // warmup, same QE discipline
      Thread.sleep(500)
      val sw0 = shuffleW.get()
      val t0 = System.nanoTime()
      // toRdd, NOT count(): count() lets the optimizer prune the
      // aggregate expressions (both variants would degenerate to
      // DISTINCT source and measure only the scan)
      mk().queryExecution.toRdd.foreach(_ => ())
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val swMb = (shuffleW.get() - sw0) / 1e6
      println(f"== $name%-15s $dt%6.2f s  shuffleWrite=$swMb%.1f MB")
    }
    spark.stop()
  }
}
