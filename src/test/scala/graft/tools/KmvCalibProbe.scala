package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{sketches, F}

/** Dev probe for the e102 "sketch-only in production" claim: the
  * cross-source Jaccard overlap matrix from per-source KMV sketches at
  * k ∈ {16, 64, 256, 1024}, each calibrated against the exact answer —
  * error (mean/max bp over all populated pairs) AND cost (wall;
  * the exact side pays the corpus-wide (source, shingle)-distinct pair
  * shuffle, the sketch side one bounded aggregation). PROBE_DIR
  * convention as ProbeMain; results land in SCALING.md.
  *
  * The pairwise estimate from the pulled sketches replays e102's
  * estimator exactly (k'-smallest of the union, count present in
  * both, all integer) — driver-side over ≤ #sources·k longs.
  */
object KmvCalibProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/tmp/probe100x")

    def d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), explode(F.shingle_hashes(col("text"))).as("h"))
      .distinct()

    // exact side (timed): per-source cardinality + pairwise intersections
    val t0 = System.nanoTime()
    val per = d.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val iv = d.as("a")
      .join(d.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
      .agg(count(lit(1)).as("ix"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val exactT = (System.nanoTime() - t0) / 1e9
    val exact = iv.map { case ((a, b), ix) =>
      (a, b) -> (10000L * ix / (per(a) + per(b) - ix))
    }
    println(f"== exact pairwise  $exactT%6.2f s  pairs=${exact.size}")

    for (k <- Seq(16, 64, 256, 1024)) {
      val t1 = System.nanoTime()
      val sk = d.groupBy("source")
        .agg(sketches.kmv_sketch(col("h"), k).as("sk"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toVector)
        .toMap
      val dt = (System.nanoTime() - t1) / 1e9
      val errs = exact.toSeq.map { case ((a, b), je) =>
        val (ka, kb) = (sk(a), sk(b))
        val un = (ka ++ kb).distinct.sorted
        val kp = math.min(k, un.size)
        val thr = un(kp - 1)
        val m = ka.toSet.intersect(kb.toSet).count(_ <= thr).toLong
        math.abs(10000L * m / kp - je)
      }
      println(f"== kmv k=$k%-5d      $dt%6.2f s  mean_err=${
        errs.sum / errs.size}%d bp  max_err=${errs.max}%d bp")
    }
    spark.stop()
  }
}
