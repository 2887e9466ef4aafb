package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.sources.Tables

/** Scratch profiler for e28's sub-plans (dev only, not registered). */
object E28Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"## $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }

    val sh = Tables.documents(spark, dir)
      .filter(size(F.word_hashes(col("text"))) > 0)
      .select(col("doc_id"), F.sim_hash60(col("text")).as("sig"))
    time("warm sh.count")(sh.count())
    time("sh.count (scan+simhash60)")(sh.count())

    val kb0 = sh.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("band_id"))
      .withColumn("band_val", expr("shiftright(sig, band_id * 15) & 32767"))
    val cn = kb0.groupBy("band_id", "band_val")
      .agg(expr("(count(1) + 1999L) div 2000L").as("ns"))
    time("cn.count")(cn.count())
    val kb = kb0.join(cn, Seq("band_id", "band_val"))
      .withColumn("sub", pmod(col("doc_id"), col("ns")))
    time("kb.count")(kb.count())

    def selfJoin(k: DataFrame, withSub: Boolean) = {
      val cond0 = col("a.band_id") === col("b.band_id") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id")
      val cond = if (withSub) cond0 && col("a.sub") === col("b.sub") else cond0
      k.as("a").join(k.as("b"), cond)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).cast("long")
            .as("hamming"))
        .filter(col("hamming") <= 3).distinct()
    }
    time("r7 full (cn+sub+sort)")(
      selfJoin(kb, true).orderBy("doc_a", "doc_b").count())
    time("r7 full again")(
      selfJoin(kb, true).orderBy("doc_a", "doc_b").count())
    time("r6 shape (no cn/sub)")(
      selfJoin(kb0, false).orderBy("doc_a", "doc_b").count())
    time("r7 no final orderBy")(selfJoin(kb, true).count())
    if (sys.env.contains("PROBE_PLAN"))
      println(selfJoin(kb, true).queryExecution.executedPlan.toString.take(14000))
    spark.stop()
  }
}
