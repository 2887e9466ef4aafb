package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.F

/** Dev scratch: raw shingle-scan cost of a corpus dir. */
object ScanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_DIR", "/tmp/probe100x")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs: ${docs.count()}")
    val t0 = System.nanoTime()
    val n = docs
      .select(col("source"), explode(F.shingle_hashes(col("text"))).as("h"))
      .distinct().count()
    println(f"distinct (source,h): $n  in ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
