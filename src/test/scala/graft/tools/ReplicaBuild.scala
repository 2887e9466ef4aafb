package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Builds the dup-heavy replica corpora the SCALING.md probes run on
  * (dev only): sf0.1 documents replicated N× with DISTINCT doc_ids —
  * every source document becomes an exact-duplicate cluster of N, the
  * dense-cluster worst case for the dedup family. Usage:
  *
  *   sbt "Test/runMain graft.tools.ReplicaBuild 100 /tmp/probe100x"
  *
  * Ids are offset by replica (id + k·10⁹) so id-keyed operators see
  * distinct rows; values are byte-identical across replicas, which is
  * exactly what makes the corpus a worst case (every band/bucket/gram
  * collides N ways).
  */
object ReplicaBuild {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10
    val out = if (args.length > 1) args(1) else s"/tmp/probe${n}x"
    val src = sys.env.getOrElse("REPLICA_SRC", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val rep = docs
      .crossJoin(spark.range(n).select(col("id").as("__rep")))
      .withColumn("doc_id", col("doc_id") + col("__rep") * 1000000000L)
      .drop("__rep")
    rep.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")
    println(s"wrote ${n}x replica of $src/documents.parquet to $out " +
      s"(${spark.read.parquet(s"$out/documents.parquet").count()} rows)")
    spark.stop()
  }
}
