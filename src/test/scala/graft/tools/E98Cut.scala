package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.sources.Tables

/** Dev probe: candidate-count ladder for e98's filter stack at a given
  * SF — pairs sharing a prefix token, after the positional filter,
  * after the suffix-count filter, and final verified pairs. Prints one
  * line per stage; used to keep the docstring's measured numbers
  * honest.
  */
object E98Cut {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_sort(F.shingle_hashes(col("text"))).as("ts"))
      .filter(size(col("ts")) > 0)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("ts"),
        size(col("ts")).cast("long").as("sz"))
    val tok = sets
      .select(col("doc_id"), col("sz"), explode(col("ts")).as("h"))
      .repartition(col("h"))
    val df = tok.groupBy("h").agg(count(col("doc_id")).as("df"))
    val ranked = tok.join(df, "h")
      .withColumn("r", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
    val pre = ranked
      .filter(col("r") <= col("sz") - expr("(3 * sz + 4) div 5") + 1)
      .select(col("doc_id"), col("h"), col("r"), col("sz"))
      .repartition(col("h"))
    val agg = pre.as("a")
      .join(pre.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(min(col("a.r")).as("ra"), min(col("b.r")).as("rb"),
        max(col("a.r")).as("mra"), max(col("b.r")).as("mrb"),
        count(lit(1)).as("cp"),
        min(col("a.sz")).as("sa"), min(col("b.sz")).as("sb"))
      .localCheckpoint(true)
    val req = expr("(3 * (sa + sb) + 7) div 8")
    val pos = agg.filter(
      lit(1) + least(col("sa") - col("ra"), col("sb") - col("rb")) >= req)
    val suf = pos.filter(col("cp")
      + least(col("sa") - col("mra"), col("sb") - col("mrb")) >= req)
    println(s"prefix-shared pairs: ${agg.count()}")
    println(s"after positional:    ${pos.count()}")
    println(s"after suffix-count:  ${suf.count()}")
    val ov = size(array_intersect(col("sa2.ts"), col("sb2.ts"))).cast("long")
    val fin = suf.select("doc_a", "doc_b")
      .join(sets.as("sa2"), col("doc_a") === col("sa2.doc_id"))
      .join(sets.as("sb2"), col("doc_b") === col("sb2.doc_id"))
      .select(col("doc_a"), col("doc_b"), ov.as("ov"),
        col("sa2.sz").as("sz_a"), col("sb2.sz").as("sz_b"))
      .filter(lit(5) * col("ov") >=
        lit(3) * (col("sz_a") + col("sz_b") - col("ov")))
    println(s"verified pairs:      ${fin.count()}")
    spark.stop()
  }
}
