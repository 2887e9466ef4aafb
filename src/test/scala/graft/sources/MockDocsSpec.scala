package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class MockDocsSpec extends SparkSpecBase {

  private def read(opts: (String, String)*): DataFrame = {
    val r = spark.read.format("graft-docs")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("generates the declared row count with unique ids and the " +
    "documents schema") {
    val df = read("rows" -> "500")
    assert(df.schema.fieldNames.toSeq ===
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(df.count() === 500L)
    assert(df.select("doc_id").distinct().count() === 500L)
  }

  test("output is partition-stable: 1 slice and 7 slices generate " +
    "identical rows") {
    def rows(parts: String) =
      read("rows" -> "300", "partitions" -> parts)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(rows("1").toSeq === rows("7").toSeq)
  }

  test("row values honor the generation contract: n_chars, word " +
    "bounds, lang/source domains") {
    val df = read("rows" -> "400", "minwords" -> "5", "maxwords" -> "9")
    val bad = df.filter(
      length(col("text")) =!= col("n_chars") ||
        size(split(col("text"), " ")) < 5 ||
        size(split(col("text"), " ")) > 9 ||
        !col("lang").isin(MockDocs.Langs: _*) ||
        !col("source").rlike("^src_[01][0-9]$"))
    assert(bad.count() === 0L)
  }

  test("column pruning reaches the scan: a metadata projection reads " +
    "a 2-column schema and never builds text") {
    val df = read("rows" -> "200").select("doc_id", "lang")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a BatchScanExec in the plan")
    assert(scans.head.scan.readSchema().fieldNames.toSeq ===
      Seq("doc_id", "lang"))
    assert(df.count() === 200L)
    // zero-column projection (count star) survives pruning too
    assert(read("rows" -> "123").count() === 123L)
  }

  test("doc_id range filters prune generation slices at plan time") {
    val base = read("rows" -> "1000", "partitions" -> "8")
    // only the first 125-row slice survives a doc_id < 100 bound
    val lo = base.filter(col("doc_id") < 100)
    assert(lo.rdd.getNumPartitions === 1)
    assert(lo.count() === 100L)
    // a closed interval spanning two slices plans exactly those two
    val mid = base.filter(col("doc_id") >= 200 && col("doc_id") <= 300)
    assert(mid.rdd.getNumPartitions === 2)
    assert(mid.count() === 101L)
    // point lookup plans one slice and returns the right row
    val pt = base.filter(col("doc_id") === 777).select("doc_id", "lang")
    assert(pt.rdd.getNumPartitions === 1)
    assert(pt.collect().map(_.getLong(0)).toSeq === Seq(777L))
    // contradictory bounds plan zero work
    assert(base.filter(col("doc_id") < 10 && col("doc_id") > 20)
      .rdd.getNumPartitions === 0)
    // pruned values match the unpruned generator output exactly
    val expect = base.collect().filter { r =>
      val id = r.getLong(0); id >= 200 && id <= 300
    }.map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(mid.collect().map(_.toSeq).sortBy(
      _.head.asInstanceOf[Long]).toSeq === expect.toSeq)
  }

  test("generation slices split the id range evenly across the " +
    "requested partitions") {
    val df = read("rows" -> "1000", "partitions" -> "8")
    val perPart = df
      .groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("lo"),
        max("doc_id").as("hi"))
      .collect()
    assert(perPart.length === 8)
    perPart.foreach { r =>
      val (n, lo, hi) = (r.getAs[Long]("n"), r.getAs[Long]("lo"),
        r.getAs[Long]("hi"))
      assert(n === 125L)
      assert(hi - lo === n - 1, "slice ids must be contiguous")
    }
  }
}
