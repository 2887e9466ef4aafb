package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpecBase

/** JSONL source contract: declared schema (no inference pass), tolerant
  * reader (extra fields ignored, missing fields NULL), corrupt lines
  * quarantined as data instead of killing the read.
  */
class JsonLinesSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("declared-schema read: tolerant fields, corrupt lines quarantined") {
    val dir = Files.createTempDirectory("graft_jsonl")
    val f = dir.resolve("part-000.jsonl")
    Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "alpha", "lang": "en"}""",
      """{"doc_id": 2, "text": "beta", "lang": "fr", "extra": "ignored"}""",
      """{"doc_id": 3, "text": "gamma"}""", // missing lang -> NULL
      """{"doc_id": 4, "text": "delta", "lang":""", // truncated line
      """not json at all"""))

    val df = JsonLines.read(spark, f.toString, schema)
    val (clean, corrupt) = JsonLines.partition(df)

    val rows = clean.orderBy("doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.map(_.getString(1)).toSeq === Seq("alpha", "beta", "gamma"))
    assert(rows(2).isNullAt(2)) // missing lang is NULL, not an error

    val bad = corrupt.select(JsonLines.CorruptCol).collect()
      .map(_.getString(0)).toSeq
    assert(bad.length === 2)
    assert(bad.exists(_.contains("delta")) && bad.contains("not json at all"))
    // schema is exactly the declared one + audit column; no inference
    assert(df.schema.fieldNames.toSeq ===
      Seq("doc_id", "text", "lang", JsonLines.CorruptCol))
  }
}
