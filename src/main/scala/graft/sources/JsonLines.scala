package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (one JSON document per line) source — the interchange format
  * most LLM-corpus pipelines ship, read the scale-safe way:
  *
  *  - **Declared schema, never inference.** Schema inference reads the
  *    whole input once before the real job (a second 100 TB pass) and
  *    pins the schema to whatever the sample happened to contain.
  *    Callers pass the expected `StructType`; extra fields in the data
  *    are ignored, missing ones are NULL — the tolerant-reader contract
  *    an evolving corpus needs.
  *  - **Corrupt lines are data, not exceptions.** Malformed lines land
  *    with their raw text in the audit column and NULLs elsewhere, so
  *    one bad shard line can't kill a fleet-scale read and the pipeline
  *    can count / quarantine them. DROPMALFORMED would hide data loss
  *    silently; FAILFAST turns one byte of corruption into a dead job.
  *  - **Text scan + `from_json`, not the json file format.** Same
  *    splittable line-by-line parallelism and one pass, but the parse
  *    is an ordinary codegen'd expression: the json reader's internal
  *    corrupt column forbids plans that reference only it
  *    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
  *    exactly what a quarantine count does.
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** Read `path` with the declared `schema` plus the corrupt-record
    * audit column appended.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.text(path)
      .select(from_json(col("value"),
        schema.add(StructField(CorruptCol, StringType)),
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("j"))
      .select("j.*")

  /** Split a [[read]] result into (clean rows without the audit column,
    * corrupt rows — raw line in [[CorruptCol]], plus whatever fields did
    * parse). Both sides are filters over the same text scan.
    */
  def partition(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col(CorruptCol).isNull).drop(CorruptCol),
    df.filter(col(CorruptCol).isNotNull))
}
