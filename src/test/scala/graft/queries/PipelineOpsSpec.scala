package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.Tables

/** Engine-level pins for the pipeline-surface queries beyond what the
  * oracle value compare shows.
  */
class PipelineOpsSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("g4 schema union: name alignment, null-fill, no pre-agg shuffle") {
    val run = PipelineQueries.all.find(_.name == "g4_schema_union").get.run
    // the audit itself
    val audit = run(spark, dir).collect()
    assert(audit.map(_.getString(0)).toSeq === Seq("v1", "v2"))
    val byGen = audit.map(r => r.getString(0) -> r).toMap
    val total = Tables.documents(spark, dir).count()
    assert(byGen("v1").getLong(1) + byGen("v2").getLong(1) === total)
    // v1 lacks the added columns entirely -> every row null-filled
    assert(byGen("v1").getLong(2) === byGen("v1").getLong(1))
    assert(byGen("v1").getLong(3) === byGen("v1").getLong(1))
    // v2 carries real values -> nothing null-filled
    assert(byGen("v2").getLong(2) === 0L)
    assert(byGen("v2").getLong(3) === 0L)

    // unionByName aligns by NAME: a positional union of these branches
    // would misalign (v1 ends with gen where v2 has n_chars). Pin that
    // the aligned union puts v1's gen under `gen`, not under a
    // positionally-matching column.
    val docs = Tables.documents(spark, dir)
    val v1 = docs.filter(col("source") === "src0")
      .select(col("doc_id"), col("lang"), lit("v1").as("gen"))
    val v2 = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"), lit("v2").as("gen"))
    val u = v1.unionByName(v2, allowMissingColumns = true)
    assert(u.columns.toSeq === Seq("doc_id", "lang", "gen", "source",
      "n_chars"))
    val v1Rows = u.filter(col("gen") === "v1")
    assert(v1Rows.filter(col("source").isNotNull).count() === 0L)
    assert(v1Rows.count() === v1.count())
  }
}
