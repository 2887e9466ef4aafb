package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** e175 — the modularity ranking's "done" criteria beyond the oracle
  * rows: on the chained-clique fixture the LPA labeling must score
  * STRICTLY higher than the CC labeling (VERDICT r14 #8), and the CC
  * side must land exactly on the single-partition identity
  * (modularity numerator 0 when one label covers the whole graph) —
  * the property that makes the ranking a sign test.
  */
class E175Spec extends SparkSpecBase {

  test("LPA labels outrank CC labels on the bridged-clique fixture; " +
    "one-partition CC scores exactly zero") {
    val dir = "/root/testdata/sf0.001"
    val pairs = ExtensionQueries.regionCliqueSplit(spark, dir)._2
      .select(col("u").as("doc_a"), col("v").as("doc_b"))
      .localCheckpoint(true)
    val ccl = graft.operators.ConnectedComponents
      .components(pairs, "doc_a", "doc_b")
      .select(col("node"), col("comp").as("lbl"))
    val lpa = graft.operators.LabelPropagation
      .communities(pairs, "doc_a", "doc_b", rounds = 4)
      .select(col("node"), col("community").as("lbl"))
    def num(labels: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = ExtensionQueries.modularityRow("x", pairs, labels)
        .select("n_parts", "modularity_num").collect().head
      (r.getLong(0), r.getLong(1))
    }
    val (ccParts, ccNum) = num(ccl)
    val (lpaParts, lpaNum) = num(lpa)
    assert(ccParts === 1L, "fixture must be one reachability component")
    assert(ccNum === 0L,
      "single-partition modularity numerator must be exactly 0")
    assert(lpaParts === 5L, "five region communities expected")
    assert(lpaNum > ccNum,
      s"LPA ($lpaNum) must strictly outrank CC ($ccNum) on the " +
        "bridged cliques")
  }
}
