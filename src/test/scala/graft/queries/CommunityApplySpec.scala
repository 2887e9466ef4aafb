package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.operators.{ConnectedComponents, LabelPropagation}

/** e164's community-scoped survivor rule (VERDICT r12 #1): inside a
  * split component every LPA community keeps its own min-id survivor —
  * so an over-merged pair of templates keeps BOTH — while in a
  * non-split component the rule degenerates to exactly e45's
  * component-min behavior. Pinned on a constructed two-template graph,
  * on the always-split nation fixture (through the registered e164b
  * query), and on the real corpus through registered-query invariants.
  */
class CommunityApplySpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("two bridged templates: community rule keeps both minima, " +
    "CC rule would keep one") {
    import spark.implicits._
    // template A = clique {0..5}, template B = clique {10..15}, one
    // hybrid bridge 5-10 — the classic near-dup over-merge
    val cliqueA = for (i <- 0 until 6; j <- i + 1 until 6)
      yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 until 16; j <- i + 1 until 16)
      yield (i.toLong, j.toLong)
    val edges = (cliqueA ++ cliqueB :+ ((5L, 10L))).toDF("a", "b")
      .localCheckpoint(true)

    val comp = ConnectedComponents.components(edges, "a", "b")
    val comm = LabelPropagation.communities(edges, "a", "b", rounds = 4)
    // ONE reachability component — CC-grain apply keeps only node 0
    assert(comp.select("comp").distinct().as[Long].collect()
      .toSeq === Seq(0L))
    // community-scoped survivors: min per community = both template minima
    val survivors = comm.groupBy("community")
      .agg(min(col("node")).as("s"))
      .select("s").as[Long].collect().toSet
    assert(survivors === Set(0L, 10L),
      "each template must keep its own survivor")
  }

  test("e164b fixture rows: one survivor per region clique, all in one " +
    "component, all but the component-min community rescued") {
    val rows = graft.SparkEntry
      .queries("e164b_community_apply_regions")(spark, dir)
      .collect()
    assert(rows.length === 5, "five chained cliques → five communities")
    val ccComps = rows.map(_.getAs[Long]("cc_comp")).toSet
    assert(ccComps.size === 1, "the chain is ONE reachability component")
    val survivors = rows.map(_.getAs[Long]("survivor"))
    assert(survivors.distinct.length === 5)
    // exactly the community holding the component min is not rescued
    val rescued = rows.map(r =>
      r.getAs[Long]("survivor") -> r.getAs[Int]("rescued")).toMap
    assert(rescued(ccComps.head) === 0)
    assert(rescued.count(_._2 == 1) === 4,
      "four of five survivors exist only because of community scoping")
    // members partition the 25 nations
    assert(rows.map(_.getAs[Long]("n_members")).sum === 25L)
  }

  test("e164 on the corpus: yield identity holds per source, and the " +
    "pair-dominated corpus rescues nothing (e163's split=0 reading)") {
    val rows = graft.SparkEntry
      .queries("e164_community_dedup_apply")(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ex, nr, kept, resc) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_exact_dropped"), r.getAs[Long]("n_near_dropped"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_rescued"))
      assert(kept === n - ex - nr, s"yield identity broken: $r")
      assert(resc <= kept && resc >= 0L)
      assert(resc === 0L,
        s"pair-dominated corpus should rescue nothing, got $r")
    }
    // totals cover the whole corpus
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === graft.sources.Tables.documents(spark, dir).count())
  }
}
