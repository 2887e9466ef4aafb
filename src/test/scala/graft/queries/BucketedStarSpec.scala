package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.{SparkEntry, SparkSpecBase}

/** The bucketed-mart-star-join lever (SCALING.md "bucketing on the fct
  * join keys removes the fact-fact exchange") as a regression gate:
  * q42's fact-fact join must plan over the bucketed scans with ZERO
  * shuffle exchange anywhere in the plan (broadcast exchanges for the
  * part dim are allowed — that's the point of a broadcast), and its
  * result must be exactly q2's.
  */
class BucketedStarSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private lazy val session: SparkSession = {
    val s = spark.newSession()
    // static plan, as in PlanLintSpec: the shape Catalyst commits to
    // before runtime stats — bucketing must hold without AQE's help
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  test("q42 whole plan is shuffle-free at default config; matches q2") {
    // At test SF both dims fit the broadcast threshold, so with the
    // bucketed fact-fact edge there is NO shuffle exchange anywhere.
    val q42 = SparkEntry.queries("q42_bucketed_star")(session, dir)
    val shuffles = q42.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty,
      s"bucketed star join shuffled:\n${q42.queryExecution.executedPlan}")

    val q2 = SparkEntry.queries("q2_fct_star_join")(session, dir)
    assert(q42.count() === q2.count())
    assert(q42.exceptAll(q2).isEmpty && q2.exceptAll(q42).isEmpty,
      "bucketed variant must return exactly q2's rows")
  }

  test("fact-fact SMJ is exchange-free even with broadcast disabled") {
    // The 100 TB case: orders does NOT fit in memory, so the join can't
    // broadcast — bucketing alone must carry it. Both fact sides of the
    // orderkey SortMergeJoin read the bucketed layout directly, with
    // zero shuffle below the join.
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val q42 = SparkEntry.queries("q42_bucketed_star")(s, dir)
    val smjs = q42.queryExecution.executedPlan.collect {
      case j: SortMergeJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "l_orderkey")) =>
        j
    }
    assert(smjs.nonEmpty,
      s"no orderkey SortMergeJoin:\n${q42.queryExecution.executedPlan}")
    val factShuffles = smjs.head.collect { case e: ShuffleExchangeLike => e }
    assert(factShuffles.isEmpty,
      s"fact side shuffled below the bucketed join:\n${smjs.head}")
  }

  test("q50b: no shuffle below the rollup's partial aggregate;" +
    " matches q50") {
    // the fact-fact orderkey edge (q50's measured dominant cost) must
    // ride the bucketed layout with dims broadcast: the whole join
    // chain under the partial aggregate is exchange-free, leaving only
    // the rollup exchange + the 150-row output-ordering exchange above
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    val q50b = SparkEntry.queries("q50b_nation_volume_bucketed")(
      session, dir)
    val plan = q50b.queryExecution.executedPlan
    val partials = plan.collect {
      case a: HashAggregateExec
          if a.aggregateExpressions.exists(_.mode == Partial) => a
    }
    assert(partials.nonEmpty, s"no partial aggregate:\n$plan")
    val below = partials.last.collect { case e: ShuffleExchangeLike => e }
    assert(below.isEmpty,
      s"join chain shuffled below the partial aggregate:\n" +
        s"${partials.last}")
    assert(plan.collect { case e: ShuffleExchangeLike => e }.length <= 2,
      s"unexpected extra exchanges:\n$plan")
    val q50 = SparkEntry.queries("q50_nation_volume")(session, dir)
    assert(q50b.exceptAll(q50).isEmpty && q50.exceptAll(q50b).isEmpty,
      "bucketed variant must return exactly q50's rows")
  }

  test("q50b fact edge is exchange-free even with broadcast disabled") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val q50b = SparkEntry.queries("q50b_nation_volume_bucketed")(s, dir)
    val smjs = q50b.queryExecution.executedPlan.collect {
      case j: SortMergeJoinExec
          if j.leftKeys.exists(_.references.exists(_.name == "l_orderkey")) ||
            j.rightKeys.exists(_.references.exists(_.name == "o_orderkey")) =>
        j
    }
    assert(smjs.nonEmpty,
      s"no orderkey SortMergeJoin:\n${q50b.queryExecution.executedPlan}")
    val factShuffles = smjs.head.collect { case e: ShuffleExchangeLike => e }
    assert(factShuffles.isEmpty,
      s"fact side shuffled below the bucketed join:\n${smjs.head}")
  }

  test("bucketed tables are built once and reused on a second run") {
    // the marker-guard: a second construction must not rewrite the tables
    val before = session.table(
      session.catalog.listTables().collect()
        .map(_.name).filter(_.startsWith("graft_bkt_lineitem_")).head)
      .inputFiles.toSeq.sorted
    SparkEntry.queries("q42_bucketed_star")(session, dir).count()
    val after = session.table(
      session.catalog.listTables().collect()
        .map(_.name).filter(_.startsWith("graft_bkt_lineitem_")).head)
      .inputFiles.toSeq.sorted
    assert(after === before, "second run must reuse the bucketed layout")
  }
}
