package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Deterministic synchronous LPA: round-for-round identical to a
  * driver-side replay of the (count DESC, label ASC, self-vote) rule,
  * splits a bridged pair of cliques that CC cannot, and the self-vote
  * kills the bipartite oscillation.
  */
class LabelPropagationSpec extends SparkSpecBase {

  /** Driver-side replay of exactly the operator's rule (incl. its
    * undirected-dedup contract: a repeated or reversed edge is ONE
    * edge, not a double vote).
    */
  private def replay(
      edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val nbr = edges
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var lbl = nbr.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lbl = nbr.map { case (n, ns) =>
        val votes = (lbl(n) +: ns.map(lbl))
          .groupBy(identity).map { case (l, o) => (l, o.size) }
        n -> votes.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lbl
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    LabelPropagation
      .communities(edges.toDF("a", "b"), "a", "b", rounds)
      .as[(Long, Long)].collect().toMap
  }

  test("bridged 6-cliques: one CC component, two LPA communities") {
    import spark.implicits._
    val cliqueA = for (i <- 0 until 6; j <- i + 1 until 6)
      yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 until 16; j <- i + 1 until 16)
      yield (i.toLong, j.toLong)
    val edges = cliqueA ++ cliqueB :+ ((5L, 10L))
    val got = run(edges, 4)
    assert(got === replay(edges, 4))
    // the bridge does NOT merge the communities...
    assert(got.filterKeys(_ < 6).values.toSet === Set(0L))
    assert(got.filterKeys(_ >= 10).values.toSet === Set(10L))
    // ...while reachability does merge the component
    val comps = ConnectedComponents
      .components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comps.values.toSet === Set(0L))
  }

  test("isolated pair converges to the min label in one round — the " +
    "self-vote kills the synchronous swap oscillation") {
    for (rounds <- Seq(1, 2, 5)) {
      val got = run(Seq((7L, 3L)), rounds)
      assert(got === Map(3L -> 3L, 7L -> 3L), s"rounds=$rounds")
    }
  }

  test("churn metering: per-round counts match the replay, and churn 0 " +
    "certifies a fixpoint (later rounds reproduce the labels)") {
    import spark.implicits._
    // two bridged 5-cliques — stabilizes in a couple of rounds, so a
    // rounds=8 run has a visible zero tail
    val cliqueA = for (i <- 0 until 5; j <- i + 1 until 5)
      yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 until 15; j <- i + 1 until 15)
      yield (i.toLong, j.toLong)
    val edges = cliqueA ++ cliqueB :+ ((4L, 10L))
    val (labels, churn) = LabelPropagation
      .communitiesWithChurn(edges.toDF("a", "b"), "a", "b", rounds = 8)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(churn.length === 8)
    // per-round churn replays exactly: diff consecutive replay states
    val perRound = (1 to 8).map { r =>
      val prev = replay(edges, r - 1)
      replay(edges, r).count { case (n, l) => prev(n) != l }.toLong
    }
    assert(churn === perRound)
    // fixpoint certificate: once churn hits 0 it stays 0, and the
    // final labels equal the labels at the first churn-0 round
    val firstZero = churn.indexOf(0L)
    assert(firstZero >= 0, s"no churn-0 round in $churn")
    assert(churn.drop(firstZero).forall(_ == 0L), s"churn=$churn")
    assert(got === replay(edges, firstZero), "labels moved after churn 0")
    // the plain overload agrees (no metering side effects on labels)
    assert(got === run(edges, 8))
  }

  test("matches the driver replay on a seeded random graph, and is " +
    "partition-count invariant") {
    val rnd = new scala.util.Random(20260815L)
    val edges = Seq.fill(120)(
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    assert(run(edges, 4) === replay(edges, 4))
    val s4 = spark.newSession()
    s4.conf.set("spark.sql.shuffle.partitions", "4")
    import s4.implicits._
    val got4 = LabelPropagation
      .communities(edges.toDF("a", "b"), "a", "b", 4)
      .as[(Long, Long)].collect().toMap
    assert(got4 === replay(edges, 4))
  }
}
