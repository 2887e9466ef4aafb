package graft.operators

import graft.SparkSpecBase

/** PageRank vs a driver-side reimplementation of the exact integer
  * recurrence, plus structural invariants: star-center dominance,
  * regular-graph uniformity, and partition-count independence (the
  * recurrence is all-integer, so results must be bit-identical however
  * the edge list is partitioned).
  */
class PageRankSpec extends SparkSpecBase {

  /** The exact integer recurrence, driver-side: rₖ(v) = 150000 +
    * Σ_{u~v} ⌊rₖ₋₁(u)·85 / (100·deg(u))⌋ on the symmetrized simple
    * graph, r₀ = 1e6.
    */
  private def oracle(
      edges: Seq[(Long, Long)], k: Int): Map[Long, (Long, Long)] = {
    val sym = edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, e.swap)).distinct
    val adj = sym.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val deg = adj.map { case (u, ns) => u -> ns.size.toLong }
    var r = deg.map { case (u, _) => u -> 1000000L }
    for (_ <- 1 to k) {
      val in = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) * 85 / (100 * deg(u)) }.sum
      }
      r = deg.map { case (u, _) => u -> (150000L + in.getOrElse(u, 0L)) }
    }
    r.map { case (u, rank) => u -> (deg(u), rank) }
  }

  private def run(edges: Seq[(Long, Long)], k: Int,
      parts: Int = 4): Map[Long, (Long, Long)] = {
    import spark.implicits._
    PageRank.ranks(edges.toDF("a", "b").repartition(parts), "a", "b", k)
      .as[(Long, Long, Long)].collect()
      .map { case (n, d, r) => n -> (d, r) }.toMap
  }

  test("matches the integer recurrence on a scrambled graph") {
    // multi-component: a hub blob, a chain, an isolated pair, noise
    val edges = (0 until 120).map { i =>
      ((i * 7919L) % 25, (i * 104729L) % 25)
    } ++ (100L until 110L).map(i => (i, i + 1)) ++
      Seq((500L, 501L), (600L, 600L)) // pair + pure self-loop
    val got = run(edges, k = 5)
    val expect = oracle(edges, k = 5)
    assert(got === expect)
    assert(!got.contains(600L)) // self-loop-only node absent
  }

  test("star center outranks every leaf") {
    val star = (1L to 30L).map(i => (0L, i))
    val got = run(star, k = 3)
    val center = got(0L)._2
    assert((1L to 30L).forall(i => got(i)._2 < center))
    assert(got(0L)._1 === 30L) // degree
  }

  test("regular graphs rank uniformly (cycle)") {
    val n = 24L
    val cycle = (0L until n).map(i => (i, (i + 1) % n))
    val got = run(cycle, k = 6)
    // every node deg 2, identical closed-form trajectory
    assert(got.values.map(_._2).toSet.size === 1)
    assert(got.values.forall(_._1 == 2L))
  }

  test("bit-identical across partition counts") {
    val edges = (0 until 200).map { i =>
      ((i * 31L) % 40, (i * 17L) % 40)
    }
    assert(run(edges, k = 4, parts = 1) === run(edges, k = 4, parts = 13))
  }
}
