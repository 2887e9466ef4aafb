package graft.operators

import graft.SparkSpecBase

/** Large-star/small-star components vs the label-propagation operator
  * and a driver-side union-find: the two distributed algorithms must
  * agree exactly (same unique fixpoint: node → component min), and the
  * star rewrite must converge within its O(log n) round bound on the
  * adversarial shapes — a long path (depth) and a dense clique (the
  * edge-set blowup case the rewrite exists to collapse).
  */
class StarComponentsSpec extends SparkSpecBase {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("agrees with union-find and ConnectedComponents on a mixed graph") {
    import spark.implicits._
    val edges = (0 until 400).map { i =>
      val blob = i % 3
      val a = blob * 1000L + (i * 7919) % 40
      val b = blob * 1000L + (i * 104729) % 40
      (a, b)
    } ++ Seq((5000L, 5001L), (6000L, 6000L))
    val df = edges.toDF("a", "b")
    val star = StarComponents.components(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    val label = ConnectedComponents.components(df, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(star === unionFind(edges.filter(e => e._1 != e._2)))
    assert(star === label)
    assert(!star.contains(6000L)) // self-loop-only node is not incident
  }

  test("path graph of 200 nodes converges within the log bound") {
    import spark.implicits._
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = StarComponents
      .components(chain.toDF("a", "b"), "a", "b", maxRounds = 14)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 200)
    assert(got.values.toSet === Set(0L))
  }

  test("dense clique collapses fast (the |E| ~ |V|^2 dedup-cluster case)") {
    import spark.implicits._
    // 40-node clique: 780 edges; the rewrite must converge in a
    // handful of rounds, not re-join the full edge set ~log(n) times.
    val nodes = (100L until 140L)
    val clique = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val got = StarComponents
      .components(clique.toSeq.toDF("a", "b"), "a", "b", maxRounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 40)
    assert(got.values.toSet === Set(100L))
  }

  test("NULL endpoints never connect; empty input yields empty output") {
    import spark.implicits._
    val edges = Seq(
      (Some(1L), Some(2L)),
      (Some(2L), None),
      (None, Some(9L)),
      (Option.empty[Long], Option.empty[Long]))
    val got = StarComponents
      .components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L))
    val empty = StarComponents.components(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(empty.count() === 0)
  }
}
