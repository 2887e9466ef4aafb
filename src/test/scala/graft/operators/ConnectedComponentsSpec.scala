package graft.operators

import graft.SparkSpecBase

/** Connected components vs a driver-side union-find oracle, plus the
  * pointer-jumping guarantee: a long path graph must converge in
  * O(log diameter) rounds (it would blow the round cap if propagation
  * were one-hop-per-round).
  */
class ConnectedComponentsSpec extends SparkSpecBase {

  private def unionFind(
      edges: Seq[(Long, Long)]): Map[Long, Long] = {
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

  test("matches union-find on a scrambled multi-component graph") {
    import spark.implicits._
    // 3 deterministic pseudo-random blobs + isolated pairs + self-loops
    val edges = (0 until 400).map { i =>
      val blob = i % 3
      val a = blob * 1000L + (i * 7919) % 40
      val b = blob * 1000L + (i * 104729) % 40
      (a, b)
    } ++ Seq((5000L, 5001L), (6000L, 6000L)) // pair + pure self-loop
    val got = ConnectedComponents
      .components(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val expect = unionFind(edges.filter(e => e._1 != e._2))
    assert(got === expect)
    // the self-loop-only node is not incident to a real edge: absent
    assert(!got.contains(6000L))
  }

  test("path graph of 200 nodes converges within the jump bound") {
    import spark.implicits._
    val chain = (0L until 199L).map(i => (i, i + 1))
    // diameter 199; pointer jumping must converge in ~log2(199)+slack
    // rounds — maxRounds=12 would time out one-hop propagation (199
    // rounds needed) but passes path halving.
    val got = ConnectedComponents
      .components(chain.toDF("a", "b"), "a", "b", maxRounds = 12)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 200)
    assert(got.values.toSet === Set(0L))
  }

  test("NULL endpoints never connect; empty edges yield empty output") {
    import spark.implicits._
    val edges = Seq(
      (Some(1L), Some(2L)),
      (None: Option[Long], Some(3L)),
      (Some(4L), None: Option[Long])).toDF("a", "b")
    val got = ConnectedComponents.components(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L))
    val empty = ConnectedComponents.components(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(empty.count() === 0L)
  }

  test("non-convergence unpersists the cached edge list (no session leak)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val chain = (0L until 199L).map(i => (i, i + 1))
    // diameter 199 cannot converge in 2 rounds — the require must throw,
    // and the finally must still release the cached symmetric edge list
    intercept[IllegalArgumentException] {
      ConnectedComponents
        .components(chain.toDF("a", "b"), "a", "b", maxRounds = 2)
        .count()
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }
}
