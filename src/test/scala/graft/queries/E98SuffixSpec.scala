package graft.queries

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The e98 suffix-count filter must be LOSSLESS: a bound that ever
  * undercuts the true overlap would silently drop real pairs. Two
  * pins: (1) the registered query's output is byte-identical to a
  * positional-only rerun on real data; (2) the bound dominates the
  * true overlap on randomized adversarial set pairs.
  */
class E98SuffixSpec extends SparkSpecBase {

  test("suffix-count bound dominates true overlap on random set pairs") {
    // Mirror e98's machinery driver-side: global order by (df, h),
    // per-doc ranks, prefix p = sz − ⌈3sz/5⌉ + 1, S = shared tokens
    // inside BOTH prefixes, bound = |S| + min(sz_a − max_ra,
    // sz_b − max_rb). For every random pair the bound must be ≥ the
    // exact overlap — including heavy-overlap, disjoint, contained,
    // and size-skewed shapes.
    val rnd = new Random(42)
    for (trial <- 1 to 500) {
      val universe = (1L to 60L).toVector
      val sa = 3 + rnd.nextInt(20)
      val sb = 3 + rnd.nextInt(20)
      // bias some trials toward heavy overlap, some toward disjoint
      val a = rnd.shuffle(universe).take(sa).toSet
      val b =
        if (trial % 3 == 0) rnd.shuffle(a.toVector).take(sb).toSet
        else rnd.shuffle(universe).take(sb).toSet
      val df = (a.toSeq ++ b.toSeq).groupBy(identity).map {
        case (h, xs) => h -> xs.size
      }
      def ranked(s: Set[Long]): Seq[(Long, Int)] =
        s.toSeq.sortBy(h => (df(h), h)).zipWithIndex
          .map { case (h, i) => (h, i + 1) }
      def prefixLen(sz: Int): Int = sz - (3 * sz + 4) / 5 + 1
      val ra = ranked(a).toMap
      val rb = ranked(b).toMap
      val prefA = ra.filter(_._2 <= prefixLen(a.size)).keySet
      val prefB = rb.filter(_._2 <= prefixLen(b.size)).keySet
      val s = prefA intersect prefB
      val overlap = (a intersect b).size
      if (s.nonEmpty) {
        val cp = s.size
        val mra = s.map(ra).max
        val mrb = s.map(rb).max
        val bound = cp + math.min(a.size - mra, b.size - mrb)
        assert(bound >= overlap,
          s"trial $trial: bound $bound < overlap $overlap (a=$a b=$b)")
      } else {
        // no shared prefix token ⇒ the AllPairs theorem says the pair
        // cannot reach J ≥ 3/5 — re-check the theorem's premise here
        assert(5 * overlap < 3 * (a.size + b.size - overlap),
          s"trial $trial: prefix filter would LOSE a qualifying pair")
      }
    }
  }

  test("e98 output is byte-identical with the suffix-count filter on") {
    // positional-only rerun (the pre-round-10 pipeline) vs the
    // registered query — same rows, same order, both SFs' worth of
    // shapes at the dev scale.
    val dir = "/root/testdata/sf0.001"
    val full = AnalysisQueries.all.find(_.name == "e98_prefix_join").get
      .run(spark, dir).collect().toSeq
    // independent verification-from-scratch: all pairs of docs with
    // J >= 3/5 over distinct shingle sets, brute force
    val sets = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_sort(graft.functions.F.shingle_hashes(col("text"))).as("ts"))
      .filter(size(col("ts")) > 0)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    val brute = (for {
      (da, ta) <- sets; (db, tb) <- sets if da < db
      ov = (ta intersect tb).size.toLong
      if 5 * ov >= 3 * (ta.size + tb.size - ov)
    } yield (da, db, ov, ta.size.toLong, tb.size.toLong,
      10000 * ov / (ta.size + tb.size - ov))).sortBy(t => (t._1, t._2))
    val got = full.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2)) // row order is the oracle's to impose
    assert(got === brute.toSeq)
  }
}
