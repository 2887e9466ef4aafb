package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Bucketed point-in-interval join: identical pairs to the naive
  * non-equi join (including [start, start+len) boundary behavior and
  * exactly-once matches across the bucket seam), with an equi-join plan.
  */
class RangeJoinSpec extends SparkSpecBase {

  test("pointInInterval equals the naive range join, each pair once") {
    import spark.implicits._
    val len = 100L
    // Interval starts hit bucket-aligned (k*100), seam-straddling, and
    // boundary-adjacent offsets; points sweep a denser lattice.
    val intervals = (0 until 200).map { i =>
      (i.toLong, ((i * 37) % 1000).toLong)
    }.toDF("i_id", "s")
    val points = (0 until 2000).map { i =>
      (i.toLong + 10000L, ((i * 13) % 1100).toLong)
    }.toDF("p_id", "t")

    val got = RangeJoin.pointInInterval(points, "t", intervals, "s", len)
      .select("i_id", "p_id").as[(Long, Long)].collect().sorted

    val pts = points.as[(Long, Long)].collect()
    val naive = intervals.as[(Long, Long)].collect().flatMap {
      case (iId, s) =>
        pts.collect { case (pId, t) if t >= s && t < s + len => (iId, pId) }
    }.sorted
    assert(got.toSeq === naive.toSeq)
    // duplicates would mean a pair matched through both seam buckets
    assert(got.distinct.length === got.length)
  }

  test("boundaries: start inclusive, end exclusive") {
    import spark.implicits._
    val intervals = Seq((1L, 100L)).toDF("i_id", "s")
    val points = Seq((1L, 99L), (2L, 100L), (3L, 199L), (4L, 200L))
      .toDF("p_id", "t")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "s", 100L)
      .select("p_id").as[Long].collect().sorted
    assert(got.toSeq === Seq(2L, 3L))
  }

  test("plan is an equi-join on the bucket key — no nested loop") {
    import spark.implicits._
    val intervals = Seq((1L, 100L)).toDF("i_id", "s")
    val points = Seq((1L, 100L)).toDF("p_id", "t")
    val plan = RangeJoin.pointInInterval(points, "t", intervals, "s", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("intervalOverlap equals the naive overlap join, each pair once — " +
    "touching endpoints, nesting, and spans far wider than the cell") {
    import spark.implicits._
    // seeded intervals: lengths from 0 (point intervals) to ~8 cells
    val rnd = new scala.util.Random(20260815L)
    val as = (0 until 150).map { i =>
      val st = rnd.nextInt(5000).toLong
      (i.toLong, st, st + rnd.nextInt(800).toLong)
    } :+ ((150L, 100L, 100L)) :+ ((151L, 0L, 4999L)) // point + full-span
    val bs = (0 until 150).map { i =>
      val st = rnd.nextInt(5000).toLong
      (i.toLong + 1000L, st, st + rnd.nextInt(200).toLong)
    } :+ ((1150L, 100L, 100L)) // touches a's point interval exactly
    val aDf = as.toDF("a_id", "a_st", "a_en")
    val bDf = bs.toDF("b_id", "b_st", "b_en")

    val got = RangeJoin
      .intervalOverlap(aDf, "a_st", "a_en", bDf, "b_st", "b_en", cell = 100L)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted

    val naive = (for {
      (aId, aSt, aEn) <- as
      (bId, bSt, bEn) <- bs
      if aSt <= bEn && bSt <= aEn
    } yield (aId, bId)).sorted
    assert(got.toSeq === naive)
    // the claim-cell rule must keep each pair exactly once, with no
    // DISTINCT in the plan to hide a miss
    assert(got.distinct.length === got.length)
    // the touching point-intervals (150, 1150) count as an overlap
    assert(got.contains((150L, 1150L)))
  }

  test("intervalOverlap plans as an equi-join on the grid cell") {
    import spark.implicits._
    val aDf = Seq((1L, 0L, 50L)).toDF("a_id", "a_st", "a_en")
    val bDf = Seq((2L, 25L, 75L)).toDF("b_id", "b_st", "b_en")
    val df = RangeJoin.intervalOverlap(
      aDf, "a_st", "a_en", bDf, "b_st", "b_en", cell = 100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(df.select("a_id", "b_id").as[(Long, Long)].collect().toSeq
      === Seq((1L, 2L)))
  }
}
