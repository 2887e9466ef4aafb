package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without an equi-key.
  *
  * A direct `p.pt >= i.start AND p.pt < i.end` join has no equality
  * conjunct, so Spark plans BroadcastNestedLoopJoin (or worse,
  * CartesianProduct): every point is tested against every interval —
  * O(P·I) comparisons and a driver-killing broadcast once the interval
  * set stops being tiny. This operator makes the join an EQUI-join by
  * discretizing time into buckets of exactly the interval length: an
  * interval [s, s+len) overlaps at most two buckets (floor(s/len) and
  * floor((s+len-1)/len)), so the build side is exploded to <= 2 rows
  * and joined on the bucket id, with the exact containment predicate
  * left as a cheap post-join residual. Both sides hash-shuffle on the
  * bucket key — fully parallel, AQE-broadcastable when the interval
  * side is small, and never a nested-loop. Each (interval, point) match
  * survives exactly once because a point owns exactly one bucket.
  *
  * Intervals longer than `len` would need ceil(span/len)+1 bucket rows;
  * this implementation fixes bucket width == interval length, the
  * common case for fixed-size windows (incident windows, watermark
  * lateness, attribution horizons).
  */
object RangeJoin {

  /** Inner-joins `points` to `intervals` where
    * `points(pt)` ∈ [`intervals(start)`, `intervals(start) + len`).
    * `pt` and `start` name LongType columns on the same scale (e.g.
    * epoch micros); column names must be disjoint across the inputs.
    * Compose left-outer semantics downstream (aggregate the pairs, then
    * left-join onto the interval set) — exploding the build side first
    * would duplicate null-extended rows.
    */
  def pointInInterval(
      points: DataFrame, pt: String,
      intervals: DataFrame, start: String, len: Long): DataFrame = {
    require(len > 0, s"interval length must be positive, got $len")
    val i2 = intervals.withColumn(
      "__bucket",
      explode(array_distinct(array(
        expr(s"$start div ${len}L"),
        expr(s"($start + ${len - 1}L) div ${len}L")))))
    val p2 = points.withColumn("__bucket", expr(s"$pt div ${len}L"))
    i2.join(p2, Seq("__bucket"))
      .where(col(pt) >= col(start) && col(pt) < col(start) + len)
      .drop("__bucket")
  }

  /** INTERVAL-overlap equi-join: pairs (a, b) whose CLOSED integer
    * intervals [aStart, aEnd] and [bStart, bEnd] intersect
    * (aStart <= bEnd AND bStart <= aEnd — point touches count). The
    * generalization [[pointInInterval]] can't express: BOTH sides are
    * intervals of varying length, so both sides explode to their
    * covering grid cells of width `cell` (ceil(span/cell)+1 rows per
    * interval) and join on the cell id.
    *
    * De-dup is the CLAIM-CELL rule, not a DISTINCT: an overlapping
    * pair co-occurs in every cell their spans share, but is KEPT only
    * in the one cell containing max(aStart, bStart) — the overlap's
    * left edge — which every overlapping pair has exactly once. That
    * makes dedup a per-row predicate instead of a pair-grain exchange
    * (the DISTINCT a naive grid join needs is a second shuffle of the
    * PAIR set, which at fleet scale dwarfs the join itself).
    *
    * `cell` trades fan-out (≈ span/cell + 1 copies per interval) against
    * bucket selectivity (a wide cell matches far-apart intervals that
    * the residual predicate then discards); set it near the typical
    * interval span. Column names must be disjoint across the inputs.
    * Compose left-outer semantics downstream, as with
    * [[pointInInterval]].
    */
  def intervalOverlap(
      a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      cell: Long): DataFrame = {
    require(cell > 0, s"cell width must be positive, got $cell")
    def cells(df: DataFrame, st: String, en: String): DataFrame =
      df.withColumn("__cell",
        explode(expr(s"sequence($st div ${cell}L, $en div ${cell}L)")))
    cells(a, aStart, aEnd).join(cells(b, bStart, bEnd), Seq("__cell"))
      .where(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd) &&
        col("__cell") === expr(s"greatest($aStart, $bStart) div ${cell}L"))
      .drop("__cell")
  }
}
