package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Multipass exact selection: value-exact vs a driver-side sort on
  * constructed data (wide domain, heavy ties, negatives), the e150 ceil
  * rank convention, the logarithmic round bound, and the degenerate
  * single-value / empty-input edges.
  */
class MultipassQuantileSpec extends SparkSpecBase {

  private def exact(xs: Seq[Long], pBp: Long): Long = {
    val sorted = xs.sorted
    val k = (pBp * xs.size + 9999L) / 10000L
    sorted((k - 1).toInt)
  }

  test("exact on a wide-domain shuffled sequence, rounds logarithmic") {
    import spark.implicits._
    // deterministic pseudo-shuffle of 0, 7e6, 14e6, ... (span ~7e9)
    val vals = (0L until 1000L).map(i => (i * 7919L) % 1009L * 7000000L)
    val df = vals.toDF("x")
    val ps = Seq(100L, 5000L, 9000L, 9900L, 10000L)
    val (n, picks, rounds) =
      MultipassQuantile.select(df, "x", ps, buckets = 16L)
    assert(n == 1000L)
    picks.zip(ps).foreach { case ((p, k, v), pReq) =>
      assert(p == pReq)
      assert(k == (p * n + 9999L) / 10000L)
      assert(v == exact(vals, p), s"p=$p")
    }
    // span < 16^9, so narrowing needs at most ceil(log16(span)) + 1
    // rounds even with ceil-width slack
    assert(rounds <= 9, s"rounds=$rounds")
  }

  test("heavy ties: the rank value is unique even when witnesses tie") {
    import spark.implicits._
    val vals = Seq.fill(400)(5L) ++ Seq.fill(300)(-2L) ++ Seq.fill(300)(9L)
    val (n, picks, _) =
      MultipassQuantile.select(vals.toDF("x"), "x", Seq(5000L, 9900L))
    assert(n == 1000L)
    assert(picks.map(_._3) == Seq(exact(vals, 5000L), exact(vals, 9900L)))
  }

  test("all-equal input resolves with zero refinement rounds") {
    import spark.implicits._
    val (n, picks, rounds) = MultipassQuantile.select(
      Seq.fill(50)(42L).toDF("x"), "x", Seq(5000L))
    assert(n == 50L && rounds == 0)
    assert(picks == Seq((5000L, 25L, 42L)))
  }

  test("p=1bp and p=10000bp select min and max") {
    import spark.implicits._
    val vals = Seq(-100L, 0L, 3L, 7L, 1000000L)
    val (_, picks, _) =
      MultipassQuantile.select(vals.toDF("x"), "x", Seq(1L, 10000L))
    assert(picks.map(_._3) == Seq(-100L, 1000000L))
  }

  test("grouped: per-group exact, early-resolving group drops out") {
    import spark.implicits._
    // group "a": wide domain; group "b": all-equal (resolves round 0)
    val aVals = (0L until 500L).map(i => (i * 7919L) % 503L * 4000000L)
    val bVals = Seq.fill(200)(7L)
    val df = (aVals.map(("a", _)) ++ bVals.map(("b", _))).toDF("g", "x")
    val ps = Seq(5000L, 9900L)
    val (ns, picks, rounds) =
      MultipassQuantile.selectGrouped(df, "g", "x", ps, buckets = 16L)
    assert(ns == Map("a" -> 500L, "b" -> 200L))
    val expA = ps.map(p => ("a", p, (p * 500 + 9999L) / 10000L,
      exact(aVals, p)))
    val expB = ps.map(p => ("b", p, (p * 200 + 9999L) / 10000L, 7L))
    assert(picks == expA ++ expB)
    assert(rounds <= 9, s"rounds=$rounds")
  }

  test("grouped: single-row groups and negative values") {
    import spark.implicits._
    val df = Seq(("a", -5L), ("b", 100L), ("b", -100L)).toDF("g", "x")
    val (ns, picks, _) =
      MultipassQuantile.selectGrouped(df, "g", "x", Seq(5000L))
    assert(ns == Map("a" -> 1L, "b" -> 2L))
    assert(picks == Seq(("a", 5000L, 1L, -5L), ("b", 5000L, 1L, -100L)))
  }

  test("NULL values and NULL group keys are excluded at entry") {
    import spark.implicits._
    // NULL x must not count into n (it can never be located by any
    // refinement histogram); a NULL group key must not survive into
    // the when-ladder / groups.sorted path.
    val vals = Seq(Some(1L), None, Some(3L), Some(5L), None)
    val (n, picks, _) =
      MultipassQuantile.select(vals.toDF("x"), "x", Seq(5000L, 10000L))
    assert(n == 3L)
    assert(picks.map(_._3) == Seq(3L, 5L))

    val g = Seq((Some("a"), Some(1L)), (Some("a"), Some(9L)),
      (None, Some(100L)), (Some("b"), None), (Some("b"), Some(4L)))
      .toDF("g", "x")
    val (ns, gp, _) =
      MultipassQuantile.selectGrouped(g, "g", "x", Seq(10000L))
    assert(ns == Map("a" -> 2L, "b" -> 1L))
    assert(gp == Seq(("a", 10000L, 2L, 9L), ("b", 10000L, 1L, 4L)))
  }

  test("duplicate quantile targets are rejected (rank double-count)") {
    import spark.implicits._
    assertThrows[IllegalArgumentException](
      MultipassQuantile.select(
        Seq(1L, 2L).toDF("x"), "x", Seq(5000L, 5000L)))
    assertThrows[IllegalArgumentException](
      MultipassQuantile.selectGrouped(
        Seq(("a", 1L)).toDF("g", "x"), "g", "x", Seq(5000L, 5000L)))
  }

  test("empty input and bad targets fail loudly") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("x")
    assertThrows[IllegalArgumentException](
      MultipassQuantile.select(empty, "x", Seq(5000L)))
    assertThrows[IllegalArgumentException](
      MultipassQuantile.select(Seq(1L).toDF("x"), "x", Seq(0L)))
    assertThrows[IllegalArgumentException](
      MultipassQuantile.select(Seq(1L).toDF("x"), "x", Seq(10001L)))
    assertThrows[IllegalArgumentException](
      MultipassQuantile.select(Seq(1L).toDF("x"), "x", Seq.empty))
    assertThrows[IllegalArgumentException](
      MultipassQuantile.selectGrouped(
        Seq.empty[(String, Long)].toDF("g", "x"), "g", "x", Seq(5000L)))
  }
}
