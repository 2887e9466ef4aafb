package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Engine pins for the HyperLogLog aggregate: register math vs a
  * driver-side reference, the merge/replay invariances that make HLL
  * the fleet cardinality sketch, and the estimate formula (raw +
  * linear-counting regime).
  */
class HllSpec extends SparkSpecBase {

  private val P = Portable.P

  /** Driver-side reference registers — independent re-derivation of
    * the HllAgg contract.
    */
  private def refRegs(values: Seq[Long]): Array[Long] = {
    val regs = new Array[Long](64)
    values.foreach { v =>
      val key = Math.floorMod(v, P)
      val x = (Portable.HllA * key + Portable.HllB) % P
      val h = (x * x % P) * x % P
      val j = (h % 64).toInt
      val w = h / 64
      val rho =
        if (w == 0L) Portable.HllMaxRho.toLong
        else java.lang.Long.numberOfTrailingZeros(w) + 1L
      if (rho > regs(j)) regs(j) = rho
    }
    regs
  }

  private def sketch(values: Seq[Long], parts: Int): Seq[Long] = {
    import spark.implicits._
    values.toDF("h").repartition(parts)
      .agg(graft.functions.sketches.hll_sketch(col("h")))
      .head().getSeq[Long](0)
  }

  test("registers match the driver reference; partitioning-independent") {
    val vs = (1L to 5000L).map(v => (v * 48271L) % P)
    val expect = refRegs(vs).toSeq
    assert(sketch(vs, 1) === expect)
    assert(sketch(vs, 13) === expect) // map-side max-merge invariance
  }

  test("duplicate insertion is a no-op (at-least-once replay safety)") {
    val vs = (1L to 500L).map(v => (v * 69621L) % P)
    assert(sketch(vs ++ vs ++ vs.take(100), 7) === sketch(vs, 3))
  }

  test("raw estimate is the defined integer formula and near the model error") {
    // a single HLL draw has sigma = 13 % — point assertions on one
    // population are coin flips, so the accuracy claim averages |err|
    // over 10 disjoint well-mixed populations (E|err| = 1040 bp under
    // the model; the bound leaves ~2.5x headroom), while the FORMULA
    // claim (integer division replay through the SQL fold) is exact
    // and asserted on every draw.
    val rnd = new scala.util.Random(42)
    val errs = (1 to 10).map { _ =>
      val n = 2000L
      val vs = Seq.fill(n.toInt)(math.abs(rnd.nextLong()) % P).distinct
      val regs = refRegs(vs)
      val s2 = regs.map(r => 1L << (25 - r.toInt)).sum
      val est = (709L * (1L << 37)) / (1000L * s2)
      // re-derive through the registered aggregate + SQL fold
      import spark.implicits._
      val got = vs.toDF("h")
        .agg(graft.functions.sketches.hll_sketch(col("h")).as("regs"))
        .selectExpr("aggregate(transform(regs, " +
          "r -> shiftleft(CAST(1 AS BIGINT), CAST(25 - r AS INT))), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x) AS s2")
        .selectExpr(s"${709L * (1L << 37)} div (1000 * s2) AS est")
        .head().getLong(0)
      assert(got === est)
      math.abs(est - vs.size) * 10000L / vs.size
    }
    assert(errs.sum / errs.size < 2600L, s"mean err: ${errs.sum / 10} bp")
  }

  test("rollup identity: registers(union) = elementwise max of group registers") {
    // the e137 contract, pinned directly: build per-source registers
    // on real shingles, max-merge them, compare against one aggregate
    // over the whole corpus
    import spark.implicits._
    val d = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("source"),
        explode(graft.functions.F.shingle_hashes(col("text"))).as("h"))
      .distinct()
    val perSource = d.groupBy("source")
      .agg(graft.functions.sketches.hll_sketch(col("h")).as("regs"))
      .as[(String, Seq[Long])].collect()
    val merged = perSource.map(_._2)
      .reduce((a, b) => a.zip(b).map { case (x, y) => math.max(x, y) })
    val direct = d
      .agg(graft.functions.sketches.hll_sketch(col("h")))
      .head().getSeq[Long](0)
    assert(merged === direct)
  }

  test("linear-counting regime engages and matches m*ln(m/V)") {
    // tiny cardinality: most registers stay 0 → LC regime
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(30)(math.abs(rnd.nextLong()) % P).distinct
    val regs = refRegs(vs)
    val vZero = regs.count(_ == 0L)
    assert(vZero > 0)
    val lc = 64d * math.log(64d / vZero)
    // the e134 emission convention: engaged iff raw est <= 160
    val s2 = regs.map(r => 1L << (25 - r.toInt)).sum
    val raw = (709L * (1L << 37)) / (1000L * s2)
    assert(raw <= 160L)
    val n = vs.size.toDouble
    // LC is far closer than raw at this range (the reason the branch
    // exists)
    assert(math.abs(lc - n) < math.abs(raw.toDouble - n))
    assert(math.abs(lc - n) / n < 0.25)
  }
}
