package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Pins the branches of [[QualityPropagate]] and [[MadOutliers]] that
  * the fixed synthetic corpus cannot reach (see e105/e106 scaladoc in
  * AnalysisQueries: faithful duplicates → no lift; near-uniform lengths
  * → no MAD outlier), on constructed inputs where they MUST fire.
  */
class PropagationStatsSpec extends SparkSpecBase {

  private def scoresDf(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "bp")
  }

  private def edgesDf(rows: (Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst")
  }

  test("propagate lifts a borderline doc from a high-quality neighbor," +
    " decaying per hop") {
    // chain 1 -- 2 -- 3 (undirected), scores 9000 / 1000 / 1000:
    // round 1 lifts 2 to 9000-1500; round 2 lifts 3 via 2's NEW score
    // (two hops = two decays). 1 keeps its own higher score.
    val edges = edgesDf((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val out = QualityPropagate
      .propagate(edges, scoresDf((1L, 9000L), (2L, 1000L), (3L, 1000L)),
        rounds = 2, decayBp = 1500)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 9000L, 2L -> 7500L, 3L -> 6000L))
  }

  test("propagate: isolated node unchanged; negative decayed neighbor" +
    " never wins; rounds=0 is identity") {
    val edges = edgesDf((1L, 2L))
    val base = scoresDf((1L, 500L), (2L, 3000L), (4L, 42L))
    val out = QualityPropagate.propagate(edges, base, 1, 1500)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2's only neighbor decays to 500-1500 < 0 → coalesce floor keeps
    // 2 at its own score; 4 has no edges at all.
    assert(out === Map(1L -> 500L, 2L -> 3000L, 4L -> 42L))
    val id = QualityPropagate.propagate(edges, base, 0, 1500)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(id === Map(1L -> 500L, 2L -> 3000L, 4L -> 42L))
  }

  test("MAD flags a genuine outlier and computes the scaled integers") {
    import spark.implicits._
    // 9 clustered values + one far point: med=12, MAD=1 → z(100)=59.4σ
    val vals = Seq(10L, 11L, 11L, 12L, 12L, 12L, 13L, 13L, 14L, 100L)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }
      .toDF("source", "doc_id", "n_chars")
    val out = MadOutliers.flags(df, "source", "n_chars")
    assert(out.filter(col("is_outlier") === 1).count() === 1L)
    val row = out.filter(col("n_chars") === 100).head()
    // med2 = 2*12, mad4 = 4*1 (medians land on integers here)
    assert(row.getAs[Long]("med2") === 24L)
    assert(row.getAs[Long]("mad4") === 4L)
    // z_bp = 13490*|200-24| div 4 = 593560 (59.356 sigma in bp)
    assert(row.getAs[Long]("z_bp") === 593560L)
    // a clustered member stays unflagged with small z
    val in = out.filter(col("n_chars") === 12).head()
    assert(in.getAs[Int]("is_outlier") === 0)
  }

  test("MAD: zero-MAD group reports NULL z and flags nothing;" +
    " half-integer medians stay exact") {
    import spark.implicits._
    // group a: >half identical → MAD=0. group b: even count with .5
    // median (values 10,11,20,41 → med=15.5, MAD=5; both half-integer
    // medians carried exactly via the med2/mad4 doubling).
    val df = Seq(
      ("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L), ("a", 4L, 9L),
      ("b", 5L, 10L), ("b", 6L, 11L), ("b", 7L, 20L), ("b", 8L, 41L))
      .toDF("source", "doc_id", "n_chars")
    val out = MadOutliers.flags(df, "source", "n_chars")
    val aRows = out.filter(col("source") === "a").collect()
    assert(aRows.forall(_.isNullAt(out.columns.indexOf("z_bp"))))
    assert(aRows.forall(_.getAs[Int]("is_outlier") === 0))
    val b = out.filter(col("source") === "b" && col("doc_id") === 8).head()
    assert(b.getAs[Long]("med2") === 31L) // 2 * 15.5
    assert(b.getAs[Long]("mad4") === 20L) // 4 * 5
    // z_bp = 13490*|82-31| div 20 = 34399 → 3.44σ: just UNDER the 3.5
    // rule — the flag boundary is exercised from below
    assert(b.getAs[Long]("z_bp") === 34399L)
    assert(b.getAs[Int]("is_outlier") === 0)
  }
}
