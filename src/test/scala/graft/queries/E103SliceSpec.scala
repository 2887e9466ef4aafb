package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** e103b (sampled-slice recall audit) must be e103 restricted to the
  * hash slice — same detectors, same truth rule — and its error bar
  * must actually cover the full audit.
  */
class E103SliceSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String) =
    AnalysisQueries.all.find(_.name == name).get.run(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r).toMap

  test("slice truth = full truth restricted to the slice; prefix recall exact") {
    val slice = rows("e103b_dedup_recall_slice")
    // driver-side: brute-force truth pairs, then apply the slice
    // predicate to both endpoints
    val sets = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_sort(graft.functions.F.shingle_hashes(col("text"))).as("ts"))
      .filter(size(col("ts")) > 0)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    def inSlice(id: Long): Boolean =
      ((id % 1000003L) * 2654435761L) % 1000000007L % 2L == 0L
    val truthAll = for {
      (da, ta) <- sets; (db, tb) <- sets if da < db
      ov = (ta intersect tb).size.toLong
      if 5 * ov >= 3 * (ta.size + tb.size - ov)
    } yield (da, db)
    val truthSlice = truthAll.filter(p => inSlice(p._1) && inSlice(p._2))
    slice.values.foreach { r =>
      assert(r.getLong(3) === truthSlice.size.toLong) // n_truth
    }
    // AllPairs theorem survives restriction to any document subset
    assert(slice("prefix").getLong(4) === 10000L)
    // slice candidates can never exceed the full audit's
    val full = rows("e103_dedup_recall")
    Seq("prefix", "lsh", "winnow").foreach { m =>
      assert(slice(m).getLong(1) <= full(m).getLong(1), m)
    }
  }

  test("full-audit recall sits inside the slice's +/-3 sigma band") {
    val slice = rows("e103b_dedup_recall_slice")
    val full = rows("e103_dedup_recall")
    Seq("prefix", "lsh", "winnow").foreach { m =>
      val r = slice(m)
      val (nHit, nTruth, recall, se) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6))
      // the emitted SE is the Agresti-Coull formula, re-derived here
      val rt = 10000L * (nHit + 1) / (nTruth + 2)
      val sx = rt * (10000L - rt) / (nTruth + 2)
      assert(se === math.sqrt(sx.toDouble).toLong, m)
      assert(math.abs(full(m).getLong(4) - recall) <= 3 * se,
        s"$m: full=${full(m).getLong(4)} slice=$recall se=$se")
    }
  }
}
