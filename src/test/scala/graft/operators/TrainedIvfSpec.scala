package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.sources.Tables

/** End-to-end trained-codebook IVF on the real testdata embeddings:
  * train k-means, assign the corpus to inverted lists, search only the
  * nprobe nearest lists per query, and pin recall@k against the exact
  * brute-force neighbors — the e17 next-lever (trained codebook, same
  * assign/search plan) proven as a working composition, with the scan
  * fraction actually bounded by the probed lists.
  */
class TrainedIvfSpec extends SparkSpecBase {

  test("trained IVF search reaches high recall scanning few lists") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // the synthetic 64-dim embeddings are quasi-uniform — hard for
    // coarse IVF (no natural density to exploit), so a useful recall
    // needs over half the lists probed; measured: recall@3 = 0.90 at
    // nprobe=5/8 (62% scan) vs 0.64 at nprobe=3. On clustered corpora
    // the same machinery probes far fewer lists.
    val k = 8
    val nprobe = 5
    val topk = 3
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))

    val centroids = KMeans.fit(vecs, "id", "v", dims = 64, k = k, iters = 5)
    val assigned = KMeans.assign(vecs, centroids)
      .select(col("id"), col("v"), col("cluster")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))

    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // driver-side reference search over the collected 500 vectors: the
    // spec pins ALGORITHM quality (recall of probing nprobe lists), not
    // the distributed plan — e6/e17's oracle rows already pin that
    val byCluster = assigned.groupBy(_._3)
    var hits = 0; var total = 0; var scanned = 0L
    for ((qid, qv, _) <- assigned.take(60)) {
      val exact = assigned.filter(_._1 != qid)
        .sortBy(p => (dist2(qv, p._2), p._1)).take(topk).map(_._1).toSet
      val lists = centroids.zipWithIndex
        .sortBy { case (c, i) => (dist2(qv, c), i) }
        .take(nprobe).map(_._2).toSet
      val cand = lists.toSeq.flatMap(byCluster.getOrElse(_, Array.empty))
        .filter(_._1 != qid)
      scanned += cand.size
      val got = cand.sortBy(p => (dist2(qv, p._2), p._1))
        .take(topk).map(_._1).toSet
      hits += (exact intersect got).size
      total += topk
    }
    val recall = hits.toDouble / total
    assert(recall >= 0.8, s"recall@$topk = $recall")
    // probing 5 of 8 lists must actually bound the scan: under 70% of
    // the brute-force candidate count on average
    assert(scanned < 60L * assigned.length * 7 / 10,
      s"scanned $scanned of ${60L * assigned.length}")
  }
}
