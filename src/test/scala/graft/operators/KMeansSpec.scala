package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Lloyd's k-means recovers well-separated synthetic blobs: centroids
  * land within a small tolerance of the true centers and assignment is
  * pure, regardless of partitioning.
  */
class KMeansSpec extends SparkSpecBase {

  private val dims = 8

  // three blobs at distance ~10 with +-0.5 deterministic jitter
  private def blob(center: Double, n: Int, base: Long) =
    (0 until n).map { i =>
      val jitter = (d: Int) => ((i * 31 + d * 17) % 100) / 100.0 - 0.5
      (base + i, Array.tabulate(dims)(d => center + jitter(d)))
    }

  test("recovers three separated blobs with pure assignment") {
    import spark.implicits._
    val pts = (blob(0.0, 200, 0) ++ blob(10.0, 150, 1000) ++
      blob(20.0, 250, 2000))
    // ids 0..199 all lie in blob 0 — a lowest-ids init would strand all
    // seeds there; the farthest-point init must spread across blobs
    val df = pts.toDF("id", "v").repartition(7)
    val centroids = KMeans.fit(df, "id", "v", dims, k = 3, iters = 8)

    val centers = Seq(0.0, 10.0, 20.0)
    // each true center must be hit by exactly one centroid (within 0.6:
    // jitter mean is 0 with range 1, so converged centroids sit well
    // inside; 0.6 also proves no centroid stranded between blobs)
    val matched = centers.map { c =>
      centroids.count(ct => ct.forall(x => math.abs(x - c) < 0.6))
    }
    assert(matched === Seq(1, 1, 1), centroids.map(_.take(2).mkString(",")))

    // assignment purity: every point lands with its blob's centroid
    val assigned = KMeans.assign(
      df.select(col("id"), col("v").cast("array<double>").as("v")),
      centroids)
      .select(col("id"), col("cluster")).as[(Long, Int)].collect()
    val byBlob = assigned.groupBy(_._1 / 1000)
    assert(byBlob.forall { case (_, rows) =>
      rows.map(_._2).distinct.length == 1
    })
  }

  test("init requires k points and empty clusters keep their centroid") {
    import spark.implicits._
    val two = Seq((1L, Array.fill(dims)(0.0)), (2L, Array.fill(dims)(9.0)))
      .toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      KMeans.fit(two, "id", "v", dims, k = 5, iters = 1)
    }
    assert(e.getMessage.contains("at least 5"))
    // k rows but < k DISTINCT vectors must also be rejected: duplicate
    // points would silently seed duplicate centroids (all remaining
    // farthest distances are 0) and leave permanently empty clusters
    val dup = Seq(
      (1L, Array.fill(dims)(0.0)), (2L, Array.fill(dims)(9.0)),
      (3L, Array.fill(dims)(0.0)), (4L, Array.fill(dims)(9.0)))
      .toDF("id", "v")
    val e2 = intercept[IllegalArgumentException] {
      KMeans.fit(dup, "id", "v", dims, k = 3, iters = 1)
    }
    assert(e2.getMessage.contains("distinct"))
    // k=2 on 2 points: both centroids are the points themselves and
    // remain fixed across iterations
    val cts = KMeans.fit(two, "id", "v", dims, k = 2, iters = 3)
    assert(cts(0).forall(_ == 0.0) && cts(1).forall(_ == 9.0))
  }
}
