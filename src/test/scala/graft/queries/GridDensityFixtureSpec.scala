package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.Portable

/** Geometry pin for e151 (grid-density clustering) and e153 (embedding
  * generation drift) on CONSTRUCTED fixtures: the DuckDB oracle proves
  * engine-equality, not that the semantics read geometry correctly —
  * the real corpus is isotropic, so two-cluster separation, border
  * assignment, and off-the-noise-floor drift are never exercised
  * there. The JL planes are fixed public constants, so a 64-d vector
  * with ANY chosen 2-D projection is one 2×2 linear solve in the span
  * of the two weight vectors.
  */
class GridDensityFixtureSpec extends SparkSpecBase {

  /** Solve v = α·w48 + β·w49 so that (w48·v, w49·v)·scale = (px, py). */
  private def vectorFor(px: Double, py: Double): Array[Float] = {
    val scale = math.sqrt(3.0 / 2)
    val a = Array.tabulate(64)(d => Portable.hyperplaneWeight(48, d))
    val b = Array.tabulate(64)(d => Portable.hyperplaneWeight(49, d))
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (i, j) => i * j }.sum
    val (aa, ab, bb) = (dot(a, a), dot(a, b), dot(b, b))
    val (tx, ty) = (px / scale, py / scale)
    val det = aa * bb - ab * ab
    val alpha = (tx * bb - ty * ab) / det
    val beta = (ty * aa - tx * ab) / det
    Array.tabulate(64)(d => (alpha * a(d) + beta * b(d)).toFloat)
  }

  private def writeFixture(points: Seq[(Long, Array[Float], Int)])
      : String = {
    val dir = Files.createTempDirectory("graft-e151-fix").toString
    import spark.implicits._
    points.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("e151 separates two dense blobs, assigns the adjacent sparse " +
    "cell as border, and flags the isolated cell as noise") {
    // eps = 0.4, minPts = 5 (the query's constants). Blob A: 6 points
    // in cell (0,0); blob B: 6 points in distant cell (10,10); one
    // border point in cell (1,0) (adjacent to A, below minPts); one
    // isolated point in cell (5,5).
    val pts =
      (0 until 6).map(k => vectorFor(0.20 + 0.01 * k, 0.20)) ++
        (0 until 6).map(k => vectorFor(4.20 + 0.01 * k, 4.20)) ++
        Seq(vectorFor(0.60, 0.20), vectorFor(2.20, 2.20))
    val dir = writeFixture(pts.zipWithIndex.map { case (v, i) =>
      (i.toLong, v, 0)
    })
    val out = graft.SparkEntry.queries("e151_grid_density")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val noise = out.filter(_._1 == -1L)
    val clusters = out.filter(_._1 != -1L)
      .map { case (_, cells, core, border, bp) =>
        (cells, core, border, bp)
      }.sortBy(-_._2)
    assert(noise.toSeq === Seq((-1L, 1L, 0L, 1L, 714L)))
    // blob A carries its border point; blob B is pure core
    assert(clusters.toSeq === Seq(
      (1L, 6L, 1L, 5000L), (1L, 6L, 0L, 4285L)))
  }

  test("e153 reads a constructed coherent generation shift as drift " +
    "with coherence OFF the noise floor") {
    // gen split is (((vec_id % 1000003) * 2654435761) % 1000000007) % 2.
    // Pick ids per generation explicitly, give gen A tight copies of
    // one direction and gen B tight copies of a rotated one: coherence
    // ~ 100% (mean resultant length of near-identical unit vectors)
    // and drift_t ~ 1 - cos(angle between the directions).
    def genOf(id: Long): Long =
      (((id % 1000003L) * 2654435761L) % 1000000007L) % 2L
    val idsA = (0L until 400L).filter(genOf(_) == 0L).take(12)
    val idsB = (0L until 400L).filter(genOf(_) == 1L).take(12)
    val dirA = vectorFor(1.00, 0.00)
    val dirB = vectorFor(0.80, 0.60) // unit-projected, ~36.9° away
    def jitter(v: Array[Float], k: Int): Array[Float] =
      v.zipWithIndex.map { case (x, d) =>
        (x * (1.0f + 0.001f * ((k + d) % 3))).toFloat
      }
    val rows =
      idsA.zipWithIndex.map { case (id, k) => (id, jitter(dirA, k), 0) } ++
        idsB.zipWithIndex.map { case (id, k) => (id, jitter(dirB, k), 0) }
    val dir = writeFixture(rows)
    val out = graft.SparkEntry.queries("e153_embedding_drift")(spark, dir)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 12L && r.getLong(2) === 12L)
    val driftT = r.getLong(3)
    val (cohA, cohB) = (r.getLong(4), r.getLong(5))
    // near-identical per-generation vectors: coherence ≈ 10000 bp,
    // far above the real corpus's 1/√n floor (~1700–2700 bp) — the
    // column that certifies the drift angle below is MEANINGFUL
    assert(cohA > 9900L && cohB > 9900L)
    // regime pin, not a digit pin: the 2-D projection targets are not
    // isometric to the 64-d angle (the JL basis is non-orthogonal), so
    // the exact cosine differs from cos(36.9°) — what must hold is a
    // real intermediate angle: clearly off 0 (identical generations)
    // and clearly below ~10000 (the uncorrelated-noise reading the
    // isotropic corpus shows)
    assert(driftT > 1000L && driftT < 5000L)
  }
}
