package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Bloom bitmap aggregate + probe: zero false negatives (the property
  * the prefilter-then-verify contract rests on), measured FPP within
  * the (1 − e^{−kn/m})^k model, and partitioning-independence of the
  * built bitmap (OR-merge is associative/commutative).
  */
class BloomSpec extends SparkSpecBase {

  private val mBits = 1 << 14 // small filter so FPP is measurable
  private val kHashes = 4
  private val P = Portable.P

  // deterministic "inserted" and disjoint "absent" key sets in [0, P)
  private def keyOf(i: Long): Long = (i * 2654435761L) % P
  private val inserted = (0L until 2000L).map(keyOf)
  private val absent = (100000L until 110000L).map(keyOf)
    .filterNot(inserted.toSet)

  private def buildBitmap(partitions: Int): Array[Long] = {
    import spark.implicits._
    inserted.toDF("k").repartition(partitions)
      .agg(sketches.bloom_bitmap(col("k"), mBits, kHashes))
      .head.getSeq[Long](0).toArray
  }

  test("no false negatives, FPP within model, partition-independent") {
    import spark.implicits._
    val bm1 = buildBitmap(1)
    val bm7 = buildBitmap(7)
    assert(bm1.toSeq === bm7.toSeq) // OR-merge: same bitmap any plan

    val probe = sketches.might_contain(bm1, col("k"), mBits, kHashes)
    val fn = inserted.toDF("k").filter(!probe).count()
    assert(fn === 0L) // the exactness contract

    // model: n=2000, m=16384, k=4 → p = (1-e^{-kn/m})^4 ≈ 0.0235
    val fp = absent.toDF("k").filter(probe).count()
    val n = inserted.size.toDouble
    val model = math.pow(1 - math.exp(-kHashes * n / mBits), kHashes)
    val rate = fp.toDouble / absent.size
    assert(rate < model * 3,
      s"measured FPP $rate exceeds 3x model $model")
    assert(rate > 0, "a 2^14-bit filter at this load must show some FPs" +
      " (a zero here means the probe is not actually testing bits)")
  }

  test("driver-side probe agrees with the aggregate's bit layout") {
    import spark.implicits._
    // single key: exactly the k affine positions are set
    val bm = Seq(keyOf(1L)).toDF("k")
      .agg(sketches.bloom_bitmap(col("k"), mBits, kHashes))
      .head.getSeq[Long](0).toArray
    val expected = (0 until kHashes).map { i =>
      ((Portable.BloomA(i) * keyOf(1L) + Portable.BloomB(i)) % P %
        mBits).toInt
    }.toSet
    val setBits = (0 until mBits).filter(p => (bm(p >> 6) >> (p & 63) & 1L) == 1L)
    assert(setBits.toSet === expected)
  }

  test("out-of-domain (negative) keys degrade safely: no crash, no false " +
    "negative") {
    import spark.implicits._
    // The documented domain is [0, P); a contract violation must not
    // throw ArrayIndexOutOfBounds mid-job or probe different bits than
    // the build inserted. floorMod build + pmod probe keep the two
    // aligned, preserving the no-false-negative guarantee even here.
    val weird = Seq(-1L, -42L, Long.MinValue + 7, P + 5, Long.MaxValue - 3)
    val bm = weird.toDF("k")
      .agg(sketches.bloom_bitmap(col("k"), mBits, kHashes))
      .head.getSeq[Long](0).toArray
    val probe = sketches.might_contain(bm, col("k"), mBits, kHashes)
    assert(weird.toDF("k").filter(!probe).count() === 0L)
  }
}
