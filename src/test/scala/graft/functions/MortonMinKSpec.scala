package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Round-7 primitives: the Morton2 codegen'd bit interleave and the
  * bounded MinK aggregate.
  */
class MortonMinKSpec extends SparkSpecBase {

  test("morton2 interleaves bits (known values + ordering property)") {
    // 16 bits: morton2(x=0b11, y=0b01) = x bits at even, y at odd
    // positions: z = (1<<0)|(1<<2) | (1<<1) = 0b111 = 7
    assert(TextHash.morton2(3L, 1L, 16) === 7L)
    assert(TextHash.morton2(0L, 0L, 16) === 0L)
    // full-width single coordinate: x = 2^16-1 → even bits set
    assert(TextHash.morton2(65535L, 0L, 16) === 0x55555555L)
    // locality: points in the same 16x16 block share z div 256 (8-bit)
    for (x <- 0 until 32; y <- 0 until 32) {
      val z = TextHash.morton2(x.toLong, y.toLong, 8)
      assert(z >= 0 && z < 65536)
      assert(z / 256 === TextHash.morton2((x / 16).toLong, (y / 16).toLong, 8))
    }
  }

  test("morton2 column API matches the Scala impl and runs in codegen") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i % 17, i % 13)).toDF("x", "y")
    val got = df.select(F.morton2(col("x"), col("y"), 16).as("z"))
      .collect().map(_.getLong(0))
    val want = (0L until 100L).map(i => TextHash.morton2(i % 17, i % 13, 16))
    assert(got.toSeq === want)
    // and via SQL registration
    df.createOrReplaceTempView("mz_in")
    val sqlGot = spark.sql("SELECT morton2(x, y) AS z FROM mz_in")
      .collect().map(_.getLong(0))
    assert(sqlGot.toSeq === want)
    // 3-arg SQL form honors the bits parameter (same as the Scala API,
    // not silently the 16-bit default) — coordinates ≥ 2^8 so an 8-bit
    // interleave actually truncates and differs from the 16-bit one
    val wide = (0L until 100L).map(i => (i * 37 % 1000, i * 53 % 1000))
      .toDF("x", "y")
    wide.createOrReplaceTempView("mz_wide")
    val sql8 = spark.sql("SELECT morton2(x, y, 8) AS z FROM mz_wide")
      .collect().map(_.getLong(0))
    val want8 = (0L until 100L).map(i =>
      TextHash.morton2(i * 37 % 1000, i * 53 % 1000, 8))
    val want16 = (0L until 100L).map(i =>
      TextHash.morton2(i * 37 % 1000, i * 53 % 1000, 16))
    assert(want8 !== want16) // the parameter is load-bearing on this data
    assert(sql8.toSeq === want8)
    // wrong arity / non-literal bits fail loudly instead of being ignored
    intercept[Exception] {
      spark.sql("SELECT morton2(x, y, 8, 1) FROM mz_in").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT morton2(x, y, x) FROM mz_in").collect()
    }
  }

  test("min_k returns the k smallest, sorted, across partition merges") {
    import spark.implicits._
    val vals = scala.util.Random.shuffle((1L to 500L).toList)
    val df = vals.toDF("v").repartition(11)
    val got = df.agg(sketches.min_k(col("v"), 8)).head().getSeq[Long](0)
    assert(got.toSeq === (1L to 8L))
    // group smaller than k → all values, ascending
    val small = df.filter(col("v") <= 3).agg(sketches.min_k(col("v"), 8))
      .head().getSeq[Long](0)
    assert(small.toSeq === (1L to 3L))
    // nulls ignored
    val withNulls = Seq[java.lang.Long](5L, null, 1L, null, 9L)
      .toDF("v").repartition(3)
    assert(withNulls.agg(sketches.min_k(col("v"), 2)).head()
      .getSeq[Long](0).toSeq === Seq(1L, 5L))
  }

  test("kmv_sketch is duplicate-insensitive min-k across merges; " +
    "estimator within KMV error bounds") {
    import spark.implicits._
    // Each value appears 7 times across 11 partitions: a KMV sketch must
    // collapse duplicates (min_k would fill with 7 copies of 1).
    val dup = scala.util.Random.shuffle(
      (1L to 500L).flatMap(v => Seq.fill(7)(v)).toList)
    val df = dup.toDF("v").repartition(11)
    val got = df.agg(sketches.kmv_sketch(col("v"), 8)).head().getSeq[Long](0)
    assert(got.toSeq === (1L to 8L))
    // fewer than k distinct values → the sketch IS the distinct set
    val small = df.filter(col("v") <= 3).agg(sketches.kmv_sketch(col("v"), 8))
      .head().getSeq[Long](0)
    assert(small.toSeq === (1L to 3L))
    // nulls ignored, duplicates collapsed
    val withNulls = Seq[java.lang.Long](5L, null, 1L, 5L, null, 1L, 9L)
      .toDF("v").repartition(3)
    assert(withNulls.agg(sketches.kmv_sketch(col("v"), 2)).head()
      .getSeq[Long](0).toSeq === Seq(1L, 5L))
    // estimator: 10k distinct keys hashed into [0, P) via the portable
    // affine family; (k-1)*P/h_k within 4 relative standard errors
    // (1/sqrt(k-2)) of the true cardinality — deterministic given the
    // fixed hash, so this is a regression pin, not a flaky bound.
    val p = Portable.P
    // multiplier > P so products wrap the modulus many times over and
    // the hash actually spreads across [0, P) (48271 would not: its
    // largest product stays below P, bunching all hashes in the low
    // half and biasing the estimator 2x)
    val hashed = (1L to 10000L).map(v => (v * 2654435761L) % p).toDF("h")
      .repartition(13)
    val k = 64
    val sk = hashed.agg(sketches.kmv_sketch(col("h"), k))
      .head().getSeq[Long](0)
    assert(sk.length === k)
    val est = (k - 1).toLong * p / sk.last
    val rse = 1.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - 10000.0) / 10000.0 < 4 * rse,
      s"KMV estimate $est too far from 10000")
  }

  test("kmv_sketch is callable from SQL via GraftExtensions") {
    import spark.implicits._
    (1L to 100L).flatMap(v => Seq(v, v)).toDF("v")
      .createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT kmv_sketch(v, 5) AS sk FROM kmv_in")
      .head().getSeq[Long](0)
    assert(got.toSeq === (1L to 5L))
    intercept[Exception] {
      spark.sql("SELECT kmv_sketch(v, v) FROM kmv_in").collect()
    }
  }
}
