package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Misra-Gries guarantee: every key with true count > N/(k+1) MUST be
  * in the sketch output, across partial-aggregate merges (the data is
  * spread over many partitions so the merge path is exercised). The
  * sketch may contain extra light keys — that's the contract the
  * sketch-then-verify query (e29) builds on — but it may never MISS a
  * heavy one, and never exceeds k entries.
  */
class SketchSpec extends SparkSpecBase {

  test("sketch retains every heavy key under merge, size <= k") {
    import spark.implicits._
    val k = 15
    // skewed multiset: key i in 1..10 occurs 1000/i times (zipf-ish),
    // keys 100..599 once each — N ~ 3429, threshold N/(k+1) ~ 214
    val rows = (1 to 10).flatMap(i => Seq.fill(1000 / i)(i.toLong)) ++
      (100L until 600L)
    val df = scala.util.Random.shuffle(rows).toDF("h").repartition(13)
    val sketch = df.agg(sketches.misra_gries(col("h"), k))
      .head().getSeq[Long](0).toSet
    assert(sketch.size <= k)
    val n = rows.size.toDouble
    val counts = rows.groupBy(identity).view.mapValues(_.size).toMap
    val heavy = counts.filter { case (_, c) => c > n / (k + 1) }.keySet
    assert(heavy.nonEmpty && heavy.subsetOf(sketch),
      s"missing heavy keys: ${heavy -- sketch}")
  }

  test("misra_gries is callable from SQL via GraftExtensions") {
    import spark.implicits._
    (1L to 5L).toDF("h").createOrReplaceTempView("sk_sql_in")
    val out = spark.sql("SELECT misra_gries(h, 8) AS s FROM sk_sql_in")
      .head().getSeq[Long](0)
    assert(out.toSeq === (1L to 5L))
  }

  test("min_k and bloom_bitmap are callable from SQL via GraftExtensions") {
    import spark.implicits._
    (1L to 20L).toDF("h").createOrReplaceTempView("sk_sql_in2")
    val mk = spark.sql("SELECT min_k(h, 4) AS s FROM sk_sql_in2")
      .head().getSeq[Long](0)
    assert(mk.toSeq === (1L to 4L))
    val bm = spark.sql(
      "SELECT bloom_bitmap(h, 1024, 4) AS b FROM sk_sql_in2")
      .head().getSeq[Long](0)
    assert(bm.length === 1024 / 64)
    // same bitmap as the Column API (partitioning-independent by OR-merge)
    val api = (1L to 20L).toDF("h").repartition(5)
      .agg(sketches.bloom_bitmap(col("h"), 1024, 4))
      .head().getSeq[Long](0)
    assert(bm.toSeq === api.toSeq)
  }

  test("sketch equals exact distinct keys when vocabulary fits in k") {
    import spark.implicits._
    val df = (1L to 40L).flatMap(i => Seq.fill(3)(i)).toDF("h").repartition(7)
    val sketch = df.agg(sketches.misra_gries(col("h"), 64))
      .head().getSeq[Long](0)
    assert(sketch.toSeq === (1L to 40L)) // sorted, complete, exact
  }

  // ---- Count-Min Sketch ---------------------------------------------------

  test("cms never underestimates, is partitioning-independent, bounded") {
    import spark.implicits._
    val depth = 4
    val width = 64
    // skewed multiset over a key space >> width so collisions occur
    val rng = new scala.util.Random(7)
    val keys = (1 to 2000).map(_ => math.abs(rng.nextLong()) % 100000L)
    val counts = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val a = keys.toDF("h").repartition(13)
      .agg(sketches.cms_sketch(col("h"), depth, width))
      .head().getSeq[Long](0).toArray
    val b = keys.toDF("h").coalesce(1)
      .agg(sketches.cms_sketch(col("h"), depth, width))
      .head().getSeq[Long](0).toArray
    // linear counters: same sketch under any partitioning
    assert(a.toSeq === b.toSeq)
    assert(a.length === depth * width)
    // every row of counters sums to N (nothing lost, nothing invented)
    (0 until depth).foreach { i =>
      assert(a.slice(i * width, (i + 1) * width).sum === keys.size.toLong)
    }
    // estimate >= exact for EVERY key (the CMS one-sided guarantee),
    // via the same driver-held probe the query uses
    val probe = counts.keys.toSeq.toDF("h")
      .select(col("h"),
        sketches.cms_estimate(a, col("h"), depth, width).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach { case (k, c) =>
      assert(probe(k) >= c, s"key $k: est ${probe(k)} < exact $c")
    }
  }

  test("cms_sketch is callable from SQL via GraftExtensions") {
    import spark.implicits._
    (1L to 20L).toDF("h").createOrReplaceTempView("sk_sql_in3")
    val sql = spark.sql("SELECT cms_sketch(h, 4, 64) AS s FROM sk_sql_in3")
      .head().getSeq[Long](0)
    val api = (1L to 20L).toDF("h")
      .agg(sketches.cms_sketch(col("h"), 4, 64))
      .head().getSeq[Long](0)
    assert(sql.toSeq === api.toSeq)
    assert(sql.sum === 4L * 20L)
  }
}
