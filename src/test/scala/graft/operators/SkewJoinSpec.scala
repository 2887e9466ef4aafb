package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Salted-join semantics: identical results to the plain equi-join on a
  * skewed corpus, and the salt actually spreads the hot key across
  * multiple shuffle partitions.
  */
class SkewJoinSpec extends SparkSpecBase {

  test("saltedEquiJoin equals plain join on a 90%-hot-key corpus") {
    import spark.implicits._
    // 10k facts, 90% on one hot key — the classic straggler shape.
    val fact = spark.range(10000)
      .select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100)
          .as("k"),
        col("id").as("payload"))
    val dim = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "attr")

    val plain = fact.join(dim, Seq("k"))
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "k", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // left-outer keeps unmatched fact rows exactly like the plain join
    val factExtra = fact.unionByName(
      Seq((999L, -1L)).toDF("k", "payload"))
    val plainLeft = factExtra.join(dim, Seq("k"), "left")
    val saltedLeft = SkewJoin.saltedEquiJoin(factExtra, dim, "k",
      salts = 8, joinType = "left")
    assert(saltedLeft.exceptAll(plainLeft).isEmpty &&
      plainLeft.exceptAll(saltedLeft).isEmpty)

    // the hot key's rows really are spread over several salt buckets
    // (the operator's own content-derived salt: hash of every column)
    val spread = fact.withColumn("__salt",
      pmod(xxhash64(col("k"), col("payload")), lit(8)))
      .filter(col("k") === 7L)
      .select("__salt").distinct().count()
    assert(spread === 8)

    // recomputation safety: the join must contain NO nondeterministic
    // expression (a lost shuffle map output recomputes only some
    // partitions; a rand/monotonic salt would re-salt those rows
    // differently and drop or duplicate them across attempt generations)
    salted.queryExecution.analyzed.foreach { node =>
      node.expressions.foreach { e =>
        assert(e.deterministic, s"nondeterministic expression $e in $node")
      }
    }

    // hotKeys diagnostic flags exactly the skewed key at this threshold
    val hot = SkewJoin.hotKeys(fact, col("k"), 1000L)
      .collect().map(_.getLong(0)).toSeq
    assert(hot === Seq(7L))
  }

  test("saltCols tiebreak: unhashable fact columns, identical hot rows") {
    import spark.implicits._
    // Hot key whose visible payload is byte-identical (duplicate-heavy
    // corpus) and carries a MapType column the default all-columns
    // xxhash64 salt cannot hash — the two failure modes saltCols fixes.
    val fact = spark.range(1000).select(
      lit(7L).as("k"),
      map(lit("src"), lit("crawl")).as("props"),
      col("id").as("uid"))
    val dim = Seq((7L, "hot")).toDF("k", "attr")

    // default salt hashes every column → analysis error on the MapType
    intercept[org.apache.spark.sql.AnalysisException] {
      SkewJoin.saltedEquiJoin(fact, dim, "k", salts = 8).count()
    }

    // caller-supplied uid salt: joins fine, result matches plain join
    val out = SkewJoin.saltedEquiJoin(fact, dim, "k", salts = 8,
      saltCols = Seq("uid"))
    assert(out.count() === 1000)

    // and the identical-looking hot rows really spread across all salts
    val spread = fact
      .withColumn("__salt", pmod(xxhash64(col("uid")), lit(8)))
      .select("__salt").distinct().count()
    assert(spread === 8)

    // unknown salt columns are rejected loudly, not silently dropped
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(fact, dim, "k", saltCols = Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("semi/anti salted joins match plain; replicating types rejected") {
    import spark.implicits._
    val fact = Seq((1L, 10L), (1L, 11L), (2L, 20L), (9L, 90L))
      .toDF("k", "payload")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "attr")

    // semi: each matching fact row exactly once despite dim replication
    val semi = SkewJoin.saltedEquiJoin(fact, dim, "k", salts = 4,
      joinType = "left_semi")
    val plainSemi = fact.join(dim, Seq("k"), "left_semi")
    assert(semi.exceptAll(plainSemi).isEmpty &&
      plainSemi.exceptAll(semi).isEmpty)

    // anti: the dim key is visible at EVERY salt, so no false keeps
    val anti = SkewJoin.saltedEquiJoin(fact, dim, "k", salts = 4,
      joinType = "left_anti")
    assert(anti.select("payload").as[Long].collect().toSeq === Seq(90L))

    // right/full outer would emit each unmatched dim row once per salt
    for (jt <- Seq("right", "full_outer")) {
      val e = intercept[IllegalArgumentException] {
        SkewJoin.saltedEquiJoin(fact, dim, "k", salts = 4, joinType = jt)
      }
      assert(e.getMessage.contains("duplicate"), jt)
    }
  }

  test("selective salting equals plain join; NULLs ride the cold path") {
    import spark.implicits._
    // 90% hot key 7 + a long cold tail + NULL-key fact rows
    val fact = spark.range(10000)
      .select(
        when(col("id") % 10 =!= 0, lit(7L))
          .when(col("id") % 20 === 0, lit(null).cast("long"))
          .otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val dim = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "attr")

    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val sel = SkewJoin.saltedEquiJoinSelective(
        fact, dim, "k", salts = 8, joinType = jt, minShare = 16)
      val plain = fact.join(dim, Seq("k"), jt)
      assert(sel.exceptAll(plain).isEmpty && plain.exceptAll(sel).isEmpty,
        s"joinType=$jt")
    }

    // the sketch census is bounded: <= minShare-1 candidates, and the
    // truly hot key (>1/16 of rows) is guaranteed in it
    val cand = fact
      .agg(graft.functions.sketches
        .misra_gries(col("k").cast("long"), 15))
      .head().getSeq[Long](0)
    assert(cand.size <= 15 && cand.contains(7L))

    // non-integral keys are rejected toward the generic path
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoinSelective(
        Seq(("a", 1L)).toDF("k", "v"), Seq(("a", "x")).toDF("k", "attr"),
        "k")
    }
    assert(e.getMessage.contains("integral"))
  }

  test("selective salting rejects right/full outer even with no hot keys") {
    import spark.implicits._
    // A uniform fact has an undersized MG census; the contract must NOT
    // become data-dependent (accepting right outer only while the data
    // happens to be flat, then failing once a hot key appears).
    val fact = spark.range(64).select(col("id").as("k"), col("id").as("v"))
    val dim = (0L until 64L).map(k => (k, s"d$k")).toDF("k", "attr")
    for (jt <- Seq("right", "full_outer")) {
      val e = intercept[IllegalArgumentException] {
        SkewJoin.saltedEquiJoinSelective(fact, dim, "k", joinType = jt)
      }
      assert(e.getMessage.contains("duplicate"), jt)
    }
  }
}
