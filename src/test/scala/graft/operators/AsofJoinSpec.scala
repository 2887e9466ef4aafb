package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** As-of join semantics against a brute-force reference: latest
  * at-or-before build row per probe, left-outer, deterministic
  * equal-timestamp tie-breaks, and no pair blow-up plan (no
  * CartesianProduct / nested loop in the physical plan).
  */
class AsofJoinSpec extends SparkSpecBase {

  test("asofJoin matches brute-force latest-at-or-before per probe") {
    import spark.implicits._
    // Deterministic scramble: keys 0-9, times 0-999, ~30% build density.
    val build = (0 until 3000).map { i =>
      val k = (i * 7919) % 10
      val t = (i * 104729) % 1000
      (i.toLong, k.toLong, t.toLong, s"b$i")
    }.toDF("b_id", "k", "b_t", "b_tag")
    val probe = (0 until 800).map { i =>
      val k = (i * 6271) % 10
      val t = (i * 31337) % 1000
      (i.toLong, k.toLong, t.toLong)
    }.toDF("p_id", "k", "p_t")

    val got = AsofJoin
      .asofJoin(probe, "p_t", build, "b_t", key = "k", buildTie = "b_id")
      .select("p_id", "asof_b_id")
      .as[(Long, Option[Long])].collect().toMap

    val bRows = build.as[(Long, Long, Long, String)].collect()
    val pRows = probe.as[(Long, Long, Long)].collect()
    for ((pId, k, pT) <- pRows) {
      // latest (b_t, b_id) with same key and b_t <= p_t
      val cands = bRows.filter(b => b._2 == k && b._3 <= pT)
      val expect =
        if (cands.isEmpty) None
        else Some(cands.maxBy(b => (b._3, b._1))._1)
      assert(got(pId) === expect, s"probe $pId key $k t $pT")
    }
    // unmatched probes really occur in this fixture (left-outer is live)
    assert(pRows.exists { case (pId, _, _) => got(pId).isEmpty })
  }

  test("forward direction matches brute-force earliest-at-or-after") {
    import spark.implicits._
    val build = (0 until 3000).map { i =>
      val k = (i * 7919) % 10
      val t = (i * 104729) % 1000
      (i.toLong, k.toLong, t.toLong, s"b$i")
    }.toDF("b_id", "k", "b_t", "b_tag")
    val probe = (0 until 800).map { i =>
      val k = (i * 6271) % 10
      val t = (i * 31337) % 1000
      (i.toLong, k.toLong, t.toLong)
    }.toDF("p_id", "k", "p_t")

    val got = AsofJoin
      .asofJoin(probe, "p_t", build, "b_t", key = "k", buildTie = "b_id",
        forward = true)
      .select("p_id", "asof_b_id")
      .as[(Long, Option[Long])].collect().toMap

    val bRows = build.as[(Long, Long, Long, String)].collect()
    val pRows = probe.as[(Long, Long, Long)].collect()
    for ((pId, k, pT) <- pRows) {
      // earliest (b_t, b_id) with same key and b_t >= p_t
      val cands = bRows.filter(b => b._2 == k && b._3 >= pT)
      val expect =
        if (cands.isEmpty) None
        else Some(cands.minBy(b => (b._3, b._1))._1)
      assert(got(pId) === expect, s"probe $pId")
    }
  }

  test("equal-timestamp build row is visible (at-or-before is inclusive)") {
    import spark.implicits._
    val build = Seq((1L, 1L, 100L), (2L, 1L, 100L), (3L, 1L, 50L))
      .toDF("b_id", "k", "b_t")
    val probe = Seq((10L, 1L, 100L), (11L, 1L, 99L), (12L, 1L, 49L))
      .toDF("p_id", "k", "p_t")
    val got = AsofJoin
      .asofJoin(probe, "p_t", build, "b_t", key = "k", buildTie = "b_id")
      .select("p_id", "asof_b_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(10L) === Some(2L)) // simultaneous; max b_id tie-break
    assert(got(11L) === Some(3L))
    assert(got(12L) === None)
  }

  test("NULL keys/timestamps never match, but NULL probes pass through") {
    import spark.implicits._
    val build = Seq(
      (1L, Some(1L), Some(100L)), // normal
      (2L, None, Some(100L)),     // NULL key: matches nothing
      (3L, Some(2L), None)        // NULL ts: matches nothing
    ).toDF("b_id", "k", "b_t")
    val probe = Seq(
      (10L, Some(1L), Some(200L)), // matches b_id 1
      (11L, None, Some(200L)),     // NULL key: left-outer passthrough
      (12L, Some(2L), Some(200L)), // only NULL-ts build on key: no match
      (13L, Some(1L), None)        // NULL ts: left-outer passthrough
    ).toDF("p_id", "k", "p_t")
    val got = AsofJoin
      .asofJoin(probe, "p_t", build, "b_t", key = "k", buildTie = "b_id")
      .select("p_id", "asof_b_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(got === Map(10L -> Some(1L), 11L -> None, 12L -> None,
      13L -> None))
  }

  test("rejects a prefix that collides with a probe column") {
    import spark.implicits._
    val build = Seq((1L, 1L, 1L)).toDF("b_id", "k", "b_t")
    val probe = Seq((1L, 1L, 2L)).toDF("asof_b_id", "k", "p_t")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(probe, "p_t", build, "b_t", key = "k",
        buildTie = "b_id")
    }
    assert(e.getMessage.contains("asof_b_id"))
  }

  test("plan is one keyed window — no nested loop, no cartesian") {
    import spark.implicits._
    val build = Seq((1L, 1L, 1L)).toDF("b_id", "k", "b_t")
    val probe = Seq((1L, 1L, 2L)).toDF("p_id", "k", "p_t")
    val plan = AsofJoin
      .asofJoin(probe, "p_t", build, "b_t", key = "k", buildTie = "b_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("Window"))
  }

  test("chunked variant equals asofJoin on a hot key, both directions, " +
    "with bounded per-task partitions") {
    import spark.implicits._
    // 90%-hot-key fixture: user 7 carries 9000 of 10000 probe events and
    // most builds — the shape that serializes the plain operator's
    // window into one task. Build density leaves many chunks EMPTY of
    // builds (the cross-chunk patch path is live), some keys have no
    // builds at all, and equal timestamps exercise the tie-break.
    val probe = (0 until 10000).map { i =>
      val k = if (i % 10 != 0) 7L else (i * 6271) % 100L
      val t = (i * 31337) % 100000L
      (i.toLong, k, t)
    }.toDF("p_id", "k", "p_t")
    val build = (0 until 2000).map { i =>
      val k = if (i % 5 != 0) 7L else (i * 7919) % 100L
      // builds cluster in the low half of the range: the high half's
      // chunks have no build, forcing cross-chunk (and no-match) cases
      val t = (i * 104729) % 50000L
      (i.toLong, k, t, s"b$i")
    }.toDF("b_id", "k", "b_t", "b_tag")

    for (fwd <- Seq(false, true)) {
      val plain = AsofJoin.asofJoin(
        probe, "p_t", build, "b_t", key = "k", buildTie = "b_id",
        forward = fwd).select("p_id", "asof_b_id", "asof_b_tag")
      val chunked = AsofJoin.asofJoinChunked(
        probe, "p_t", build, "b_t", key = "k", buildTie = "b_id",
        chunkSize = 4096L, forward = fwd)
        .select("p_id", "asof_b_id", "asof_b_tag")
      assert(chunked.exceptAll(plain).isEmpty &&
        plain.exceptAll(chunked).isEmpty, s"forward=$fwd")
    }

    // the skew bound: the phase-1 window partitions on (key, chunk), so
    // the hot key's largest task is ~1/ceil(range/chunkSize) of its rows
    // rather than all of them
    val groupSizes = probe.select(col("k"), floor(col("p_t") / 4096L).as("c"))
      .unionByName(build.select(col("k"), floor(col("b_t") / 4096L).as("c")))
      .groupBy("k", "c").count()
    val maxTask = groupSizes.agg(max("count")).head.getLong(0)
    val hotTotal = 9000L + 1600L // user 7's probe + build rows
    assert(maxTask < hotTotal / 10,
      s"largest (key, chunk) partition $maxTask is not bounded")

    // and the plan really partitions the big window by both columns
    val plan = AsofJoin.asofJoinChunked(
      probe, "p_t", build, "b_t", key = "k", buildTie = "b_id",
      chunkSize = 4096L).queryExecution.executedPlan.toString
    assert(plan.contains("CartesianProduct") === false)
    assert("hashpartitioning\\(__k#\\d+L?, __c#\\d+L?".r
      .findFirstIn(plan).isDefined,
      s"no (key, chunk) hash partitioning in plan:\n${plan.take(3000)}")
  }

  test("chunked variant: NULL keys/timestamps pass through like asofJoin") {
    import spark.implicits._
    val build = Seq(
      (1L, Some(1L), Some(100L)),
      (2L, None, Some(100L)),
      (3L, Some(2L), None)
    ).toDF("b_id", "k", "b_t")
    val probe = Seq(
      (10L, Some(1L), Some(200L)),
      (11L, None, Some(200L)),
      (12L, Some(2L), Some(200L)),
      (13L, Some(1L), None)
    ).toDF("p_id", "k", "p_t")
    val got = AsofJoin
      .asofJoinChunked(probe, "p_t", build, "b_t", key = "k",
        buildTie = "b_id", chunkSize = 64L)
      .select("p_id", "asof_b_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(got === Map(10L -> Some(1L), 11L -> None, 12L -> None,
      13L -> None))
  }
}
