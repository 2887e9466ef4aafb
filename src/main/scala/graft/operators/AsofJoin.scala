package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** As-of join: each probe row picks the latest build row with the same
  * key whose timestamp is at-or-before the probe's (left-outer — probes
  * with no preceding build row keep NULLs).
  *
  * Spark has no ASOF JOIN operator, and the naive formulation — equi-join
  * on the key plus `b.ts <= p.ts`, then argmax per probe — materializes
  * every (probe, earlier-build) pair before reducing: quadratic per key
  * and a skew bomb on hot keys. This operator instead composes existing
  * ops (the preferred path for a custom operator): tag both inputs,
  * UNION them, and run one `last(_, ignoreNulls)` window PARTITIONED BY
  * key ORDER BY (ts, side, tie). Cost is a single hash shuffle of
  * (|probe| + |build|) rows and a per-key sort — the same price as the
  * equi-join itself — with no intermediate pair blow-up. The window is
  * key-partitioned, never global, so it survives a 1000-executor run;
  * per-key work is linear in that key's rows.
  *
  * Determinism: build rows sort before probe rows at an identical
  * timestamp (side 0 < 1, so an exactly-simultaneous build row is
  * visible — "at-or-before" is inclusive), and equal-timestamp build
  * rows tie-break on `buildTie` ascending, so "latest" is the max tie.
  * Probe rows carry a NULL tie, which cannot collide with build rows
  * (side differs), keeping the ordering engine-independent even though
  * Spark sorts NULLs first and DuckDB last.
  *
  * NULL semantics match equi-join/ASOF, not `Window.partitionBy` (which
  * would group NULL keys together): a build row with a NULL key or NULL
  * timestamp can never match and is dropped before the window; a probe
  * row with a NULL key or NULL timestamp bypasses the window and keeps
  * NULL build columns (left-outer), instead of matching NULL-keyed
  * build rows.
  */
object AsofJoin {

  /** @param probe    left side; all its columns pass through unchanged
    * @param probeTs  probe timestamp column name
    * @param build    right side; its columns appear prefixed in the output
    * @param buildTs  build timestamp column name
    * @param key      equi-key column name present in both inputs
    * @param buildTie unique build column breaking equal-timestamp ties
    * @param prefix   prefix for build columns in the output
    * @param forward  false (default): latest build at-or-BEFORE the
    *                 probe. true: earliest build at-or-AFTER it (the
    *                 next-event / conversion-latency shape) — the exact
    *                 mirror: build rows sort after probes at an equal
    *                 timestamp (still inclusive), the window frame flips
    *                 to [current, following], and `first` replaces
    *                 `last`; equal-timestamp builds resolve to the MIN
    *                 tie ("earliest"). Same single-shuffle cost.
    */
  def asofJoin(
      probe: DataFrame, probeTs: String,
      build: DataFrame, buildTs: String,
      key: String, buildTie: String,
      prefix: String = "asof_",
      forward: Boolean = false): DataFrame = {
    val clash = probe.columns.toSet intersect build.columns.map(prefix + _).toSet
    require(clash.isEmpty,
      s"asofJoin output would duplicate column(s) ${clash.mkString(", ")}; " +
        "pick a different prefix")
    val bType = StructType(build.schema.fields)
    val pType = StructType(probe.schema.fields)
    val joinable = col("__k").isNotNull && col("__t").isNotNull
    val (buildSide, probeSide) = if (forward) (1, 0) else (0, 1)
    val b = build.select(
      col(key).as("__k"), col(buildTs).as("__t"),
      lit(buildSide).as("__side"),
      col(buildTie).cast(LongType).as("__tie"),
      struct(build.columns.map(col).toIndexedSeq: _*).as("__b"),
      lit(null).cast(pType).as("__p"))
    val p = probe.select(
      col(key).as("__k"), col(probeTs).as("__t"),
      lit(probeSide).as("__side"),
      lit(null).cast(LongType).as("__tie"),
      lit(null).cast(bType).as("__b"),
      struct(probe.columns.map(col).toIndexedSeq: _*).as("__p"))
    val ordered = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
    val (w, pick) =
      if (forward)
        (ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__b"), ignoreNulls = true))
      else
        (ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__b"), ignoreNulls = true))
    val matched = b.where(joinable).unionByName(p.where(joinable))
      .withColumn("__m", pick.over(w))
      .where(col("__side") === probeSide)
      .unionByName(p.where(!joinable).withColumn("__m", col("__b")))
    matched.select(
      probe.columns.map(c => col(s"__p.$c").as(c)).toIndexedSeq ++
        build.columns.map(c => col(s"__m.$c").as(prefix + c)): _*)
  }

  /** [[asofJoin]] for a SKEWED key distribution — the hot-key lever for
    * window-heavy shapes (SCALING.md: q26/q45's user window). The plain
    * operator partitions its window by key, so one pathological key (a
    * bot user with 10^8 events) serializes into a single task — and AQE
    * cannot split a window partition the way it splits a skewed join.
    *
    * Construction: partition the window by (key, time-chunk) with
    * `chunk = floor(ts / chunkSize)` — monotone in ts, so ordering and
    * equal-timestamp ties (same ts ⇒ same chunk) are preserved — and
    * resolve probes whose match lives in a LATER chunk (forward; earlier
    * for backward) through a per-(key, chunk) BOUNDARY table: the
    * extremal build row of each chunk, suffix/prefix-scanned per key so
    * every (key, chunk) knows the nearest cross-chunk match. Per-task
    * work is now bounded by the hot key's densest time chunk; the
    * boundary table has one row per (key, chunk) — timeRange/chunkSize
    * rows per key, independent of row count — so its window is trivially
    * small and the final patch-up is a plain equi-join on (key, chunk)
    * that AQE can split like any join. Results are identical to
    * [[asofJoin]] (AsofJoinSpec pins equality on adversarial data, both
    * directions).
    *
    * @param chunkSize time-chunk width in the ts column's own numeric
    *                  unit (cast to long) — size it so the hot key's
    *                  rows per chunk fit a task comfortably, e.g. an
    *                  hour of micros for a key logging 10^6 events/day
    */
  def asofJoinChunked(
      probe: DataFrame, probeTs: String,
      build: DataFrame, buildTs: String,
      key: String, buildTie: String,
      chunkSize: Long,
      prefix: String = "asof_",
      forward: Boolean = false): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val clash = probe.columns.toSet intersect build.columns.map(prefix + _).toSet
    require(clash.isEmpty,
      s"asofJoinChunked output would duplicate column(s) " +
        s"${clash.mkString(", ")}; pick a different prefix")
    val bType = StructType(build.schema.fields)
    val pType = StructType(probe.schema.fields)
    val joinable = col("__k").isNotNull && col("__t").isNotNull
    val (buildSide, probeSide) = if (forward) (1, 0) else (0, 1)
    def chunkOf(t: org.apache.spark.sql.Column) =
      floor(t.cast(LongType).cast("double") / chunkSize).cast(LongType)
    val b = build.select(
      col(key).as("__k"), col(buildTs).as("__t"),
      lit(buildSide).as("__side"),
      col(buildTie).cast(LongType).as("__tie"),
      struct(build.columns.map(col).toIndexedSeq: _*).as("__b"),
      lit(null).cast(pType).as("__p"))
      .withColumn("__c", chunkOf(col("__t")))
    val p = probe.select(
      col(key).as("__k"), col(probeTs).as("__t"),
      lit(probeSide).as("__side"),
      lit(null).cast(LongType).as("__tie"),
      lit(null).cast(bType).as("__b"),
      struct(probe.columns.map(col).toIndexedSeq: _*).as("__p"))
      .withColumn("__c", chunkOf(col("__t")))

    // Phase 1 — the asofJoin window, partitioned by (key, chunk): hot
    // keys spread over their time chunks. Probes matched within their
    // own chunk are final (the nearest build in ts order shares the
    // chunk or none does).
    val ordered = Window.partitionBy(col("__k"), col("__c"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
    val (w, pick) =
      if (forward)
        (ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__b"), ignoreNulls = true))
      else
        (ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__b"), ignoreNulls = true))
    val inChunk = b.where(joinable).unionByName(p.where(joinable))
      .withColumn("__m", pick.over(w))
      .where(col("__side") === probeSide)

    // Phase 2 — boundary table: the extremal build per (key, chunk)
    // (earliest for forward, latest for backward), then a per-key
    // prefix/suffix scan over the key's DISTINCT chunks (bounded by the
    // time range, not the row count) telling each chunk its nearest
    // cross-chunk build.
    val extremal =
      if (forward) min_by(col("__b"), struct(col("__t"), col("__tie")))
      else max_by(col("__b"), struct(col("__t"), col("__tie")))
    val perChunk = b.where(joinable)
      .groupBy(col("__k"), col("__c")).agg(extremal.as("__cb"))
    val allChunks = b.where(joinable).select(col("__k"), col("__c"))
      .unionByName(p.where(joinable).select(col("__k"), col("__c")))
      .distinct()
      .join(perChunk, Seq("__k", "__c"), "left")
    val scan = Window.partitionBy(col("__k")).orderBy(col("__c"))
    val crossChunk = (
      if (forward)
        allChunks.withColumn("__nb",
          first(col("__cb"), ignoreNulls = true).over(
            scan.rowsBetween(1, Window.unboundedFollowing)))
      else
        allChunks.withColumn("__nb",
          last(col("__cb"), ignoreNulls = true).over(
            scan.rowsBetween(Window.unboundedPreceding, -1)))
      ).select(col("__k"), col("__c"), col("__nb"))

    // Phase 3 — patch unmatched probes from the boundary scan: a plain
    // (key, chunk) equi-join against the small chunk table (AQE-
    // splittable; no ordering, O(1) per probe row).
    val patched = inChunk
      .join(crossChunk, Seq("__k", "__c"), "left")
      .withColumn("__m", coalesce(col("__m"), col("__nb")))
      .unionByName(
        p.where(!joinable)
          .withColumn("__m", col("__b"))
          .withColumn("__nb", col("__b")))
    patched.select(
      probe.columns.map(c => col(s"__p.$c").as(c)).toIndexedSeq ++
        build.columns.map(c => col(s"__m.$c").as(prefix + c)): _*)
  }
}
