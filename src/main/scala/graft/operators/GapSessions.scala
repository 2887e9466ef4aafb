package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-sessionization (q17's shape: a new session opens when the
  * gap to the user's previous event exceeds `gap`), with a SKEW-SAFE
  * variant — the "salt a pathological single-user stream" lever
  * SCALING.md names for q17: the plain formulation partitions its
  * window by user, so one bot user's 10^8-event stream serializes into
  * a single task, and AQE cannot split a window partition.
  *
  * [[sessionsChunked]] bounds per-task work by time-chunking:
  *
  *  1. sessionize within (user, `floor(ts / chunkSize)`) — chunking is
  *     monotone in ts and equal timestamps share a chunk, so local
  *     ordering (ts, tie) is preserved;
  *  2. a chunk's INTERIOR sessions (neither first nor last of the
  *     chunk) are final — their gaps to both neighbors are proven
  *     inside the chunk;
  *  3. only each chunk's first/last session rows (≤ 2 per (user,
  *     chunk), independent of event count) enter a per-user merge
  *     chain ordered by time, which stitches sessions across chunk
  *     boundaries by comparing REAL timestamps (`next.start −
  *     prev.end ≤ gap`) — correct for any chunkSize, including
  *     across empty chunks, because no chunk-adjacency assumption is
  *     made.
  *
  * Cost: one (user, chunk) hash shuffle of the events (same volume as
  * the plain window's user shuffle), then a per-user window over the
  * boundary-session table, whose size per user is bounded by
  * 2 × timeRange/chunkSize rows — not by the user's event count.
  *
  * Output: one row per session — (user, session_start, session_end,
  * n_events), timestamps in the ts column's own numeric unit. The
  * plain [[sessions]] twin returns the same frame for parity checks.
  */
object GapSessions {

  /** Plain user-windowed gap sessionizer (the q17 formulation, reduced
    * to session rows). `ts` must be numeric (e.g. unix micros); `gap`
    * is in the same unit.
    */
  def sessions(
      events: DataFrame, user: String, ts: String, tie: String,
      gap: Long): DataFrame = {
    val w = Window.partitionBy(col(user)).orderBy(col(ts), col(tie))
    events
      .withColumn("__prev", lag(col(ts), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col(ts) - col("__prev") > gap, 1)
          .otherwise(0))
      .withColumn("__sess", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(user), col("__sess"))
      .agg(min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("__sess")
  }

  /** The bounded-task variant (see object doc). Requires `chunkSize >
    * 0`; results are identical to [[sessions]] for every chunkSize.
    */
  def sessionsChunked(
      events: DataFrame, user: String, ts: String, tie: String,
      gap: Long, chunkSize: Long): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    val chunked = events.withColumn("__c",
      floor(col(ts).cast("double") / chunkSize).cast("long"))
    // Phase 1: local sessions within (user, chunk) — the only window
    // that sees event-level volume, partitioned so a hot user spreads
    // across its time chunks.
    val w1 = Window.partitionBy(col(user), col("__c"))
      .orderBy(col(ts), col(tie))
    val local = chunked
      .withColumn("__prev", lag(col(ts), 1).over(w1))
      .withColumn("__new",
        when(col("__prev").isNull || col(ts) - col("__prev") > gap, 1)
          .otherwise(0))
      .withColumn("__sess", sum(col("__new"))
        .over(w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(user), col("__c"), col("__sess"))
      .agg(min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        count(lit(1)).as("n_events"))
    // Phase 2: split interior (final) sessions from boundary ones. The
    // two branches below share phase 1's exchange via ReuseExchange
    // (a localCheckpoint here was probed and bought nothing — the
    // duplicated window re-reads the reused shuffle, it does not
    // re-shuffle the events).
    val perChunk = Window.partitionBy(col(user), col("__c"))
    val marked = local.withColumn("__last",
      max(col("__sess")).over(perChunk))
    val interior = marked
      .filter(col("__sess") > 1 && col("__sess") < col("__last"))
      .select(col(user), col("session_start"), col("session_end"),
        col("n_events"))
    // Phase 3: merge chain over boundary sessions only — ≤ 2 rows per
    // (user, chunk), so this per-user window is bounded by the time
    // range, not the event count. The chain compares real timestamps:
    // sessions that cannot merge (same-chunk neighbors, gaps across
    // empty chunks) fail the gap test on their own times.
    val wu = Window.partitionBy(col(user))
      .orderBy(col("session_start"), col("session_end"))
    val merged = marked
      .filter(col("__sess") === 1 || col("__sess") === col("__last"))
      .withColumn("__pe", lag(col("session_end"), 1).over(wu))
      .withColumn("__new",
        when(col("__pe").isNull || col("session_start") - col("__pe") > gap, 1)
          .otherwise(0))
      .withColumn("__grp", sum(col("__new"))
        .over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(user), col("__grp"))
      .agg(min(col("session_start")).as("session_start"),
        max(col("session_end")).as("session_end"),
        sum(col("n_events")).as("n_events"))
      .select(col(user), col("session_start"), col("session_end"),
        col("n_events"))
    interior.unionByName(merged)
  }
}
