package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the remaining Structured
  * Streaming join primitive (alongside the file-source ingest, the
  * watermarked window aggregation, first-arrival dedup, and keyed
  * mapGroupsWithState): correlate two event streams on a key within a
  * bounded time window, e.g. attribute a purchase to the view that
  * preceded it.
  *
  * Both sides carry a watermark and the join condition bounds buy_ts
  * relative to view_ts from BOTH directions — exactly what Spark needs
  * to age out join state: a buffered view can be dropped once the buy
  * watermark passes view_ts + window, so state is bounded by rate x
  * window, never by stream length. Without the range bound the state
  * store grows forever (Spark would reject the append-mode query).
  *
  * Works unchanged on static frames (withWatermark is a no-op in batch)
  * — the q16_attribution batch twin runs THIS code against the events
  * table and is oracle-checked, so the join semantics are proven even
  * though the streaming runtime itself has no DuckDB twin.
  */
object StreamJoin {

  /** `views`/`buys` must carry (event_id, user_id, ts [, value]).
    * Emits one row per (view, purchase) pair with the purchase at or
    * after the view and within `windowMinutes`. With
    * `joinType = "left_outer"` a view with no qualifying purchase is
    * ALSO emitted (buy columns null) once the buy-side watermark passes
    * view_ts + window — i.e. when no match can arrive anymore — which
    * is the conversion-funnel form (views that didn't convert are data,
    * not absence). State stays bounded either way: the two-sided time
    * bound lets Spark evict buffered rows at the watermark.
    */
  def attributed(
      views: DataFrame, buys: DataFrame,
      watermark: String = "30 minutes",
      windowMinutes: Int = 15,
      joinType: String = "inner"): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val b = buys
      .select(col("event_id").as("buy_id"), col("user_id").as("buy_user"),
        col("ts").as("buy_ts"), col("value"))
      .withWatermark("buy_ts", watermark)
    v.join(b,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"),
        joinType)
      .select(col("view_id"), col("buy_id"), col("user_id"),
        col("view_ts"), col("buy_ts"), col("value"))
  }
}
