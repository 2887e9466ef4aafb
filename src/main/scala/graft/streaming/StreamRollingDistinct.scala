package graft.streaming

import org.apache.spark.sql.{DataFrame, functions => Fn}
import org.apache.spark.sql.functions._

/** Streaming twin of e136's rolling distinct: per sliding event-time
  * window (length × slide), the distinct-user estimate from
  * [[graft.functions.sketches.HllAgg]] registers — the custom native
  * aggregate running INSIDE Structured Streaming's windowed-state
  * machinery, which is the point being proven: a
  * TypedImperativeAggregate whose merge is associative, commutative
  * AND idempotent composes with watermarked window state exactly like
  * a builtin (partial registers live in the state store per open
  * window; late rows max-merge in; replayed rows are no-ops — the one
  * aggregate family that is safe under at-least-once delivery with no
  * [[StreamDedup]] admission gate, unlike every counting twin).
  *
  * Emission carries the integer e134 estimate contract (α₆₄ floor
  * division over the exact register sum) plus the SMALL-RANGE columns
  * the batch twin ships (ADVICE r10): with m = 64 the raw estimator
  * floors near α·m ≈ 45 on sparse windows, and without `v_zero` a
  * consumer cannot tell which windows sit in that biased regime — so
  * each row carries the empty-register count and the e134-style
  * `lc_est` linear-counting re-estimate (m·ln(m/v_zero), 4-dp, NULL
  * outside its regime est ≤ 5m/2 ∧ v_zero > 0), exactly the batch
  * contract. n_exact is NOT carried — a stream cannot afford the
  * exact side; the batch e136 is the calibration harness. Append
  * mode: a window's row is final once the watermark passes its end
  * (the register state for that window is then dropped — state is
  * #open-windows × 512 B per grouping).
  */
object StreamRollingDistinct {

  /** @param events streaming DataFrame with `user_id` and `ts`
    * @param watermark lateness bound on ts (e.g. "1 day")
    * @param length window length (e.g. "7 days")
    * @param slide  window slide (e.g. "1 day")
    */
  def estimates(
      events: DataFrame, watermark: String,
      length: String, slide: String): DataFrame = {
    val alphaNum = 709L * (1L << 37)
    events
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(Fn.window(col("ts"), length, slide))
      .agg(graft.functions.sketches.hll_sketch(col("user_id")).as("regs"))
      .withColumn("s2", expr("aggregate(transform(regs, " +
        "r -> shiftleft(CAST(1 AS BIGINT), CAST(25 - r AS INT))), " +
        "CAST(0 AS BIGINT), (a, x) -> a + x)"))
      .withColumn("v_zero",
        size(Fn.filter(col("regs"), r => r === 0L)).cast("long"))
      .withColumn("est_users", expr(s"$alphaNum div (1000 * s2)"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("est_users"), col("v_zero"),
        when(col("est_users") * 2 <= 320 && col("v_zero") > 0,
          round(lit(64d) * log(lit(64d) / col("v_zero")), 4) + lit(0d))
          .as("lc_est"))
  }
}
