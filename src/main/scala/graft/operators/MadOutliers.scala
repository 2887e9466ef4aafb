package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group robust outlier flagging via the median absolute deviation
  * (Iglewicz–Hoaglin modified z-score) — the core of query e106
  * (AnalysisQueries), factored out so the sbt suite can pin the
  * FLAGGING path on a constructed skewed frame: the synthetic corpus's
  * per-source lengths are near-uniform (measured max modified z ≈ 2.97
  * at sf0.01, under the 3.5 rule), so the oracle-compared query
  * correctly flags nothing there.
  *
  * All comparisons are integer: medians of integers are half-integers,
  * so the frame carries `med2` = 2·median and `mad4` = 4·MAD exactly,
  * and the modified z in basis points is `13490·|2x − med2| div mad4`
  * (= 0.6745·(x − med)/MAD × 10⁴ with numerator and denominator each
  * scaled 2×) — trunc division, no float crosses the flag rule. Groups
  * with MAD = 0 (a majority of identical values) report NULL z and
  * flag 0 rather than dividing.
  */
object MadOutliers {

  /** @param df        input with `group`, `id`, and integer `feature`
    *                  columns (feature must fit ~2^48/13490 — any count
    *                  or length column does).
    * @param group     grouping column name (median scope).
    * @param feature   integer feature column name.
    * @param zBpThresh flag threshold in z basis points (35000 = the
    *                  Iglewicz–Hoaglin 3.5 rule).
    * @return input columns + `med2`, `mad4`, `z_bp`, `is_outlier`.
    */
  def flags(
      df: DataFrame, group: String, feature: String,
      zBpThresh: Long = 35000L): DataFrame = {
    val f: Column = col(feature)
    val med = df.groupBy(group)
      .agg((lit(2) * median(f)).cast("long").as("med2"))
    val dev = df.join(broadcast(med), group)
      .withColumn("d2", abs(lit(2) * f - col("med2")))
    val mad = dev.groupBy(group)
      .agg((lit(2) * median(col("d2"))).cast("long").as("mad4"))
    dev.join(broadcast(mad), group)
      .withColumn("z_bp",
        when(col("mad4") =!= 0, expr("13490 * d2 div mad4")))
      .withColumn("is_outlier",
        when(col("z_bp") > zBpThresh, 1).otherwise(0))
      .drop("d2")
  }
}
