package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible and deterministic) an equivalent
  * DuckDB oracle query over the same parquet tables.
  *
  * Determinism contract (SURVEY.md §5): every oracle-compared query's ORACLE
  * SQL ends in an ORDER BY over a unique key set, aliases every computed
  * column identically on both sides, and avoids per-row `round()` on values
  * that sit on decimal half-way points (binary doubles round differently
  * across engines there — aggregates rounded to >=2 dp are safe because
  * their error is not systematically at the boundary).
  *
  * Trailing-sort convention (Spark side): the driver's compare sorts rows
  * before hashing, so a final `orderBy` on the SPARK side is presentation
  * only — it is KEPT on bounded-cardinality results (per-lang aggregates,
  * top-k, funnel stages), where the sort is one tiny stage, and DROPPED on
  * corpus-scale and pair-scale results (per-doc rows, near-dup pairs),
  * where the trailing range exchange grows with the data and buys nothing
  * (q10's precedent: its global-index result is consumed unsorted). A user
  * wanting ordered output adds `.orderBy` at the call site.
  *
  * Negative-zero rule: DuckDB's `round` keeps IEEE sign (-1e-9 -> -0.0)
  * while Spark's BigDecimal round returns +0.0, and the driver compares
  * `repr` strings — so any rounded column whose value can be a tiny
  * negative (cosines, means) carries `+ 0` in the ORACLE SQL to normalize
  * -0.0 to +0.0 (IEEE: -0.0 + 0 == +0.0), applied BEFORE any ranking so
  * tie order can't diverge either.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))

  /** Spark-only query: driver records a weaker rows-only check. */
  def sparkOnly(name: String)(
      run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
