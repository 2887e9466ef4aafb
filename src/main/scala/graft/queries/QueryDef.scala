package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible and deterministic) an equivalent
  * DuckDB oracle query over the same parquet tables.
  *
  * Determinism contract (SURVEY.md §5): every oracle-compared query ends in
  * an ORDER BY over a unique key set, aliases every computed column
  * identically on both sides, and avoids per-row `round()` on values that sit
  * on decimal half-way points (binary doubles round differently across
  * engines there — aggregates rounded to >=2 dp are safe because their error
  * is not systematically at the boundary).
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
