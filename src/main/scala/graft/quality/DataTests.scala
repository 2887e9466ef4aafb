package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dbt data-test engine (SURVEY.md §2.10): the four declarative test
  * types compiled from (table, column, spec) triples into DataFrames of
  * FAILING rows — a test passes iff its compiled query returns 0 rows,
  * exactly dbt's contract. The declarations below port every test
  * instance attached in the reference's three YAML files.
  */
object DataTests {

  sealed trait TestSpec { def kind: String }
  /** T1 — column must have no NULLs. */
  final case class NotNull(column: String) extends TestSpec { val kind = "not_null" }
  /** T2 — column values must be unique. */
  final case class Unique(column: String) extends TestSpec { val kind = "unique" }
  /** T3 — non-NULL values restricted to `values` (dbt: NULLs pass). */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends TestSpec { val kind = "accepted_values" }
  /** T4 — FK: every non-NULL `column` exists in `toTable`.`toColumn`. */
  final case class Relationships(column: String, toTable: String, toColumn: String)
      extends TestSpec { val kind = "relationships" }

  final case class TestCase(table: String, spec: TestSpec) {
    def name: String = spec match {
      case r: Relationships =>
        s"${spec.kind}_${table}_${r.column}__${r.toTable}_${r.toColumn}"
      case _ =>
        s"${spec.kind}_${table}_${specColumn(spec)}"
    }
  }
  private def specColumn(s: TestSpec): String = s match {
    case NotNull(c) => c
    case Unique(c) => c
    case AcceptedValues(c, _) => c
    case Relationships(c, _, _) => c
  }

  final case class TestResult(name: String, failingRows: Long) {
    def passed: Boolean = failingRows == 0
  }

  /** Compile one test to its failing-rows DataFrame. `resolve` maps a
    * table name to its DataFrame (raw table, staging view, or mart
    * table).
    */
  def compile(tc: TestCase, resolve: String => DataFrame): DataFrame = {
    val df = resolve(tc.table)
    tc.spec match {
      case NotNull(c) =>
        df.filter(col(c).isNull)
      case Unique(c) =>
        df.groupBy(col(c)).agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
      case AcceptedValues(c, vals) =>
        df.filter(col(c).isNotNull && !col(c).isin(vals: _*))
      case Relationships(c, toTable, toColumn) =>
        df.filter(col(c).isNotNull)
          .join(resolve(toTable).select(col(toColumn).as(c)), Seq(c), "left_anti")
    }
  }

  /** `dbt test` twin (§3.3): run a suite, one count per test. */
  def run(tests: Seq[TestCase], resolve: String => DataFrame): Seq[TestResult] =
    tests.map(tc => TestResult(tc.name, compile(tc, resolve).count()))

  /** Same results as [[run]] in ONE Spark job: every compiled test is
    * reduced to a (name, failing-count) row and the rows unioned into a
    * single plan. dbt submits each test as its own query; an engine that
    * owns the executor can evaluate all independent test subtrees in one
    * action — one scheduling round-trip instead of N, shared scans where
    * tables repeat, parallel stage execution across tests.
    */
  def runBatched(
      tests: Seq[TestCase], resolve: String => DataFrame): Seq[TestResult] = {
    val counts = tests.map { tc =>
      compile(tc, resolve)
        .agg(count(lit(1)).as("failing"))
        .select(lit(tc.name).as("name"), col("failing"))
    }
    val byName = counts.reduce(_ unionByName _).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    tests.map(tc => TestResult(tc.name, byName(tc.name)))
  }

  /** Compile one test INCREMENTALLY: validate only the rows matched by
    * `touched` (a predicate on the table's partition columns — e.g.
    * `col("load_date") === d` over a [[graft.sources.Layout
    * .writePartitioned]] layout), so the scan prunes to the partitions a
    * batch wrote (`PartitionFilters` non-empty) instead of re-reading
    * the whole table on every ingest tick. At 100 TB this is the
    * difference between a per-batch test suite costing O(batch) and
    * O(history).
    *
    * Soundness, given prior batches already passed their own runs:
    *  - not_null / accepted_values are row-local — new rows are the only
    *    possible new violations.
    *  - relationships checks the batch's child rows against the FULL
    *    parent (only the anti-join's left side prunes; a missing parent
    *    for an old child would have failed an earlier run).
    *  - unique is NOT row-local (a new row can collide with an old one):
    *    failing keys are the batch's keys whose count over the FULL
    *    table exceeds 1 — the history side is a single-column semi-join
    *    scan (column-pruned), the irreducible cost of cross-batch
    *    uniqueness without an index.
    */
  def compileIncremental(
      tc: TestCase, resolve: String => DataFrame,
      touched: org.apache.spark.sql.Column): DataFrame = {
    val df = resolve(tc.table)
    tc.spec match {
      case NotNull(c) =>
        df.filter(touched).filter(col(c).isNull)
      case AcceptedValues(c, vals) =>
        df.filter(touched).filter(col(c).isNotNull && !col(c).isin(vals: _*))
      case Relationships(c, toTable, toColumn) =>
        df.filter(touched).filter(col(c).isNotNull)
          .join(resolve(toTable).select(col(toColumn).as(c)), Seq(c), "left_anti")
      case Unique(c) =>
        val batchKeys = df.filter(touched).select(col(c)).distinct()
        df.select(col(c))
          .join(batchKeys, Seq(c), "left_semi")
          .groupBy(col(c)).agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
    }
  }

  /** [[runBatched]] over [[compileIncremental]]: the per-ingest-tick
    * suite, one Spark action, scans pruned to the batch's partitions.
    */
  def runIncremental(
      tests: Seq[TestCase], resolve: String => DataFrame,
      touched: org.apache.spark.sql.Column): Seq[TestResult] = {
    val counts = tests.map { tc =>
      compileIncremental(tc, resolve, touched)
        .agg(count(lit(1)).as("failing"))
        .select(lit(tc.name).as("name"), col("failing"))
    }
    val byName = counts.reduce(_ unionByName _).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    tests.map(tc => TestResult(tc.name, byName(tc.name)))
  }

  // ---- The declared instances ---------------------------------------------

  /** sources/_bike_shop.yml:12-55 — raw-table tests, including the
    * reference's deliberate `orders.customer_id` UNIQUE declaration
    * (only true because of J4's index-alignment quirk; replicated
    * as-is, SURVEY §2.10 T2).
    */
  val sourceTests: Seq[TestCase] = Seq(
    TestCase("customers", NotNull("id")),
    TestCase("customers", Unique("id")),
    TestCase("orders", NotNull("id")),
    TestCase("orders", Unique("id")),
    TestCase("orders", NotNull("customer_id")),
    TestCase("orders", Unique("customer_id")),
    TestCase("orders", Relationships("customer_id", "customers", "id")),
    TestCase("order_products", NotNull("id")),
    TestCase("order_products", Unique("id")),
    TestCase("order_products", NotNull("product_id")),
    TestCase("order_products", Relationships("product_id", "products", "id")),
    TestCase("order_products", NotNull("order_id")),
    TestCase("order_products", Relationships("order_id", "orders", "id")),
    TestCase("products", NotNull("id")),
    TestCase("products", Unique("id")))

  /** staging/_stg_bike_shop.yml:5-11. */
  val stagingTests: Seq[TestCase] = Seq(
    TestCase("stg_bike_shop__customers",
      AcceptedValues("customer_gender", Seq("Male", "Female", "Non-binary"))))

  /** mart/_mart_bike_shop.yml:4-13. */
  val martTests: Seq[TestCase] = Seq(
    TestCase("fct_order_products", NotNull("order_product_id")),
    TestCase("fct_order_products", Unique("order_product_id")),
    TestCase("fct_order_products", NotNull("order_id")),
    TestCase("fct_order_products", NotNull("customer_id")))

  val allDeclared: Seq[TestCase] = sourceTests ++ stagingTests ++ martTests

  /** Run every declared test against a materialized pipeline: raw tables
    * in `rawDb`, staging views + mart tables from [[graft.models.Models
    * .dbtRun]] results.
    */
  def runAll(
      spark: SparkSession, rawDb: String,
      materialized: Map[String, DataFrame]): Seq[TestResult] = {
    def resolve(t: String): DataFrame =
      materialized.getOrElse(t, spark.table(s"$rawDb.$t"))
    runBatched(allDeclared, resolve)
  }
}
