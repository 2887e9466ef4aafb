package graft.queries

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.gen.MockData
import graft.models.Models
import graft.pipeline.Ingest
import graft.quality.DataTests

/** Driver-visible queries over the ENGINE itself (generator, ingest
  * pipeline, staging/mart models, data-quality suite). These are not
  * derivable from the testdata parquet, so they are Spark-only (rows
  * check) — their value semantics are pinned by the ScalaTest suite
  * (MockDataSpec, IngestSpec, ModelsSpec, DataTestsSpec) instead of the
  * DuckDB oracle.
  *
  * Each invocation builds a FRESH raw/mart database (unique suffix) so
  * output is deterministic per run (seed + fixed batch timestamps), then
  * drops it after materializing the small summary to the driver.
  */
object PipelineQueries {

  val all: Seq[QueryDef] = Seq(g1MockBatch, p1PipelineE2e)

  private val T0 = LocalDateTime.of(2026, 1, 1, 0, 0, 0)

  /** One full generator batch (mock_data.py:116-134 twin): per-table
    * row counts and the distribution invariants as one summary frame.
    */
  private def g1MockBatch = QueryDef.sparkOnly("g1_mock_batch") { (s, _) =>
    val products = MockData.products(s, 42L, T0)
    val customers = MockData.customers(s, 42L, T0)
    val orders = MockData.orders(
      s, 42L, T0, customers.select(col("gen_idx"), col("id")))
    val orderProducts = MockData.orderProducts(s, 42L, T0, products, orders)
    val statuses = orders.groupBy("order_status").count()
      .select(col("order_status").as("k"), col("count"))
    val quantities = orderProducts.groupBy("quantity").count()
      .select(concat(lit("qty_"), col("quantity")).as("k"), col("count"))
    val counts = Seq(
      ("products", products), ("customers", customers),
      ("orders", orders), ("order_products", orderProducts))
      .map { case (n, df) => df.agg(lit(n).as("k"), count(lit(1)).as("count")) }
      .reduce(_ unionByName _)
    counts.unionByName(statuses).unionByName(quantities).orderBy("k")
  }

  /** Bootstrap + refresh + dbt-run + dbt-test end to end
    * (refresh_source_data DAG ↦ dbt run ↦ dbt test, SURVEY §3): returns
    * one row per declared data test plus mart row counts. Materialized
    * eagerly so the scratch database can be dropped.
    */
  private def p1PipelineE2e = QueryDef.sparkOnly("p1_pipeline_e2e") { (s, _) =>
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val rawDb = s"graft_raw_$suffix"
    val martDb = s"graft_mart_$suffix"
    val staging = Files.createTempDirectory(s"graft-stage-$suffix")
    try {
      val ingest = new Ingest(s, rawDb, staging)
      ingest.runBatch(T0)                   // bootstrap branch
      ingest.runBatch(T0.plusMinutes(10))   // refresh branch
      val materialized = Models.dbtRun(s, rawDb, martDb)
      val tests = DataTests.runAll(s, rawDb, materialized)
      val testRows = tests.map(t => (t.name, if (t.passed) 1L else 0L, t.failingRows))
      // all four mart counts in ONE job (same batching as the test suite)
      val martRows = Seq("dim_customer", "dim_order", "dim_product",
        "fct_order_products")
        .map(m => materialized(m)
          .agg(lit(s"rows_$m").as("check"), count(lit(1)).as("n")))
        .reduce(_ unionByName _)
        .collect().map(r => (r.getString(0), 1L, r.getLong(1))).toSeq
      import s.implicits._
      (testRows ++ martRows).toDF("check", "passed", "n").orderBy("check")
        .localCheckpoint() // materialize before dropping the scratch dbs
    } finally {
      s.sql(s"DROP DATABASE IF EXISTS $martDb CASCADE")
      s.sql(s"DROP DATABASE IF EXISTS $rawDb CASCADE")
    }
  }
}
