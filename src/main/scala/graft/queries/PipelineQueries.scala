package graft.queries

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.gen.MockData
import graft.model.Schemas
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

  val all: Seq[QueryDef] = Seq(g1MockBatch, g2GenBatch, p1PipelineE2e)

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

  /** The generator itself, oracle-proven (VERDICT r7 item 3): one full
    * customers+orders batch (mock_data.py:40-68 twin, seed 42, batch
    * 2026-01-01) dumped row-by-row — the ACTUAL [[MockData.customers]] /
    * [[MockData.orders]] code paths, not a re-derivation — against a
    * DuckDB twin built from the same affine-modular coefficients over
    * `range(1000)`. This upgrades the generator from sbt-pinned (g1's
    * rows-only summary) to hash-green: seeded UUID ids (F4), pooled
    * names/cities/domains (F10), weighted gender/status (F9), trailing-
    * 30-day dates (F6), the J4 index-aligned customer assignment, and
    * the per-batch literal timestamp (F7) all value-checked cross-engine.
    * g1 stays as the distribution summary over the same batch.
    */
  private def g2GenBatch: QueryDef = {
    val seed = 42L
    val key = "gen_idx"
    def poolSql(pool: Seq[String]): String =
      pool.map(v => s"'$v'").mkString("[", ", ", "]")
    // pick() twin: (r * n) int-cast truncation == floor for r >= 0
    def pickSql(u: String, pool: Seq[String]): String =
      s"${poolSql(pool)}[CAST(floor($u * ${pool.size}) AS INT) + 1]"
    // weightedChoice() twin: the same cumulative thresholds, as doubles
    def choiceSql(u: String, values: Seq[String], weights: Seq[Int]): String = {
      val total = weights.sum.toDouble
      val cum = weights.scanLeft(0)(_ + _).tail.map(_ / total)
      val whens = values.zip(cum).init
        .map { case (v, c) => s"WHEN $u < $c THEN '$v'" }.mkString(" ")
      s"CASE $whens ELSE '${values.last}' END"
    }
    def uuidSql(digits: String): String =
      s"substr($digits, 1, 8) || '-' || substr($digits, 9, 4) || '-4' || " +
        s"substr($digits, 13, 3) || '-a' || substr($digits, 16, 3) || '-' || " +
        s"substr($digits, 19, 12)"
    QueryDef.sql(
      "g2_gen_batch",
      s"""WITH idx AS (SELECT CAST(range AS BIGINT) AS gen_idx FROM range(1000)),
         |h AS (SELECT gen_idx,
         |    ${MockData.hashUnitDuck(seed, "fn", key)} AS u_fn,
         |    ${MockData.hashUnitDuck(seed, "ln", key)} AS u_ln,
         |    ${MockData.hashUnitDuck(seed, "g", key)} AS u_g,
         |    ${MockData.hashUnitDuck(seed, "ct", key)} AS u_ct,
         |    ${MockData.hashUnitDuck(seed, "dom", key)} AS u_dom,
         |    ${MockData.hashUnitDuck(seed, "od", key)} AS u_od,
         |    ${MockData.hashUnitDuck(seed, "os", key)} AS u_os,
         |    ${MockData.uuidDuckDigits(seed, "customer", key)} AS cus,
         |    ${MockData.uuidDuckDigits(seed, "order", key)} AS ous
         |  FROM idx),
         |c AS (SELECT gen_idx, u_od, u_os, cus, ous,
         |    ${pickSql("u_fn", MockData.firstNamePool)} AS first_name,
         |    ${pickSql("u_ln", MockData.lastNamePool)} AS last_name,
         |    ${choiceSql("u_g", Schemas.genders, Seq(48, 48, 4))} AS gender,
         |    ${pickSql("u_ct", MockData.cityPool)} AS city,
         |    ${pickSql("u_dom", MockData.domainPool)} AS dom
         |  FROM h)
         |SELECT gen_idx,
         |  ${uuidSql("ous")} AS order_id,
         |  ${uuidSql("cus")} AS customer_id,
         |  first_name, last_name, gender, city,
         |  lower(first_name) || '.' || lower(last_name) ||
         |    CAST(gen_idx AS VARCHAR) || '@' || dom AS email,
         |  DATE '2026-01-01' - CAST(floor(u_od * 30) AS INT) AS order_date,
         |  ${choiceSql("u_os", Schemas.orderStatuses,
             Schemas.orderStatusWeights)} AS order_status,
         |  '2026-01-01 00:00:00' AS loaded_at
         |FROM c ORDER BY gen_idx""".stripMargin) { (s, _) =>
      val customers = MockData.customers(s, seed, T0)
      val orders = MockData.orders(
        s, seed, T0, customers.select(col("gen_idx"), col("id")))
      orders
        .join(
          customers.select(col("gen_idx"), col("first_name"), col("last_name"),
            col("gender"), col("city"), col("email")),
          Seq("gen_idx"))
        .select(col("gen_idx"), col("id").as("order_id"), col("customer_id"),
          col("first_name"), col("last_name"), col("gender"), col("city"),
          col("email"), col("order_date"), col("order_status"),
          date_format(col("loaded_at"), "yyyy-MM-dd HH:mm:ss").as("loaded_at"))
        .orderBy("gen_idx")
    }
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
