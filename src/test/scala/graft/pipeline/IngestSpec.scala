package graft.pipeline

import java.nio.file.Files

import graft.SparkSpecBase
import graft.models.Models
import graft.quality.DataTests

/** End-to-end pipeline semantics (SURVEY §2.11): bootstrap-vs-refresh
  * branch, append-only raw tables, static products, declared data tests
  * green after multiple batches, mart rebuild.
  */
class IngestSpec extends SparkSpecBase {

  private lazy val staging = Files.createTempDirectory("graft-staging").toString

  test("bootstrap + 2 refreshes: append-only, static products, tests green") {
    val db = "ingest_spec_raw"
    val t0 = java.time.LocalDateTime.of(2026, 1, 1, 0, 0, 0)
    val ingest = new Ingest(spark, db, java.nio.file.Paths.get(staging))
    ingest.runBatch(t0) // bootstrap branch (ST4)
    assert(ingest.rawTable("customers").count() === 1000)
    assert(ingest.rawTable("orders").count() === 1000)
    assert(ingest.rawTable("products").count() === 96)
    val op1 = ingest.rawTable("order_products").count()
    assert(op1 >= 1000 && op1 <= 3000)

    // second + third tick take the refresh branch (ST4)
    ingest.runBatch(t0.plusMinutes(10))
    ingest.runBatch(t0.plusMinutes(20))
    assert(ingest.rawTable("customers").count() === 3000)
    assert(ingest.rawTable("orders").count() === 3000)
    // ST5: products never reloaded after bootstrap
    assert(ingest.rawTable("products").count() === 96)
    val op3 = ingest.rawTable("order_products").count()
    assert(op3 > op1)

    // staged files cleaned up (S9)
    val leftovers = Files.list(java.nio.file.Paths.get(staging)).count()
    assert(leftovers === 0)

    // all declared source tests pass on the accumulated raw tables,
    // including orders.customer_id unique (the J4 quirk holds per batch
    // AND across batches because each batch only references its own new
    // customers)
    val mat = Models.dbtRun(spark, db, "ingest_spec_mart")
    val results = DataTests.runAll(spark, db, mat)
    val failed = results.filterNot(_.passed)
    assert(failed.isEmpty, s"failing tests: ${failed.map(_.name)}")
    assert(results.size === DataTests.allDeclared.size)
  }

  test("mart rebuild matches raw contents after each refresh (ST6)") {
    val db = "ingest_spec2_raw"
    Ingest.runBatches(spark, db, staging, n = 2, seed = 99L)
    val mat = Models.dbtRun(spark, db, "ingest_spec2_mart")
    val fct = mat("fct_order_products")
    assert(fct.count() === spark.table(s"$db.order_products").count())
    assert(mat("dim_customer").count() === 2000)
    assert(mat("dim_order").count() === 2000)
    assert(mat("dim_product").count() === 96)
    // fct carries order/customer/product attributes resolved via left joins
    assert(fct.filter(fct("customer_id").isNull).isEmpty)
    assert(fct.filter(fct("product_price").isNull).isEmpty)
  }
}
