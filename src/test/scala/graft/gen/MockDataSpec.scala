package graft.gen

import java.time.LocalDateTime

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.model.Schemas

/** Generator invariants (SURVEY.md §5): distribution ratios, value
  * domains, and partition stability of the seeded randomness.
  */
class MockDataSpec extends SparkSpecBase {

  private val ts = LocalDateTime.of(2026, 1, 1, 0, 0, 0)
  private lazy val products = MockData.products(spark, 42L, ts).cache()
  private lazy val customers = MockData.customers(spark, 42L, ts, 4000).cache()
  private lazy val orders = MockData.orders(
    spark, 42L, ts, customers.select(col("gen_idx"), col("id")), 4000).cache()
  private lazy val orderProducts =
    MockData.orderProducts(spark, 42L, ts, products, orders).cache()

  test("products: 96 rows, uuid ids, cost/price within [0.3, 0.5]") {
    assert(products.count() === 96)
    val uuidRe = "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-a[0-9a-f]{3}-[0-9a-f]{12}$"
    assert(products.filter(!col("id").rlike(uuidRe)).isEmpty)
    val bad = products.filter(
      col("product_cost") / col("price") < 0.3 ||
        col("product_cost") / col("price") > 0.5)
    assert(bad.isEmpty)
    // F5: ONE factor per batch, not per row
    assert(products.select(
      round(col("product_cost") / col("price"), 9)).distinct().count() === 1)
  }

  test("customers: schema, gender domain, distinct emails and ids") {
    assert(customers.drop("gen_idx").schema.fieldNames.toSeq ===
      Schemas.customers.fieldNames.toSeq)
    assert(customers.filter(!col("gender").isin(Schemas.genders: _*)).isEmpty)
    assert(customers.select("id").distinct().count() === 4000)
    assert(customers.select("email").distinct().count() === 4000)
  }

  test("orders: status ratio ~ 10:5:1, dates in trailing 30 days, J4 alignment") {
    val n = orders.count().toDouble
    val byStatus = orders.groupBy("order_status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStatus("shipped") / n - 10.0 / 16) < 0.05)
    assert(math.abs(byStatus("delivered") / n - 5.0 / 16) < 0.05)
    assert(math.abs(byStatus("refunded") / n - 1.0 / 16) < 0.03)
    val outOfRange = orders.filter(
      col("order_date") > lit(java.sql.Date.valueOf(ts.toLocalDate)) ||
        col("order_date") <= date_sub(lit(java.sql.Date.valueOf(ts.toLocalDate)), 30))
    assert(outOfRange.isEmpty)
    // J4: i-th order gets i-th customer => customer_id unique across orders
    assert(orders.select("customer_id").distinct().count() === orders.count())
  }

  test("order_products: items/order ~ 5:2:1, quantity ~ 10:3:1, fks valid") {
    val perOrder = orderProducts.groupBy("order_id").count()
    val n = perOrder.count().toDouble
    val dist = perOrder.groupBy("count").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(math.abs(dist(1L) / n - 5.0 / 8) < 0.05)
    assert(math.abs(dist(2L) / n - 2.0 / 8) < 0.05)
    assert(math.abs(dist(3L) / n - 1.0 / 8) < 0.03)
    val qn = orderProducts.count().toDouble
    val qDist = orderProducts.groupBy("quantity").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(math.abs(qDist(1) / qn - 10.0 / 14) < 0.05)
    assert(math.abs(qDist(2) / qn - 3.0 / 14) < 0.05)
    assert(math.abs(qDist(3) / qn - 1.0 / 14) < 0.03)
    assert(orderProducts.join(products,
      orderProducts("product_id") === products("id"), "left_anti").isEmpty)
    assert(orderProducts.join(orders,
      orderProducts("order_id") === orders("id"), "left_anti").isEmpty)
  }

  test("gaussian product weighting: mid-priced products picked more often") {
    val stats = products.agg(
      median(col("price")).as("med"), stddev_samp(col("price")).as("std"))
      .head()
    val med = stats.getDouble(0)
    val std = stats.getDouble(1)
    val withDist = orderProducts
      .join(products.select(col("id").as("product_id"), col("price")), "product_id")
      .withColumn("near", (abs(col("price") - med) < std / 2).cast("int"))
    val nearShare = withDist.agg(avg(col("near"))).head().getDouble(0)
    // under uniform picking the near-median band share would equal its
    // product share; gaussian weighting must overrepresent it
    val productShare = products
      .withColumn("near", (abs(col("price") - med) < std / 2).cast("int"))
      .agg(avg(col("near"))).head().getDouble(0)
    assert(nearShare > productShare * 1.3,
      s"nearShare=$nearShare productShare=$productShare")
  }

  test("hashLong column matches the pure cubed-affine formula") {
    import org.apache.spark.sql.functions.col
    val P = 1000000007L
    val (a, b) = MockData.mixCoeffs(42L, "pin")
    val rows = MockData.hashLong(42L, "pin", col("id"))
    val got = spark.range(1000).select(col("id"), rows.as("draw"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 1000L).foreach { k =>
      val x = (k % P * a + b) % P
      assert(got(k) === (x * x % P) * x % P)
    }
  }

  test("weighted choices stay near their ratios at BATCH size (1000 keys)") {
    // regression for the affine-only draw: sequential 1000-key batches
    // collapsed to ONE status bucket (Weyl-step correlation); the cubed
    // draw must keep every bucket populated near its weight at the
    // pipeline's actual batch size, not just at 4000
    val o = MockData.orders(spark, 42L, ts,
      MockData.customers(spark, 42L, ts).select(col("gen_idx"), col("id")))
    val n = o.count().toDouble
    val byStatus = o.groupBy("order_status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.size === 3, s"missing status buckets: $byStatus")
    assert(math.abs(byStatus("shipped") / n - 10.0 / 16) < 0.07)
    assert(math.abs(byStatus("delivered") / n - 5.0 / 16) < 0.07)
    assert(byStatus("refunded") > 0)
    val g = MockData.customers(spark, 42L, ts).groupBy("gender").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g.size === 3, s"missing gender buckets: $g")
  }

  test("uuid draws are reduction-independent (ADVICE r3 Unique flake)") {
    // keys k and k + P collide mod the old single modulus P: with one
    // shared reduction every draw collapsed at once and the whole uuid
    // duplicated (~n²/2P per batch). Per-draw prime moduli break this:
    // the same pair must now also collide mod 1000000097 AND 1000000103,
    // impossible for 64-bit integer keys by CRT.
    val P = 1000000007L
    val ids = spark.range(200)
      .select(
        MockData.uuidFromHash(42L, "t", col("id")).as("u1"),
        MockData.uuidFromHash(42L, "t", col("id") + P).as("u2"))
    assert(ids.filter(col("u1") === col("u2")).isEmpty)
    // composite/string path: same item_idx with order ids whose base-31
    // poly hashes may collide must still give distinct uuids; sanity-pin
    // distinctness over a generated batch (order_products ids unique)
    assert(orderProducts.select("id").distinct().count() === orderProducts.count())
  }

  test("partition stability: identical output under different parallelism") {
    val a = MockData.customers(spark, 7L, ts, 500)
    val b = MockData.customers(spark, 7L, ts, 500).repartition(13)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val oa = MockData.orders(spark, 7L, ts, a.select(col("gen_idx"), col("id")), 500)
    val ob = MockData.orders(spark, 7L, ts,
      b.select(col("gen_idx"), col("id")).repartition(17), 500)
    assert(oa.drop("gen_idx").exceptAll(ob.drop("gen_idx")).isEmpty)
  }
}
