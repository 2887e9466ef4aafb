package graft.model

import org.apache.spark.sql.types._

/** Declared schemas for the bike-shop data model — the Spark `StructType`
  * twin of the reference's DDL dict (mock_schema.py:1-35). Schemas are
  * fixed and declared up front; loaders never infer (SURVEY.md §1.3).
  *
  * `timestamp_ntz` maps to [[TimestampNTZType]] (SURVEY §1.2); primary
  * keys are UUID4 strings, not integers.
  */
object Schemas {

  val customers: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("first_name", StringType, nullable = true),
    StructField("last_name", StringType, nullable = true),
    StructField("email", StringType, nullable = true),
    StructField("gender", StringType, nullable = true),
    StructField("city", StringType, nullable = true),
    StructField("loaded_at", TimestampNTZType, nullable = true)))

  val products: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("model", StringType, nullable = true),
    StructField("category", StringType, nullable = true),
    StructField("subcategory", StringType, nullable = true),
    StructField("frame", StringType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("product_cost", DoubleType, nullable = true),
    StructField("loaded_at", TimestampNTZType, nullable = true)))

  val orders: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("customer_id", StringType, nullable = true),
    StructField("order_date", DateType, nullable = true),
    StructField("order_status", StringType, nullable = true),
    StructField("loaded_at", TimestampNTZType, nullable = true)))

  val orderProducts: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("product_id", StringType, nullable = true),
    StructField("order_id", StringType, nullable = true),
    StructField("quantity", IntegerType, nullable = true),
    StructField("loaded_at", TimestampNTZType, nullable = true)))

  /** Seed CSV shape before staging renames category1→category,
    * category2→subcategory (mock_data.py:34).
    */
  val productSeed: StructType = StructType(Seq(
    StructField("model", StringType, nullable = true),
    StructField("category1", StringType, nullable = true),
    StructField("category2", StringType, nullable = true),
    StructField("frame", StringType, nullable = true),
    StructField("price", DoubleType, nullable = true)))

  /** Raw table name → schema, in load order. */
  val rawTables: Seq[(String, StructType)] = Seq(
    "products" -> products,
    "customers" -> customers,
    "orders" -> orders,
    "order_products" -> orderProducts)

  /** Parquet DDL for CREATE TABLE IF NOT EXISTS (S6). */
  def ddl(schema: StructType): String = schema.toDDL

  val orderStatuses: Seq[String] = Seq("shipped", "delivered", "refunded")
  val orderStatusWeights: Seq[Int] = Seq(10, 5, 1)
  val itemsPerOrder: Seq[Int] = Seq(1, 2, 3)
  val itemsPerOrderWeights: Seq[Int] = Seq(5, 2, 1)
  val quantities: Seq[Int] = Seq(1, 2, 3)
  val quantityWeights: Seq[Int] = Seq(10, 3, 1)
  val genders: Seq[String] = Seq("F", "M", "X")
  val genderLabels: Map[String, String] =
    Map("F" -> "Female", "M" -> "Male", "X" -> "Non-binary")
}
