package graft.gen

import java.time.LocalDateTime

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas

/** Seeded, partition-stable mock-data generator — the Spark twin of the
  * reference's "mock API" (mock_data.py:16-156). Matches the reference's
  * schemas and DISTRIBUTIONS, not its byte-exact rows (Python
  * random/Faker sequences are not reproducible outside CPython;
  * SURVEY.md §7.2).
  *
  * Determinism contract: every random draw is a pure function of
  * (seed, row key) via `xxhash64` — never `rand()` — so output is
  * identical across partition counts, executor counts, and reruns.
  * Generation is `spark.range(n)` + column expressions: fully
  * distributed, no driver-side row loops.
  */
object MockData {

  /** Uniform [0,1) derived from hashing `cols` with `seed` —
    * partition-stable by construction (vs `rand(seed)`, which depends on
    * partition layout).
    */
  private val M = 1L << 40
  def hashUnit(seed: Long, cols: Column*): Column =
    pmod(xxhash64((cols :+ lit(seed)): _*), lit(M)).cast("double") / M.toDouble

  /** Deterministic UUID4-shaped id (RFC 4122 version/variant nibbles) from
    * hashing `cols` — the seeded stand-in for fake.uuid4()
    * (mock_data.py:28,44,60,101; SURVEY §2.3 F4).
    */
  def uuidFromHash(seed: Long, cols: Column*): Column = {
    val h1 = lpad(lower(hex(xxhash64((cols :+ lit(seed)): _*))), 16, "0")
    val h2 = lpad(lower(hex(xxhash64((cols :+ lit(seed + 1)): _*))), 16, "0")
    concat(
      substring(h1, 1, 8), lit("-"),
      substring(h1, 9, 4), lit("-4"),
      substring(h1, 14, 3), lit("-a"),
      substring(h2, 1, 3), lit("-"),
      substring(h2, 4, 12))
  }

  /** Weighted categorical choice (SURVEY §2.3 F9): inverse-CDF over a
    * uniform column, compiled to a when-chain.
    */
  def weightedChoice[T](r: Column, values: Seq[T], weights: Seq[Int]): Column = {
    val total = weights.sum.toDouble
    val cum = weights.scanLeft(0)(_ + _).tail.map(_ / total)
    values.zip(cum).init.foldRight(lit(values.last)) { case ((v, c), els) =>
      when(r < c, lit(v)).otherwise(els)
    }
  }

  // ---- Faker-style lookup pools (our own invented values; only the
  // ---- schema and value SETS matter, not realism — SURVEY §7 "hard parts")
  private val FirstNames = Seq(
    "Ada", "Blake", "Casey", "Devon", "Ellis", "Finley", "Gray", "Harper",
    "Indra", "Jules", "Kiran", "Lane", "Morgan", "Noor", "Oakley", "Parker",
    "Quinn", "Reese", "Sage", "Tatum")
  private val LastNames = Seq(
    "Abbott", "Barnes", "Calder", "Dalton", "Ellison", "Frost", "Granger",
    "Holt", "Ingram", "Jensen", "Keller", "Lowell", "Mercer", "North",
    "Olsen", "Price", "Quill", "Rowan", "Sutton", "Thorne")
  private val Cities = Seq(
    "Alder Creek", "Briar Glen", "Cedar Falls", "Dune Harbor", "Elm Hollow",
    "Fern Ridge", "Gale Port", "Hazel Point", "Iron Vale", "Juniper Bay",
    "Kestrel Heights", "Larch Grove", "Maple Bend", "North Quay",
    "Otter Cove", "Pine Bluff")
  private val Domains = Seq("example.com", "example.org", "example.net", "mail.example")

  private def pick(pool: Seq[String], r: Column): Column =
    element_at(
      array(pool.map(lit): _*),
      (r * pool.size).cast("int") + 1)

  // ---- Product seed (S1 twin) ---------------------------------------------
  private val SeedSeries = Seq(
    "Vela", "Corsa", "Strata", "Nimbus", "Kite", "Pacer", "Ridge", "Torrent")
  private val SeedTiers = Seq(
    "Sport", "Comp", "Team", "Elite", "Pro", "Apex",
    "Base", "Core", "Plus", "Max", "LT", "SL")
  private val SeedCats = Seq(
    ("Road", Seq("Elite Road", "Endurance Road", "Gravel")),
    ("Mountain", Seq("Trail", "Cross Country", "Enduro")),
    ("Active", Seq("Fitness", "Urban", "Kids")),
    ("Electric", Seq("E-Road", "E-Mountain", "E-Urban")))
  private val SeedFrames = Seq("Carbon", "Aluminium", "Steel", "Titanium")

  /** Deterministic 96-row product seed with the reference seed file's
    * shape `model,category1,category2,frame,price` (seed_data/
    * products.csv) and a price spread wide enough for the Gaussian
    * weighting (F8) to discriminate.
    */
  def productSeed(spark: SparkSession): DataFrame = {
    val rows = for {
      (series, si) <- SeedSeries.zipWithIndex
      (tier, ti) <- SeedTiers.zipWithIndex
    } yield {
      val i = si * SeedTiers.size + ti
      val (cat, subs) = SeedCats(i % SeedCats.size)
      val price = 450.0 + ((i * 2654435761L) % 97) * 130.0
      (s"$series $tier ${i + 1}", cat, subs(i % subs.size),
        SeedFrames(i % SeedFrames.size), price)
    }
    import spark.implicits._
    rows.toDF("model", "category1", "category2", "frame", "price")
  }

  /** Products from the seed (get_product_data, mock_data.py:16-34): id
    * inserted at position 0 (P4), product_cost = price * ONE uniform draw
    * in [0.3,0.5] for the whole batch (F5 — the reference draws a single
    * factor per run, not per row), loaded_at literal (P5), renames
    * category1/2 (P6).
    */
  def products(spark: SparkSession, seed: Long, batchTs: LocalDateTime): DataFrame = {
    val costFactor = 0.3 + 0.2 * unitDouble(seed, "product_cost_factor")
    val seedDf = productSeed(spark)
    seedDf
      .withColumn("id", uuidFromHash(seed, lit("product"), col("model")))
      .select(col("id") +: Schemas.productSeed.fieldNames.map(col): _*)
      .withColumn("product_cost", col("price") * costFactor)
      .withColumn("loaded_at", lit(batchTs))
      .withColumnsRenamed(Map("category1" -> "category", "category2" -> "subcategory"))
      .select(Schemas.products.fieldNames.map(col): _*)
  }

  /** Driver-side deterministic uniform for batch-level scalars (F5). */
  private def unitDouble(seed: Long, what: String): Double = {
    val h = scala.util.hashing.MurmurHash3.stringHash(what, seed.toInt)
    (h & 0x7fffffffL).toDouble / 0x7fffffffL.toDouble
  }

  /** Customers (build_customer_data, mock_data.py:40-53): 1000 per batch,
    * Faker-style pooled names/cities (F10), passport gender ∈ {F,M,X},
    * derived email. `gen_idx` carries the generation index for J4
    * alignment (dropped before load).
    */
  def customers(
      spark: SparkSession, seed: Long, batchTs: LocalDateTime,
      numCustomers: Int = 1000): DataFrame = {
    spark.range(numCustomers)
      .withColumnRenamed("id", "gen_idx")
      .withColumn("first_name", pick(FirstNames, hashUnit(seed, lit("fn"), col("gen_idx"))))
      .withColumn("last_name", pick(LastNames, hashUnit(seed, lit("ln"), col("gen_idx"))))
      .withColumn("gender",
        weightedChoice(hashUnit(seed, lit("g"), col("gen_idx")),
          Schemas.genders, Seq(48, 48, 4)))
      .withColumn("city", pick(Cities, hashUnit(seed, lit("ct"), col("gen_idx"))))
      .withColumn("email",
        concat(lower(col("first_name")), lit("."), lower(col("last_name")),
          col("gen_idx"), lit("@"),
          pick(Domains, hashUnit(seed, lit("dom"), col("gen_idx")))))
      .withColumn("id", uuidFromHash(seed, lit("customer"), col("gen_idx")))
      .withColumn("loaded_at", lit(batchTs))
      .select(col("gen_idx") +: Schemas.customers.fieldNames.map(col): _*)
  }

  /** Orders (build_order_data, mock_data.py:56-68): the i-th order is
    * assigned the i-th customer of (new ++ existing) — J4's index
    * alignment, here an equi-join on the generation index (no global
    * window; both sides carry a dense index by construction).
    * `customerList` must already expose (gen_idx, customer_id).
    * Status ~ shipped:delivered:refunded = 10:5:1 (F9); order_date
    * uniform in the trailing 30 days (F6).
    */
  def orders(
      spark: SparkSession, seed: Long, batchTs: LocalDateTime,
      customerList: DataFrame, numOrders: Int = 1000): DataFrame = {
    val base = spark.range(numOrders).withColumnRenamed("id", "gen_idx")
      .withColumn("oid", uuidFromHash(seed, lit("order"), col("gen_idx")))
      .withColumn("order_date",
        date_sub(
          lit(java.sql.Date.valueOf(batchTs.toLocalDate)),
          (hashUnit(seed, lit("od"), col("gen_idx")) * 30).cast("int")))
      .withColumn("order_status",
        weightedChoice(hashUnit(seed, lit("os"), col("gen_idx")),
          Schemas.orderStatuses, Schemas.orderStatusWeights))
      .withColumn("loaded_at", lit(batchTs))
    base
      .join(customerList.select(col("gen_idx"), col("id").as("customer_id")),
        Seq("gen_idx"))
      .select(col("gen_idx"), col("oid").as("id"), col("customer_id"),
        col("order_date"), col("order_status"), col("loaded_at"))
  }

  /** Order products (build_order_products_data, mock_data.py:85-109):
    * 1-3 items per order ~ 5:2:1 exploded per order (G2), product picked
    * with probability ∝ norm.pdf(price; median, std) (F8+F9 — inverse
    * CDF against the cumulative weight table of the ≤96-row product dim,
    * broadcast range-join; the tiny dim collect mirrors the reference
    * pulling the product list to the generator), quantity ~ 10:3:1.
    */
  def orderProducts(
      spark: SparkSession, seed: Long, batchTs: LocalDateTime,
      productsDf: DataFrame, ordersDf: DataFrame): DataFrame = {
    // A1/A2: ungrouped median + sample stddev of price.
    val Array(medianPrice, stdPrice) = productsDf
      .agg(median(col("price")), stddev_samp(col("price")))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    // F8 as pure column math — no UDF.
    def pdf(price: Column): Column =
      exp(-pow(price - medianPrice, 2) / (2 * stdPrice * stdPrice)) /
        (stdPrice * math.sqrt(2 * math.Pi))
    val weighted = productsDf
      .select(col("id").as("product_id"), pdf(col("price")).as("w"))
      .collect()
    val total = weighted.map(_.getDouble(1)).sum
    val cum = weighted.scanLeft(("", 0.0, 0.0)) { case ((_, _, hi), r) =>
      (r.getString(0), hi, hi + r.getDouble(1) / total)
    }.tail
    import spark.implicits._
    val cumDf = cum.toSeq.toDF("product_id", "lo", "hi")

    val exploded = ordersDf
      .select(
        col("id").as("order_id"),
        weightedChoice(hashUnit(seed, lit("ni"), col("id")),
          Schemas.itemsPerOrder, Schemas.itemsPerOrderWeights).as("n_items"))
      .select(col("order_id"),
        explode(sequence(lit(1), col("n_items"))).as("item_idx"))
    val r = hashUnit(seed, lit("pp"), col("order_id"), col("item_idx"))
    exploded
      .withColumn("r", r)
      .join(broadcast(cumDf), col("r") >= col("lo") && col("r") < col("hi"))
      .select(
        uuidFromHash(seed, lit("order_product"), col("order_id"), col("item_idx"))
          .as("id"),
        col("product_id"),
        col("order_id"),
        weightedChoice(hashUnit(seed, lit("q"), col("order_id"), col("item_idx")),
          Schemas.quantities, Schemas.quantityWeights).cast("int").as("quantity"),
        lit(batchTs).as("loaded_at"))
  }
}
