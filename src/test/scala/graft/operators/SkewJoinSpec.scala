package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Salted-join semantics: identical results to the plain equi-join on a
  * skewed corpus, and the salt actually spreads the hot key across
  * multiple shuffle partitions.
  */
class SkewJoinSpec extends SparkSpecBase {

  test("saltedEquiJoin equals plain join on a 90%-hot-key corpus") {
    import spark.implicits._
    // 10k facts, 90% on one hot key — the classic straggler shape.
    val fact = spark.range(10000)
      .select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100)
          .as("k"),
        col("id").as("payload"))
    val dim = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "attr")

    val plain = fact.join(dim, Seq("k"))
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "k", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // left-outer keeps unmatched fact rows exactly like the plain join
    val factExtra = fact.unionByName(
      Seq((999L, -1L)).toDF("k", "payload"))
    val plainLeft = factExtra.join(dim, Seq("k"), "left")
    val saltedLeft = SkewJoin.saltedEquiJoin(factExtra, dim, "k",
      salts = 8, joinType = "left")
    assert(saltedLeft.exceptAll(plainLeft).isEmpty &&
      plainLeft.exceptAll(saltedLeft).isEmpty)

    // the hot key's rows really are spread over several salt buckets
    val spread = fact.withColumn("__salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8)))
      .filter(col("k") === 7L)
      .select("__salt").distinct().count()
    assert(spread === 8)

    // hotKeys diagnostic flags exactly the skewed key at this threshold
    val hot = SkewJoin.hotKeys(fact, col("k"), 1000L)
      .collect().map(_.getLong(0)).toSeq
    assert(hot === Seq(7L))
  }
}
