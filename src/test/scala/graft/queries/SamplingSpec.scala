package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.gen.MockData
import graft.sources.Tables

/** q12_sample_limit invariants. The sample rule is the deterministic
  * value-hash Bernoulli (hashLong(seed=42, "sample", c_custkey) <
  * ceil(0.05·P)) — oracle-checked for exact membership by the driver —
  * so this spec pins what the hash match alone doesn't state: the
  * ACCEPTANCE RATE is a real 5% Bernoulli (binomial bound on the
  * pre-limit count — a biased hash would still hash-match a DuckDB twin
  * replaying the same bias), plus subset and rerun determinism.
  */
class SamplingSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"
  private val t5 = math.ceil(0.05 * graft.functions.Portable.P).toLong

  test("q12 rows are a subset of customer and rerun-deterministic") {
    val sampled = SparkEntryHook.q12(spark, dir)
    val src = Tables.customer(spark, dir)
    assert(sampled.exceptAll(src).isEmpty)
    val again = SparkEntryHook.q12(spark, dir)
    assert(sampled.exceptAll(again).isEmpty && again.exceptAll(sampled).isEmpty)
  }

  test("pre-limit hash-Bernoulli count within 6-sigma binomial bound") {
    val n = Tables.customer(spark, dir).count()
    val k = Tables.customer(spark, dir)
      .filter(MockData.hashLong(42L, "sample", col("c_custkey")) < t5)
      .count()
    val mean = n * 0.05
    val sd = math.sqrt(n * 0.05 * 0.95)
    assert(math.abs(k - mean) < 6 * sd, s"n=$n k=$k mean=$mean sd=$sd")
  }

  test("limit leg takes the 50 smallest sampled keys, exactly 50 rows") {
    val keys = SparkEntryHook.q12(spark, dir)
      .select(col("c_custkey").cast("long")).collect().map(_.getLong(0))
    assert(keys.length == 50)
    val allSampled = Tables.customer(spark, dir)
      .filter(MockData.hashLong(42L, "sample", col("c_custkey")) < t5)
      .select(col("c_custkey").cast("long"))
      .collect().map(_.getLong(0)).sorted
    assert(keys.sorted.sameElements(allSampled.take(50)))
  }
}

private object SparkEntryHook {
  def q12(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.SparkEntry.queries("q12_sample_limit")(spark, dir)
}
