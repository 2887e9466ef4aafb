package graft.queries

import graft.SparkSpecBase
import graft.sources.Tables

/** q12_sample_limit invariants (ADVICE: L1 was "untested" — sampling is
  * engine-specific so no DuckDB oracle, but the operator's contract is
  * checkable: output ⊆ source, deterministic under the seed, and the
  * pre-limit Bernoulli count falls inside a binomial bound.
  */
class SamplingSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  test("sample(0.05, seed=42) rows are a subset of customer, deterministic") {
    val sampled = SparkEntryHook.q12(spark, dir)
    val src = Tables.customer(spark, dir)
    assert(sampled.exceptAll(src).isEmpty)
    val again = SparkEntryHook.q12(spark, dir)
    assert(sampled.exceptAll(again).isEmpty && again.exceptAll(sampled).isEmpty)
  }

  test("pre-limit Bernoulli count within 6-sigma binomial bound") {
    val n = Tables.customer(spark, dir).count()
    val k = Tables.customer(spark, dir)
      .sample(withReplacement = false, 0.05, 42).count()
    val mean = n * 0.05
    val sd = math.sqrt(n * 0.05 * 0.95)
    assert(math.abs(k - mean) < 6 * sd, s"n=$n k=$k mean=$mean sd=$sd")
  }
}

private object SparkEntryHook {
  def q12(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.SparkEntry.queries("q12_sample_limit")(spark, dir)
}
