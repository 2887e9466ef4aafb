package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class IndexingSpec extends SparkSpecBase {

  test("withGlobalIndex equals rank order by key, dense from 0") {
    import spark.implicits._
    val keys = scala.util.Random.shuffle((1 to 977).map(_ * 3)).toDF("k")
      .repartition(7)
    val indexed = Indexing.withGlobalIndex(keys, col("k"), "idx", 5)
    val rows = indexed.orderBy("idx").collect()
    assert(rows.map(_.getInt(0)).toSeq === (1 to 977).map(_ * 3))
    assert(rows.map(_.getLong(1)).toSeq === (0L until 977L))
  }

  test("no single-task global sort of the data in the plan") {
    import spark.implicits._
    val df = (1 to 100).toDF("k")
    val plan = Indexing.withGlobalIndex(df, col("k"), "idx")
      .queryExecution.executedPlan.toString
    // the data-side window must be partitioned by __pid; an unpartitioned
    // window over the data would render as "Window [... ORDER BY ...]"
    // with an empty partition spec feeding the full input
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty)
    assert(windowLines.exists(_.contains("__pid")),
      s"expected pid-partitioned window in:\n$plan")
  }
}
