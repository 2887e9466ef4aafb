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

  test("index is correct under few-partition AQE coalescing (pid bug)") {
    // regression for the spark_partition_id formulation: with AQE and a
    // small shuffle.partitions the offsets join branch and the data
    // branch could coalesce the range exchange differently, silently
    // corrupting most indices (observed: 3745/5000 wrong at
    // partitions=4). zipWithIndex must index correctly at ANY partition
    // count because both its jobs bind to one RDD lineage.
    import spark.implicits._
    val n = 5000
    val keys = scala.util.Random.shuffle((1 to n).toList).toDF("k")
    for (parts <- Seq(1, 3, 4)) {
      val idx = Indexing.withGlobalIndex(keys, col("k"), "idx", parts)
        .orderBy("k").collect().map(_.getLong(1)).toSeq
      assert(idx === (0L until n.toLong), s"broken at parts=$parts")
    }
  }

  test("withRunningTotal equals the sequential exclusive prefix sum") {
    import spark.implicits._
    val rows = scala.util.Random.shuffle(
      (1 to 1500).map(i => (i.toLong, ((i * 31) % 17).toLong)).toList)
    val df = rows.toDF("k", "w").repartition(9)
    for (parts <- Seq(1, 4, 7)) {
      val got = Indexing
        .withRunningTotal(df, col("k"), col("w"), "cum", parts)
        .select("k", "w", "cum").as[(Long, Long, Long)]
        .collect().sortBy(_._1)
      // sequential oracle: cum(i) = sum of w over keys < k(i)
      var acc = 0L
      val exp = rows.sortBy(_._1).map { case (k, w) =>
        val r = (k, w, acc); acc += w; r
      }
      assert(got.toSeq === exp, s"broken at parts=$parts")
    }
  }

  test("withRunningTotal treats NULL weights as zero") {
    import spark.implicits._
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("k", "w")
    val got = Indexing.withRunningTotal(df, col("k"), col("w"), "cum", 2)
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0L), (2L, 5L), (3L, 5L)))
  }

  test("no single-task global sort of the data in the plan") {
    import spark.implicits._
    val df = (1 to 100).toDF("k")
    val plan = Indexing.withGlobalIndex(df, col("k"), "idx")
      .queryExecution.analyzed.toString
    // the result is built from an RDD produced by range repartition +
    // intra-partition sort + zipWithIndex; no Window/global Sort node
    // may appear anywhere in the indexed frame's own plan
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("LogicalRDD") || plan.contains("ExternalRDD"), plan)
  }
}
