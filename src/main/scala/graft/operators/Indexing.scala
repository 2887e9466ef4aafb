package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable dense global index assignment (the reference's "i-th order
  * gets the i-th customer" alignment, SURVEY.md §2.4 J4 /
  * mock_data.py:56-62), without a single-task global sort.
  *
  * Plan shape: range-repartition by the key (parallel range sort — the
  * same exchange a global ORDER BY would use), per-partition
  * `row_number` over a window PARTITIONED by the physical partition id
  * (parallel), then a broadcast join against the per-partition row
  * counts to turn local row numbers into global dense indices. The only
  * global window runs over the partition-count frame — one row per
  * partition, thousands of rows at most on a large cluster, never the
  * data itself. Every stage is parallel in the data; this survives a
  * 1000-executor 100 TB run where `Window.orderBy` (no partition spec)
  * collapses to one task.
  */
object Indexing {

  /** Adds `idxName` = dense 0-based rank of `key` (which must be
    * duplicate-free; ties could otherwise straddle a range boundary).
    */
  def withGlobalIndex(
      df: DataFrame, key: Column, idxName: String,
      numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val ranged = df
      .repartitionByRange(parts, key)
      .withColumn("__pid", spark_partition_id())
    val localRn = row_number().over(Window.partitionBy(col("__pid")).orderBy(key))
    val local = ranged.withColumn("__rn", localRn)
    // One row per partition: cumulative counts → start offset of each pid.
    val offsets = local
      .groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn(
        "__offset",
        coalesce(
          sum(col("__cnt")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    local
      .join(broadcast(offsets), "__pid")
      .withColumn(idxName, col("__offset") + col("__rn") - 1)
      .drop("__pid", "__rn", "__offset")
  }
}
