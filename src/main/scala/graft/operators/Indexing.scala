package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.LongType

/** Scalable dense global index assignment (the reference's "i-th order
  * gets the i-th customer" alignment, SURVEY.md §2.4 J4 /
  * mock_data.py:56-62), without a single-task global sort.
  *
  * Plan shape: range-repartition by the key (the same parallel exchange
  * a global ORDER BY uses) + per-partition sort, then `zipWithIndex`
  * turns partition-local positions into global dense indices: one count
  * job over the sorted partitions followed by one emit pass with the
  * per-partition offsets closed over. Every stage is parallel in the
  * data; this survives a 1000-executor 100 TB run where
  * `Window.orderBy` (no partition spec) collapses to one task.
  *
  * Why zipWithIndex and not a `spark_partition_id()` window + offset
  * join (the previous formulation): pid is only stable WITHIN one
  * evaluation of one physical plan. With AQE enabled, the offsets
  * branch and the data branch of that join could read the same range
  * shuffle through DIFFERENT adaptive coalescings — observed at
  * shuffle.partitions=4/sf0.1: 3 745 of 5 000 indices off, silently —
  * so row pids and offset pids disagreed. zipWithIndex runs both its
  * jobs against the SAME RDD lineage, whose partitioning AQE never
  * rewrites, so the counts always describe exactly the partitions the
  * emit pass reads.
  */
object Indexing {

  /** Adds `idxName` = dense 0-based rank of `key` (which must be
    * duplicate-free; ties could otherwise straddle a range boundary).
    */
  def withGlobalIndex(
      df: DataFrame, key: Column, idxName: String,
      numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val sorted = df.repartitionByRange(parts, key).sortWithinPartitions(key)
    val schema = sorted.schema.add(idxName, LongType, nullable = false)
    // InternalRow path (DatasetBridge): appending the index via external
    // Rows would decode/re-encode every value per row (UTF8String <->
    // String etc.) — measurable overhead on a corpus-wide reorder. The
    // .copy() is required: the scan iterator reuses its UnsafeRow, and
    // zipWithIndex both buffers rows and re-reads the lineage for its
    // count job.
    val indexed = sorted.queryExecution.toRdd
      .map(_.copy()).zipWithIndex()
      .map { case (row, idx) =>
        new JoinedRow(row, new GenericInternalRow(Array[Any](idx))): InternalRow
      }
    DatasetBridge.internalCreateDataFrame(spark, indexed, schema)
  }

  /** Adds `cumName` = EXCLUSIVE global prefix sum of `weight` in `key`
    * order (sum of all strictly-preceding rows' weights; first row gets
    * 0) — the weighted generalization of [[withGlobalIndex]], and the
    * primitive behind token-budget sharding / sequence packing.
    *
    * Same two-job shape and the same AQE-safety argument as
    * zipWithIndex: a per-partition totals job and an emit job both bind
    * to ONE RDD lineage (partitioning AQE never rewrites), so the
    * offsets always describe exactly the partitions the emit pass
    * reads — never a `spark_partition_id()` join across plan branches.
    * The totals job collects one long per partition; every data-bearing
    * stage is parallel.
    */
  def withRunningTotal(
      df: DataFrame, key: Column, weight: Column, cumName: String,
      numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.coalesce
    import org.apache.spark.sql.functions.lit
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val tagged = df.withColumn("__w",
      coalesce(weight.cast(LongType), lit(0L)))
    val sorted = tagged.repartitionByRange(parts, key)
      .sortWithinPartitions(key)
    val wIdx = sorted.schema.fieldIndex("__w")
    val rdd = sorted.queryExecution.toRdd.map(_.copy())
    val totals = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(wIdx))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(cumName, LongType, nullable = false)
    val emitted = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { row =>
        val out = new JoinedRow(row,
          new GenericInternalRow(Array[Any](acc))): InternalRow
        acc += row.getLong(wIdx)
        out
      }
    }
    DatasetBridge.internalCreateDataFrame(spark, emitted, schema)
      .drop("__w")
  }
}
