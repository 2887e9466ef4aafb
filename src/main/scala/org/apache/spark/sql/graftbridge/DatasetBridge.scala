package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** InternalRow-level DataFrame construction. `internalCreateDataFrame`
  * is `private[sql]` in Spark 4; exposing it here lets the global
  * indexer append its index without round-tripping every row through
  * external objects (UTF8String -> String -> UTF8String re-encoding),
  * which is pure per-row overhead on a 100 TB reorder. Second of the
  * two places the library reaches into Spark-private API (see
  * [[ColumnBridge]]).
  */
object DatasetBridge {
  def internalCreateDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
