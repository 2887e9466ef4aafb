package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpecBase
import graft.streaming.CustomerState.OrderEvent

/** mapGroupsWithState semantics: keyed state accumulates across
  * micro-batches, each trigger emits updated keys only, and the final
  * state equals the batch aggregation over all events.
  */
class CustomerStateSpec extends SparkSpecBase {

  test("keyed state accumulates across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[OrderEvent]
    val q = CustomerState.runningStats(ms.toDS())
      .toDF()
      .writeStream
      .format("memory").queryName("cust_state").outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // amounts are integral doubles so cross-batch accumulation order
      // cannot introduce floating-point drift in the comparison
      val b1 = Seq(
        OrderEvent("c1", "o1", 10.0), OrderEvent("c1", "o2", 5.0),
        OrderEvent("c2", "o3", 7.0))
      ms.addData(b1: _*)
      q.processAllAvailable()
      val after1 = spark.table("cust_state")
        .groupBy("customer_id")
        .agg(max("n_orders").as("n_orders"), max("total_amount").as("total"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      assert(after1("c1") === ((2L, 15.0)) && after1("c2") === ((1L, 7.0)))

      // second batch updates c1's existing state and creates c3's
      ms.addData(OrderEvent("c1", "o4", 1.0), OrderEvent("c3", "o5", 20.0))
      q.processAllAvailable()
      val finalRows = spark.table("cust_state")
        .groupBy("customer_id")
        .agg(max("n_orders").as("n_orders"), max("total_amount").as("total"))

      val batchTwin = (b1 ++ Seq(
        OrderEvent("c1", "o4", 1.0), OrderEvent("c3", "o5", 20.0))).toDS()
        .groupBy("customer_id")
        .agg(count(lit(1)).as("n_orders"), sum("amount").as("total"))
      assert(finalRows.exceptAll(batchTwin).isEmpty &&
        batchTwin.exceptAll(finalRows).isEmpty)
    } finally q.stop()
  }
}
