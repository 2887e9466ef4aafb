package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom per-key operator state over a stream (SURVEY §2.11; the
  * `mapGroupsWithState` surface of the brief's streaming bullet): running
  * per-customer order statistics maintained in Spark's state store across
  * micro-batches.
  *
  * The reference keeps its only cross-batch state IN the warehouse table
  * and re-reads it each tick (sample_table.sql / ST3) — that pattern is
  * [[graft.pipeline.Ingest.returningCustomers]]. This operator is the
  * engine-native alternative for state that must update per micro-batch
  * without a table round-trip: keyed state lives in the checkpointed
  * store, scales with executor count (state is hash-partitioned by key),
  * and survives restarts with the checkpoint.
  */
object CustomerState {

  final case class OrderEvent(
      customer_id: String, order_id: String, amount: Double)

  final case class CustomerStats(
      customer_id: String, n_orders: Long, total_amount: Double)

  private def updateStats(
      cid: String, rows: Iterator[OrderEvent],
      state: GroupState[CustomerStats]): CustomerStats = {
    val prev = state.getOption.getOrElse(CustomerStats(cid, 0L, 0.0))
    var n = prev.n_orders
    var total = prev.total_amount
    rows.foreach { r => n += 1; total += r.amount }
    val next = CustomerStats(cid, n, total)
    state.update(next)
    next
  }

  /** Running stats per customer; on a stream this emits the updated
    * row for every key seen in the micro-batch (use outputMode=update).
    */
  def runningStats(orders: Dataset[OrderEvent]): Dataset[CustomerStats] = {
    import orders.sparkSession.implicits._
    orders
      .groupByKey(_.customer_id)
      .mapGroupsWithState[CustomerStats, CustomerStats](
        GroupStateTimeout.NoTimeout)(updateStats)
  }
}
