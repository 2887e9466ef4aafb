package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Pins q17's manual gap sessionization (lag + running sum, the
  * DuckDB-oracle-checkable form) against Spark's NATIVE session_window
  * operator over the real events table: same 30-minute gap rule, so the
  * (user, session) multiset of event counts and start timestamps must
  * be identical. session_window is the streaming-capable form of the
  * operator (it runs unchanged under readStream + withWatermark), so
  * this equivalence carries q17's oracle-proven semantics over to the
  * streaming runtime.
  */
class SessionWindowSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("q17 gap sessionization equals native session_window") {
    val native = graft.sources.Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"))
      .select(col("user_id"), col("n_events"), col("session_start"))
    val manual = graft.SparkEntry.queries("q17_sessionize")(spark, dir)
      .select(col("user_id"), col("n_events"), col("session_start"))
    assert(native.exceptAll(manual).isEmpty && manual.exceptAll(native).isEmpty)
  }
}
