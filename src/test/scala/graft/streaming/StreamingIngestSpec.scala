package graft.streaming

import java.nio.file.Files
import java.time.LocalDateTime

import graft.SparkSpecBase
import graft.gen.MockData
import graft.model.Schemas

/** Streaming-ingest semantics (SURVEY §2.11 ST1/ST2 streaming option):
  * AvailableNow drains are exactly-once over staged files, and the
  * streaming path lands IDENTICAL table contents to the batch load path.
  */
class StreamingIngestSpec extends SparkSpecBase {

  test("AvailableNow drain: exactly-once file tracking, identical to batch") {
    val db = "streaming_spec_raw"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Schemas.rawTables.foreach { case (t, sch) =>
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS $db.$t (${sch.toDDL}) USING parquet")
    }
    val root = Files.createTempDirectory("graft-stream")
    val si = new StreamingIngest(spark, db, root)
    val t0 = LocalDateTime.of(2026, 1, 1, 0, 0, 0)

    val c1 = MockData.customers(spark, 42L, t0).drop("gen_idx")
    si.stage("customers", c1, "b0")
    si.drainOnce(Seq("customers"))
    assert(spark.table(s"$db.customers").count() === 1000)

    // exactly-once (ST2): re-drain with no new files appends nothing
    si.drainOnce(Seq("customers"))
    assert(spark.table(s"$db.customers").count() === 1000)

    // a second staged batch appends exactly its rows
    val c2 = MockData.customers(spark, 43L, t0.plusMinutes(10)).drop("gen_idx")
    si.stage("customers", c2, "b1")
    si.drainOnce(Seq("customers"))
    assert(spark.table(s"$db.customers").count() === 2000)

    // streaming-loaded contents == the generated batches (the same TSV
    // round-trip + declared-schema read the batch loadFile path performs)
    val expected = c1.unionByName(c2)
    val loaded = spark.table(s"$db.customers")
    assert(loaded.exceptAll(expected).isEmpty &&
      expected.exceptAll(loaded).isEmpty)
  }
}
