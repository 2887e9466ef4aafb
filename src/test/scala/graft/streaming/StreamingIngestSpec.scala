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

  test("crash mid-drain: restart from checkpoint loads nothing twice") {
    val db = "streaming_crash_raw"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Schemas.rawTables.foreach { case (t, sch) =>
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS $db.$t (${sch.toDDL}) USING parquet")
    }
    val root = Files.createTempDirectory("graft-stream-crash")
    val si = new StreamingIngest(spark, db, root)
    val t0 = LocalDateTime.of(2026, 1, 1, 0, 0, 0)

    // three staged files; maxFilesPerTrigger=1 => three micro-batches
    val batches = (0 to 2).map { i =>
      val c = MockData.customers(spark, 42L + i, t0.plusMinutes(i)).drop("gen_idx")
      si.stage("customers", c, s"b$i")
      c
    }

    // Kill the drain AFTER batch 1 is appended + marked but BEFORE Spark's
    // commit log records it — the exact at-least-once redelivery window.
    val boom = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      si.drainOnce(Seq("customers"), maxFilesPerTrigger = Some(1),
        afterBatch = (_, bid) =>
          if (bid == 1) throw new RuntimeException("injected crash"))
    }
    val msgs = Iterator.iterate(boom: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("injected crash")))
    // the crashed drain applied batches 0 and 1 only
    assert(spark.table(s"$db.customers").count() === 2000)

    // restart from the same checkpoint: Spark re-delivers batch 1 (it
    // never committed), the applied-marker skips its re-append, batch 2
    // then loads — total is exactly the 3 staged batches, no duplicates
    si.drainOnce(Seq("customers"), maxFilesPerTrigger = Some(1))
    val loaded = spark.table(s"$db.customers")
    assert(loaded.count() === 3000)
    val expected = batches.reduce(_ unionByName _)
    assert(loaded.exceptAll(expected).isEmpty &&
      expected.exceptAll(loaded).isEmpty)

    // and a further drain with no new files is still a no-op
    si.drainOnce(Seq("customers"), maxFilesPerTrigger = Some(1))
    assert(spark.table(s"$db.customers").count() === 3000)
  }

  test("10-file backlog drains in multiple batches, each bounded by " +
    "maxFilesPerTrigger") {
    // The SCALING.md ingestion lever: an inbox that accumulated a backlog
    // (a paused consumer, a burst producer) must NOT drain as one giant
    // micro-batch — unbounded batch size is how a streaming job that ran
    // fine for months dies on its first restart-after-outage. Each
    // micro-batch is capped at maxFilesPerTrigger staged files, so batch
    // memory/row footprint stays bounded no matter how deep the backlog.
    val db = "streaming_backlog_raw"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Schemas.rawTables.foreach { case (t, sch) =>
      spark.sql(
        s"CREATE TABLE IF NOT EXISTS $db.$t (${sch.toDDL}) USING parquet")
    }
    val root = Files.createTempDirectory("graft-stream-backlog")
    val si = new StreamingIngest(spark, db, root)
    val t0 = LocalDateTime.of(2026, 1, 1, 0, 0, 0)

    // 10 staged files of 1000 rows each — the backlog
    for (i <- 0 until 10)
      si.stage("customers",
        MockData.customers(spark, 100L + i, t0.plusMinutes(i))
          .drop("gen_idx"), s"b$i")

    // after each applied batch, record the cumulative table row count —
    // consecutive deltas are the per-batch row loads
    val cumulative = scala.collection.mutable.ArrayBuffer.empty[Long]
    si.drainOnce(Seq("customers"), maxFilesPerTrigger = Some(3),
      afterBatch = (t, _) => {
        spark.catalog.refreshTable(s"$db.$t")
        cumulative += spark.table(s"$db.$t").count()
      })

    // all rows landed, in ceil(10/3) = 4 bounded batches
    assert(cumulative.last === 10000L)
    assert(cumulative.size === 4,
      s"expected 4 micro-batches for a 10-file backlog at cap 3, " +
        s"got ${cumulative.size}")
    val deltas = (0L +: cumulative.toSeq).sliding(2)
      .map { case Seq(a, b) => b - a }.toSeq
    assert(deltas.forall(_ <= 3000L),
      s"per-batch rows exceeded the 3-file bound: $deltas")
    assert(deltas.count(_ == 3000L) === 3 && deltas.last === 1000L)
  }
}
