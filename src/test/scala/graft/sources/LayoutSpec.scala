package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Write-layout contracts: hive partitioning must yield directory
  * pruning (PartitionFilters, zero rows scanned from pruned dirs) and
  * controlled file counts; bucketed tables must join with no exchange.
  */
class LayoutSpec extends SparkSpecBase {

  test("partitioned write prunes directories and bounds file counts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_layout").toString + "/docs"
    val df = (0 until 3000).map { i =>
      (i.toLong, s"lang${i % 3}", s"text body $i", (i % 7).toLong)
    }.toDF("doc_id", "lang", "text", "score")
    Layout.writePartitioned(df, dir, Seq("lang"), filesPerPart = 2)

    val back = spark.read.parquet(dir)
    assert(back.count() === 3000)
    // file-count contract: BOUNDED by filesPerPart per directory (hash
    // spread can merge groups into one task, never split them) — the
    // property that prevents the small-files spray, where every task
    // writes a sliver into every partition directory
    for (l <- 0 until 3) {
      val files = new java.io.File(s"$dir/lang=lang$l")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length >= 1 && files.length <= 2, s"lang$l")
    }
    // pruning contract: a lang filter becomes a PartitionFilter on the
    // scan (pruned before IO), not a post-scan data filter
    val q = back.filter(col("lang") === "lang1")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan)
    assert(q.count() === 1000)
  }

  test("same-bucketing tables join with no exchange") {
    import spark.implicits._
    val facts = (0 until 5000)
      .map(i => (i.toLong % 500, i.toLong)).toDF("k", "v1")
    val dims = (0 until 500).map(i => (i.toLong, s"d$i")).toDF("k", "d")
    Layout.writeBucketed(facts, "graft_bkt_fact", "k", 8)
    Layout.writeBucketed(dims, "graft_bkt_dim", "k", 8)
    // disable broadcast so the join would otherwise need shuffle
    // exchanges on both sides; bucketing must make it exchange-free
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Layout.bucketedJoin(spark, "graft_bkt_fact", "graft_bkt_dim", "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(j.count() === 5000)
      // bucket layout: 8 files per table
      assert(spark.table("graft_bkt_fact").inputFiles.length === 8)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_fact")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dim")
    }
  }

  test("join-driven dynamic partition pruning reaches the fact scan") {
    import spark.implicits._
    // Static pruning (above) needs the filter ON the partition column;
    // the production shape is a fact ⋈ dim join where the selective
    // filter sits on the DIM — only DPP can prune the fact's partition
    // directories from the dim's filtered keys at runtime. At 100 TB
    // this is the difference between scanning one date range and
    // scanning the table.
    val dir = Files.createTempDirectory("graft_dpp").toString + "/fact"
    val fact = (0 until 8000)
      .map(i => (i.toLong % 20, i.toLong)).toDF("k", "v")
    Layout.writePartitioned(fact, dir, Seq("k"))
    // dim key INT to match the directory-inferred partition type (a
    // cast on the partition column's join side defeats DPP), and dim
    // FILE-BACKED: a filter over a local relation constant-folds away,
    // leaving no selective predicate for the pruning rule to see
    val dimDir = Files.createTempDirectory("graft_dpp_dim").toString + "/dim"
    (0 until 20).map(k => (k, k % 4)).toDF("k", "grp")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val j = spark.read.parquet(dir)
      .join(dim.filter(col("grp") === 0), "k")
    assert(j.count() === 2000) // 5 of 20 partitions survive
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(4000))
  }

  test("writeBucketed survives a stale warehouse location (fresh catalog)") {
    import spark.implicits._
    // A prior JVM's managed-table dir with no catalog entry behind it:
    // saveAsTable(Overwrite) alone fails LOCATION_ALREADY_EXISTS here.
    val table = "graft_bkt_stale"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(wh, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(loc, "stale-part"))
    try {
      val df = (0 until 100).map(i => (i.toLong, i * 2L)).toDF("k", "v")
      Layout.writeBucketed(df, table, "k", 4)
      assert(spark.table(table).count() === 100)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      fs.delete(loc, true)
    }
  }

  test("writeBucketedIfStale reuses on match, rebuilds on changed source " +
    "at equal row count") {
    import spark.implicits._
    val table = "graft_bkt_marker"
    val src = Files.createTempDirectory("graft_marker").toString + "/src"
    def write(tagText: String): Unit =
      (0 until 100).map(i => (i.toLong, s"$tagText-$i"))
        .toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(src)
    try {
      write("aaaa")
      val df1 = spark.read.parquet(src)
      assert(Layout.writeBucketedIfStale(
        df1, table, "k", 4, Layout.scanFingerprint(df1)), "first build")
      val files1 = spark.table(table).inputFiles.toSeq.sorted

      // unchanged source: marker matches, NO rebuild, same files
      val df2 = spark.read.parquet(src)
      assert(!Layout.writeBucketedIfStale(
        df2, table, "k", 4, Layout.scanFingerprint(df2)), "reuse")
      assert(spark.table(table).inputFiles.toSeq.sorted === files1)

      // changed contents at EQUAL row count — the case a count-equality
      // freshness check silently reuses stale buckets on
      write("bbbbbbbb")
      val df3 = spark.read.parquet(src)
      assert(Layout.writeBucketedIfStale(
        df3, table, "k", 4, Layout.scanFingerprint(df3)),
        "equal-count content change must rebuild")
      assert(spark.table(table).filter(col("v").startsWith("bbbbbbbb"))
        .count() === 100, "rebuilt table must carry the new contents")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("writePartitionedIfStale: marker reuse, rebuild on change; the " +
    "e64 probe join dynamically prunes index partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_pidx").toString
    val src = s"$dir/src"
    val idx = s"$dir/idx"
    def write(n: Int): Unit =
      (0 until n).map(i => (i.toLong, i.toLong % 8))
        .toDF("vec_id", "list_id").coalesce(1)
        .write.mode("overwrite").parquet(src)
    write(400)
    val df1 = spark.read.parquet(src)
    assert(Layout.writePartitionedIfStale(
      df1, idx, Seq("list_id"), Layout.scanFingerprint(df1)), "first build")
    val files1 = spark.read.parquet(idx).inputFiles.toSeq.sorted
    // marker fresh: no rewrite, identical files
    val df2 = spark.read.parquet(src)
    assert(!Layout.writePartitionedIfStale(
      df2, idx, Seq("list_id"), Layout.scanFingerprint(df2)), "reuse")
    assert(spark.read.parquet(idx).inputFiles.toSeq.sorted === files1)
    // source change (same layout path) → rebuild
    write(500)
    val df3 = spark.read.parquet(src)
    assert(Layout.writePartitionedIfStale(
      df3, idx, Seq("list_id"), Layout.scanFingerprint(df3)), "rebuild")
    assert(spark.read.parquet(idx).count() === 500)
    // the e64 probe shape: selective filter on one side of a
    // partition-column self-join → DPP subquery on the scan
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val ix = s2.read.parquet(idx)
    val probe = ix.filter(col("vec_id") % 97 === 5)
      .select(col("vec_id").as("query_id"), col("list_id").as("qlist"))
    val plan = probe.as("q")
      .join(ix.as("i"), col("qlist") === col("i.list_id") &&
        col("query_id") =!= col("i.vec_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan.take(4000))
  }

  test("writeBucketed handles db.tbl names (stale-location cleanup aims " +
    "at <db>.db/<tbl>); rejects deeper qualification") {
    import spark.implicits._
    val df = (0 until 10).map(i => (i.toLong, i * 2L)).toDF("k", "v")
    val db = "graft_bkt_qdb"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      // twice: the second write exercises the stale-location cleanup on
      // the database-scoped managed path (the bug the old unqualified-
      // only guard existed to prevent)
      Layout.writeBucketed(df, s"$db.graft_bkt_q", "k", 4)
      Layout.writeBucketed(df, s"$db.graft_bkt_q", "k", 4)
      assert(spark.table(s"$db.graft_bkt_q").count() === 10)
      val loc = spark.sql(s"DESCRIBE EXTENDED $db.graft_bkt_q")
        .where(col("col_name") === "Location")
        .head().getString(1)
      assert(loc.contains(s"$db.db/graft_bkt_q"),
        s"managed location not database-scoped: $loc")
    } finally spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    intercept[IllegalArgumentException] {
      Layout.writeBucketed(df, "cat.somedb.graft_bkt_q", "k", 4)
    }
  }

  test("z-ordered write yields tight 2-D bounding boxes per file") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zord").toString + "/ev"
    // full 64x64 grid, shuffled arrival order
    val pts = scala.util.Random.shuffle(
      (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
        .toList)
    Layout.writeZOrdered(pts.toDF("x", "y"), dir, "x", "y",
      files = 16, bits = 6)
    val back = spark.read.parquet(dir)
    assert(back.count() === 4096)
    // per-file bounding boxes: a perfect 16-way morton split is one
    // 16x16 block per file (area 256); range-sampling boundary jitter
    // can straddle blocks, so assert within 4x of ideal — versus a
    // row-major sort whose every file spans the full y axis (area 4096/
    // 16 * 64 / 4 = far above this bound on the x*y product)
    val boxes = back.groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("n"))
      .collect()
    assert(boxes.length === 16)
    boxes.foreach { r =>
      val area = (r.getLong(2) - r.getLong(1) + 1) *
        (r.getLong(4) - r.getLong(3) + 1)
      assert(area <= 1024, s"file ${r.getString(0)}: bbox area $area")
    }
    // pruning property the boxes imply: a point predicate on BOTH dims
    // overlaps few files' boxes (file-skipping from 1-D stats)
    val hit = boxes.count(r =>
      r.getLong(1) <= 40 && 40 <= r.getLong(2) &&
        r.getLong(3) <= 10 && 10 <= r.getLong(4))
    assert(hit <= 4, s"$hit files overlap a point predicate")
  }

  test("compact rewrites a small-files directory to the sized file count") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate incremental appends: 8 tiny writes -> many small files
    for (b <- 0 until 8)
      (b * 100 until (b + 1) * 100).map(i => (i.toLong, s"row $i"))
        .toDF("id", "s").repartition(4)
        .write.mode("append").parquet(dir)
    val before = spark.read.parquet(dir).inputFiles.length
    assert(before >= 16, s"expected many small files, got $before")

    val n = Layout.compact(spark, dir, targetBytes = 1L << 40)
    assert(n === 1)
    val back = spark.read.parquet(dir)
    assert(back.inputFiles.length === 1)
    assert(back.count() === 800)
    assert(back.agg(sum("id")).head.getLong(0) === (0L until 800L).sum)
    // failure-isolation contract: no leftover scratch or aside dir
    assert(!new java.io.File(dir + "__compacting").exists())
    assert(!new java.io.File(dir + "__old").exists())
  }

  test("bloom-filtered write carries bloom offsets for the keyed column " +
    "only, and lookups stay exact for present and absent keys") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bloom").toString + "/t"
    val df = (0L until 2000L)
      .map(i => (i, (i * 2654435761L) % 1000000007L))
      .toDF("id", "fp")
    Layout.writeBloomFiltered(df, dir, Seq("fp"), expectedNdv = 2000L,
      files = 2)

    // footer contract: every row group's fp chunk has a bloom filter,
    // and the un-keyed id chunk has none
    val conf = new org.apache.hadoop.conf.Configuration()
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet"))
    assert(parts.nonEmpty)
    var fpChunks = 0
    parts.foreach { f =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        rdr.getRowGroups.forEach { bm =>
          bm.getColumns.forEach { cc =>
            val name = cc.getPath.toDotString
            if (name == "fp") {
              assert(cc.getBloomFilterOffset >= 0,
                s"fp chunk in ${f.getName} has no bloom filter")
              fpChunks += 1
            } else {
              assert(cc.getBloomFilterOffset < 0,
                s"$name unexpectedly carries a bloom filter")
            }
          }
        }
      } finally rdr.close()
    }
    assert(fpChunks > 0)

    // plain write: no bloom anywhere (the option is opt-in per column)
    val plainDir = Files.createTempDirectory("graft-plain").toString + "/t"
    df.write.parquet(plainDir)
    val pf = new java.io.File(plainDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val prdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(pf.getAbsolutePath), conf))
    try prdr.getRowGroups.forEach(_.getColumns.forEach(cc =>
      assert(cc.getBloomFilterOffset < 0)))
    finally prdr.close()

    // lookup correctness: a present key returns its row, an absent key
    // returns zero rows (false positives only cost skipping, never
    // results — parquet re-checks the predicate on surviving pages)
    val back = spark.read.parquet(dir)
    val presentKey = (42L * 2654435761L) % 1000000007L
    assert(back.filter(col("fp") === presentKey).select("id")
      .as[Long].collect().toSeq === Seq(42L))
    assert(back.filter(col("fp") === -1L).count() === 0L)
  }

  /** Per-row-group bloom offsets of column `c` across every parquet part
    * under `dir`: (chunks with a filter, chunks without).
    */
  private def bloomChunkCounts(dir: String, c: String): (Int, Int) = {
    val conf = new org.apache.hadoop.conf.Configuration()
    var withF = 0
    var without = 0
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach { f =>
        val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
        try rdr.getRowGroups.forEach(_.getColumns.forEach { cc =>
          if (cc.getPath.toDotString == c) {
            if (cc.getBloomFilterOffset >= 0) withF += 1 else without += 1
          }
        })
        finally rdr.close()
      }
    (withF, without)
  }

  test("compact preserves the bloom layout contract (VERDICT r12 #1): " +
    "offsets survive the rewrite and lookups stay exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bloomc").toString + "/t"
    // small-files accumulation on a bloom-keyed table: 6 appends
    val df = (0L until 3000L)
      .map(i => (i, (i * 2654435761L) % 1000000007L))
      .toDF("id", "fp")
    Layout.writeBloomFiltered(df, dir, Seq("fp"), expectedNdv = 3000L,
      files = 6)
    val (pre, preMissing) = bloomChunkCounts(dir, "fp")
    assert(pre > 0 && preMissing === 0)

    val n = Layout.compact(spark, dir, targetBytes = 1L << 40)
    assert(n === 1)
    // the r12 failure mode: the rewrite dropped every bloom filter
    // (correct rows, full-scan lookups). Now the contract re-applies.
    val (post, postMissing) = bloomChunkCounts(dir, "fp")
    assert(post > 0, "compact dropped the bloom filters")
    assert(postMissing === 0)
    // contract survives REPEATED compaction (marker re-written)
    assert(Layout.readLayoutContract(spark, dir)
      .exists(_.get("kind").contains("bloom")))
    val back = spark.read.parquet(dir)
    val presentKey = (42L * 2654435761L) % 1000000007L
    assert(back.filter(col("fp") === presentKey).select("id")
      .as[Long].collect().toSeq === Seq(42L))
    assert(back.count() === 3000L)
  }

  test("compact preserves z-order clustering: file bounding boxes stay " +
    "tight instead of degrading to full-span round-robin") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zordc").toString + "/ev"
    val pts = scala.util.Random.shuffle(
      (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
        .toList)
    Layout.writeZOrdered(pts.toDF("x", "y"), dir, "x", "y",
      files = 16, bits = 6)
    // size targetBytes so the rewrite lands on ~4 files
    val total = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val n = Layout.compact(spark, dir, targetBytes = total / 4 + 1)
    assert(n >= 2 && n <= 6, s"n=$n")

    val back = spark.read.parquet(dir)
    assert(back.count() === 4096)
    val boxes = back.groupBy(input_file_name().as("f"))
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
    assert(boxes.length === n)
    // a round-robin rewrite gives every file the full 64x64 span
    // (area 4096); a preserved morton order gives ~(4096/n) per file.
    // Allow 4x for range-boundary jitter.
    boxes.foreach { r =>
      val area = (r.getLong(2) - r.getLong(1) + 1) *
        (r.getLong(4) - r.getLong(3) + 1)
      assert(area <= 4 * (4096 / n), s"file ${r.getString(0)}: area $area")
    }
    assert(Layout.readLayoutContract(spark, dir)
      .exists(_.get("kind").contains("zorder")))
  }

  test("compact refuses a hive-partitioned root (flattening guard)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_partc").toString + "/t"
    val df = (0 until 100).map(i => (i.toLong, s"p${i % 3}"))
      .toDF("id", "part")
    Layout.writePartitioned(df, dir, Seq("part"))
    val e = intercept[IllegalArgumentException](
      Layout.compact(spark, dir))
    assert(e.getMessage.contains("hive-partitioned"))
    assert(e.getMessage.contains("compactPartitioned"),
      "refusal must point at the library remedy")
    // data untouched by the refusal
    assert(spark.read.parquet(dir).count() === 100)
    // a LEAF partition directory is plain by construction and compacts
    val leaf = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part=")).head.getAbsolutePath
    Layout.compact(spark, leaf, targetBytes = 1L << 40)
    assert(spark.read.parquet(dir).count() === 100)
  }

  test("compactPartitioned compacts every leaf under the recorded " +
    "contract: scheme, marker, and pruning survive (VERDICT r13 #2)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_partcp").toString + "/t"
    val df = (0 until 3000).map { i =>
      (i.toLong, s"lang${i % 3}", s"text body $i")
    }.toDF("doc_id", "lang", "text")
    // small-files state: 4 files per leaf
    Layout.writePartitioned(df, dir, Seq("lang"), filesPerPart = 4)
    val before = spark.read.parquet(dir)
      .orderBy("doc_id").collect().toSeq

    val n = Layout.compactPartitioned(spark, dir, targetBytes = 1L << 40)
    assert(n === 3, "one sized rewrite per leaf")

    // directory scheme preserved: same three lang= leaves, ONE parquet
    // file each, no stray aside/compacting dirs anywhere
    val root = new java.io.File(dir)
    val leaves = root.listFiles().filter(_.isDirectory).map(_.getName)
    assert(leaves.sorted.toSeq ===
      Seq("lang=lang0", "lang=lang1", "lang=lang2"))
    for (l <- leaves) {
      val files = new java.io.File(s"$dir/$l").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, l)
    }
    assert(!root.listFiles().exists(f =>
      f.getName.startsWith("_compacting_") ||
        f.getName.startsWith("_old_")))

    // contract marker survives (repeated maintenance keeps working)
    assert(Layout.readLayoutContract(spark, dir)
      .exists(_.get("kind").contains("partitioned")))

    // rows and values identical; pruning still reaches the scan
    val back = spark.read.parquet(dir)
    assert(back.orderBy("doc_id").collect().toSeq === before)
    val q = back.filter(col("lang") === "lang1")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan)
    assert(q.count() === 1000)

    // second compact over the compacted table is a no-op-shaped pass
    assert(Layout.compactPartitioned(spark, dir,
      targetBytes = 1L << 40) === 3)

    // crash recovery: a stale '_'-prefixed aside dir from a killed run
    // is recovery state, not a partition — the pass compacts the 3
    // real leaves and the owning leaf's pre-step clears its aside
    // (the leaf's '=' is percent-encoded in the recovery name so a
    // populated aside can never be read as a hive dir)
    val stale = new java.io.File(s"$dir/_old_lang%3Dlang1")
    assert(stale.mkdir())
    assert(Layout.compactPartitioned(spark, dir,
      targetBytes = 1L << 40) === 3)
    assert(!stale.exists(), "stale aside cleared by the leaf's pre-step")
    assert(spark.read.parquet(dir).count() === 3000)

    // a GENUINE partition value that merely ends in a recovery-ish
    // suffix is a real leaf — compacted, never deleted (the aside
    // naming is '_'-prefixed siblings precisely so hive values can
    // never collide with crash state)
    val dir2 = Files.createTempDirectory("graft_partcp3").toString + "/t"
    val df2 = (0 until 200)
      .map(i => (i.toLong, if (i % 2 == 0) "done" else "done__old"))
      .toDF("id", "status")
    Layout.writePartitioned(df2, dir2, Seq("status"), filesPerPart = 2)
    assert(Layout.compactPartitioned(spark, dir2,
      targetBytes = 1L << 40) === 2)
    assert(spark.read.parquet(dir2).count() === 200)
    assert(spark.read.parquet(dir2)
      .filter(col("status") === "done__old").count() === 100)

    // a plain (non-partitioned) table is refused toward compact
    val plainDir = Files.createTempDirectory("graft_partcp2")
      .toString + "/p"
    df.write.parquet(plainDir)
    val e2 = intercept[IllegalArgumentException](
      Layout.compactPartitioned(spark, plainDir))
    assert(e2.getMessage.contains("use compact"))
  }

  test("compactPartitioned heals an orphaned aside dir: a crash between " +
    "the two swap renames leaves the partition's only data in " +
    "_old_<leaf>, and the next pass restores + compacts it (r14 ADVICE)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_partcr").toString + "/t"
    val df = (0 until 900).map { i =>
      (i.toLong, s"lang${i % 3}", s"body $i")
    }.toDF("doc_id", "lang", "text")
    Layout.writePartitioned(df, dir, Seq("lang"), filesPerPart = 3)
    val before = spark.read.parquet(dir).orderBy("doc_id").collect().toSeq

    // simulate the crash state: leaf moved aside, rewrite present but
    // never published — reads keep working (the encoded recovery name
    // is filtered by the file index even though it holds real parquet;
    // an unencoded `_old_lang=lang1` would fail EVERY read of the
    // table with CONFLICTING_PARTITION_COLUMN_NAMES), but the
    // partition's rows are gone from query results until healed
    val root = new java.io.File(dir)
    val leaf = new java.io.File(root, "lang=lang1")
    val aside = new java.io.File(root, "_old_lang%3Dlang1")
    assert(leaf.renameTo(aside), "test setup: move leaf aside")
    val tmp = new java.io.File(root, "_compacting_lang%3Dlang1")
    assert(tmp.mkdir())
    Files.writeString(tmp.toPath.resolve("garbage.bin"), "not parquet")
    assert(spark.read.parquet(dir).count() === 600,
      "precondition: the orphaned partition is invisible, the table " +
        "still readable")

    // the next maintenance pass heals it and compacts all 3 leaves
    assert(Layout.compactPartitioned(spark, dir,
      targetBytes = 1L << 40) === 3)
    assert(leaf.isDirectory, "leaf restored from the aside dir")
    assert(!aside.exists() && !tmp.exists(),
      "crash state fully cleared (stale rewrite discarded)")
    assert(spark.read.parquet(dir).orderBy("doc_id").collect().toSeq
      === before, "no row lost or changed through crash + heal")

    // LEGACY crash state (the pre-escape naming, raw '=' in the dir
    // name): a populated raw-named aside beside a LIVE leaf is read by
    // partition inference as a conflicting hive dir and fails every
    // scan — the heal must clear it even though the current swap
    // protocol never writes that name
    val rawAside = new java.io.File(root, "_old_lang=lang2")
    assert(rawAside.mkdir())
    spark.range(3).toDF("doc_id").write
      .parquet(rawAside.getAbsolutePath + "/junk")
    val rawTmp = new java.io.File(root, "_compacting_lang=lang0")
    assert(rawTmp.mkdir())
    Files.writeString(rawTmp.toPath.resolve("part.bin"), "junk")
    intercept[Exception](spark.read.parquet(dir).count())
    assert(Layout.compactPartitioned(spark, dir,
      targetBytes = 1L << 40) === 3)
    assert(!rawAside.exists() && !rawTmp.exists(),
      "legacy raw-named crash state must be cleared")
    assert(spark.read.parquet(dir).orderBy("doc_id").collect().toSeq
      === before, "table healthy after legacy-state heal")

    // ... and a legacy raw-named ORPHAN (leaf absent) restores
    val leaf0 = new java.io.File(root, "lang=lang0")
    val rawOrphan = new java.io.File(root, "_old_lang=lang0")
    assert(leaf0.renameTo(rawOrphan), "test setup: legacy orphan")
    assert(Layout.compactPartitioned(spark, dir,
      targetBytes = 1L << 40) === 3)
    assert(leaf0.isDirectory && !rawOrphan.exists())
    assert(spark.read.parquet(dir).orderBy("doc_id").collect().toSeq
      === before, "no row lost through the legacy-orphan heal")
  }

  test("compactPartitioned parallel fan-out (default pool) and the " +
    "sequential pass produce identical tables (VERDICT r14 #4)") {
    import spark.implicits._
    val df = (0 until 4000).map { i =>
      (i.toLong, s"s${i % 8}", s"payload $i")
    }.toDF("id", "shard", "payload")
    val dirPar = Files.createTempDirectory("graft_pfan").toString + "/t"
    val dirSeq = Files.createTempDirectory("graft_pseq").toString + "/t"
    Layout.writePartitioned(df, dirPar, Seq("shard"), filesPerPart = 4)
    Layout.writePartitioned(df, dirSeq, Seq("shard"), filesPerPart = 4)
    val nPar = Layout.compactPartitioned(spark, dirPar,
      targetBytes = 1L << 40, maxConcurrentLeaves = 4)
    val nSeq = Layout.compactPartitioned(spark, dirSeq,
      targetBytes = 1L << 40, maxConcurrentLeaves = 1)
    assert(nPar === nSeq && nPar === 8)
    def shape(d: String) = new java.io.File(d).listFiles()
      .filter(_.isDirectory).map { l =>
        l.getName -> l.listFiles().count(_.getName.endsWith(".parquet"))
      }.sortBy(_._1).toSeq
    assert(shape(dirPar) === shape(dirSeq))
    assert(spark.read.parquet(dirPar).orderBy("id").collect().toSeq
      === spark.read.parquet(dirSeq).orderBy("id").collect().toSeq)
    // no crash state left behind by either mode
    for (d <- Seq(dirPar, dirSeq))
      assert(!new java.io.File(d).listFiles().exists(f =>
        f.getName.startsWith("_old_") ||
          f.getName.startsWith("_compacting_")))
  }

  test("concurrent compactPartitioned passes on one table serialize " +
    "on the per-path monitor and both succeed (r15 ADVICE): without " +
    "the lock, the second pass's start-of-pass heal deletes the " +
    "first's in-flight _compacting_* rewrite") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_clock").toString + "/t"
    val df = (0 until 6000).map { i =>
      (i.toLong, s"s${i % 6}", s"payload $i")
    }.toDF("id", "shard", "payload")
    Layout.writePartitioned(df, dir, Seq("shard"), filesPerPart = 5)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 3).map { _ =>
      new Thread(() =>
        try Layout.compactPartitioned(spark, dir,
          targetBytes = 1L << 40, maxConcurrentLeaves = 2)
        catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"a concurrent pass failed: ${errs.peek()}")
    // the table is intact, fully compacted, with no crash state
    assert(spark.read.parquet(dir).count() === 6000)
    val leaves = new java.io.File(dir).listFiles().filter(_.isDirectory)
    assert(leaves.length === 6)
    assert(leaves.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) === 1))
    assert(!new java.io.File(dir).listFiles().exists(f =>
      f.getName.startsWith("_old_") ||
        f.getName.startsWith("_compacting_")))
  }

  test("writePartitionedIfStale stays a no-op after compactPartitioned: " +
    "the freshness claim names the SOURCE, which the compact did not " +
    "touch (VERDICT r14 #7)") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_fpsrc").toString + "/s"
    val dir = Files.createTempDirectory("graft_fpdst").toString + "/t"
    (0 until 600).map(i => (i.toLong, s"g${i % 3}"))
      .toDF("id", "grp").write.parquet(src)
    val scan = spark.read.parquet(src)
    val fp = Layout.scanFingerprint(scan)
    assert(Layout.writePartitionedIfStale(scan, dir, Seq("grp"), fp,
      filesPerPart = 4), "first build runs")
    assert(Layout.compactPartitioned(spark, dir,
      targetBytes = 1L << 40) === 3)
    assert(!Layout.writePartitionedIfStale(scan, dir, Seq("grp"), fp),
      "compaction rewrote leaves only — the fingerprint survives and " +
        "the next IfStale reuses instead of rebuilding")
    assert(spark.read.parquet(dir).count() === 600)
  }
}
