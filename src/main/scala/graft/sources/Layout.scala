package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for the write side — the levers SCALING.md
  * names for the next 100x, made concrete:
  *
  *  - **Partitioned parquet** (`writePartitioned`): hive-style
  *    directory partitioning on low-cardinality columns, so any read
  *    filtered on them prunes whole directories before a byte is
  *    scanned (`PartitionFilters` in the scan node, not `PushedFilters`).
  *    File sizing is controlled by repartitioning on the partition
  *    columns (+ an optional spread key for hot partitions) BEFORE the
  *    write: without it every task writes a sliver into every
  *    partition — the classic small-files explosion at fleet scale.
  *
  *  - **Bucketed tables** (`writeBucketed`): pre-shuffled, per-bucket
  *    sorted table layout registered in the catalog. Two tables
  *    bucketed on the same key with the same bucket count join with NO
  *    exchange on either side (`SortMergeJoin` directly over the
  *    bucketed scans) — the standing shuffle of a fact-fact join paid
  *    ONCE at write time instead of on every query. This is the
  *    "bucketed mart tables" lever for the fct star joins.
  *
  * Both are thin, typed wrappers over the native writers — the point is
  * the layout contract and the plan properties, which LayoutSpec pins
  * (partition pruning visible in the scan; no Exchange in the bucketed
  * join plan).
  */
object Layout {

  /** Write `df` as parquet partitioned by `partCols`, with `filesPerPart`
    * output files per partition directory (repartition by the partition
    * columns plus a bounded spread key — deterministic file counts, no
    * small-files spray).
    */
  def writePartitioned(
      df: DataFrame, path: String, partCols: Seq[String],
      filesPerPart: Int = 1): Unit = {
    val spread = pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)),
      lit(filesPerPart))
    df.repartition((partCols.map(col) :+ spread): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .parquet(path)
    writeLayoutMarker(df.sparkSession, path, Seq(
      "kind" -> "partitioned", "cols" -> partCols.mkString(",")))
  }

  /** Save `df` as a bucketed+sorted catalog table (bucket pruning and
    * exchange-free same-key joins). Parquet format; `overwrite`.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    // The stale-location cleanup below derives the managed path from the
    // DEFAULT database layout: <warehouse>/<tbl> for unqualified names,
    // <warehouse>/<db>.db/<tbl> for a one-level `db.tbl` (the location
    // CREATE DATABASE assigns when no LOCATION clause overrides it —
    // every database in this engine is created that way). Deeper
    // qualification (catalog.db.tbl) is rejected rather than aiming a
    // recursive delete at a guessed directory.
    val parts = table.split('.')
    require(table.nonEmpty && parts.length <= 2 && parts.forall(_.nonEmpty),
      s"writeBucketed: table name '$table' must be <tbl> or <db>.<tbl>")
    // A managed table's LOCATION outlives a JVM whose in-memory catalog
    // did not: the warehouse dir persists on disk while the default
    // catalog is per-session, so Overwrite-saveAsTable in a fresh
    // session fails LOCATION_ALREADY_EXISTS on the stale dir. Drop any
    // catalog entry AND clear the orphaned location before writing.
    spark.sql(s"DROP TABLE IF EXISTS ${parts.map(p => s"`$p`").mkString(".")}")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val loc = parts match {
      case Array(db, tbl) => new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(wh, s"${db.toLowerCase}.db"),
        tbl.toLowerCase)
      case _ => new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    }
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc) && !fs.delete(loc, true))
      throw new java.io.IOException(
        s"could not clear stale managed-table location $loc")
    // repartition to the bucket hash FIRST: Spark's bucket assignment is
    // the same Murmur3 hash as repartition(), so each write task then
    // holds exactly one bucket and emits one file — without this, every
    // task writes a file into every bucket it touches (tasks x buckets
    // files, the bucketed flavor of the small-files spray)
    df.repartition(buckets, col(bucketCol))
      .write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  /** Freshness fingerprint of the files backing `df`'s scan: schema plus
    * (path, size, mtime) of every input file — METADATA-ONLY (no count
    * job, no data scan), and it changes whenever the source contents
    * change even at identical row count, the case a count-equality
    * freshness check silently misses.
    */
  def scanFingerprint(df: DataFrame): String = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update(df.schema.catalogString.getBytes("UTF-8"))
    df.inputFiles.sorted.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      md.update(s"$f:${st.getLen}:${st.getModificationTime}".getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** The marker carrying the source fingerprint a bucketed table was
    * built from. Lives INSIDE the managed-table directory (an
    * underscore-prefixed name, ignored by the parquet reader like
    * `_SUCCESS`) so it is dropped atomically with the table's data.
    */
  private def markerPath(
      spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase),
      "_graft_fingerprint")

  /** Per-target monitor for the IfStale builders: two queries sharing
    * one amortized artifact (e64 and e170 both build the IVF index
    * path; Verify runs queries 4-at-a-time in one JVM) must not
    * concurrently pass the same staleness probe and overwrite each
    * other mid-write. Keyed by the target string; single-JVM scope
    * matches the engine's local execution model (a multi-driver fleet
    * serializes builds through its orchestrator instead).
    */
  private val ifStaleLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def lockFor(key: String): Object =
    ifStaleLocks.computeIfAbsent(key, _ => new Object)

  /** [[writeBucketed]] guarded by a marker-file fingerprint: rebuild only
    * when the table is absent or its recorded source fingerprint differs
    * from `fingerprint` (pass [[scanFingerprint]] of the source scan).
    * The freshness probe is two filesystem stats — no count jobs on the
    * reuse path. Returns true when the table was (re)built.
    */
  def writeBucketedIfStale(
      df: DataFrame, table: String, bucketCol: String, buckets: Int,
      // lock on the NORMALIZED identity: markerPath/writeBucketed
      // lowercase the table, so two casings are one on-disk target
      fingerprint: String): Boolean =
    lockFor("tbl:" + table.toLowerCase).synchronized {
    val spark = df.sparkSession
    val mp = markerPath(spark, table)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = spark.catalog.tableExists(table) && fs.exists(mp) && {
      val in = fs.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString == fingerprint
      finally in.close()
    }
    if (!fresh) {
      writeBucketed(df, table, bucketCol, buckets)
      val out = fs.create(mp, true)
      try out.write(fingerprint.getBytes("UTF-8")) finally out.close()
    }
    !fresh
  }

  /** [[writePartitioned]] guarded by the same marker-file fingerprint
    * discipline as [[writeBucketedIfStale]], for PATH-addressed
    * partitioned layouts (indexes, hive-layout exports): rebuild only
    * when the path is absent or its recorded source fingerprint differs.
    * The marker lives inside the output directory (underscore-prefixed,
    * invisible to the parquet reader), so a manual delete of the layout
    * also drops its freshness claim. Returns true when (re)built.
    */
  def writePartitionedIfStale(
      df: DataFrame, path: String, partCols: Seq[String],
      fingerprint: String,
      filesPerPart: Int = 1): Boolean = lockFor(path).synchronized {
    val spark = df.sparkSession
    val mp = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path), "_graft_fingerprint")
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh = fs.exists(mp) && {
      val in = fs.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString == fingerprint
      finally in.close()
    }
    if (!fresh) {
      writePartitioned(df, path, partCols, filesPerPart)
      val out = fs.create(mp, true)
      try out.write(fingerprint.getBytes("UTF-8")) finally out.close()
    }
    !fresh
  }

  /** Join two same-bucketing tables on the bucket key — planned with no
    * exchange when both sides' bucketing matches the join key.
    */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** The LAYOUT CONTRACT marker — `_graft_layout`, an underscore-
    * prefixed key=value file inside the data directory (invisible to
    * the parquet reader, dropped atomically with the data, the
    * `_graft_fingerprint` discipline). [[writeZOrdered]],
    * [[writeBloomFiltered]] and [[writePartitioned]] record WHAT
    * physical property their write paid for, so maintenance passes can
    * re-establish it instead of silently flattening it: through r12,
    * [[compact]] rewrote every table as a plain round-robin
    * repartition — run on a bloom-filtered table it dropped the
    * per-row-group filters (no `parquet.bloom.filter.*` options on the
    * rewrite), run on a z-ordered table it scattered the Morton
    * clustering — both SILENT degradations (results stay correct, scans
    * go full) in exactly the pass that runs constantly at 100 TB.
    */
  private val LayoutMarkerName = "_graft_layout"

  private def layoutMarkerPath(path: String) =
    new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path), LayoutMarkerName)

  private def writeLayoutMarker(
      spark: SparkSession, path: String,
      props: Seq[(String, String)]): Unit = {
    val mp = layoutMarkerPath(path)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(mp, true)
    try out.write(props.map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The recorded layout contract of `path`, if any write here declared
    * one. Absent marker = plain layout (pre-contract tables compact as
    * before — the conservative default).
    */
  def readLayoutContract(
      spark: SparkSession, path: String): Option[Map[String, String]] = {
    val mp = layoutMarkerPath(path)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(mp)) None
    else {
      val in = fs.open(mp)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      Some(text.linesIterator.filter(_.contains('='))
        .map { l =>
          val i = l.indexOf('=')
          l.substring(0, i) -> l.substring(i + 1)
        }.toMap)
    }
  }

  /** Write `df` Z-order-clustered on two LONG dimension columns: Morton-
    * interleave the low `bits` bits of each
    * ([[graft.functions.F.morton2]], codegen'd), range-partition into
    * `files` chunks on the z-value and sort within each — so every
    * output file covers one contiguous z-range, and its parquet min/max
    * stats on `xCol`/`yCol` form a tight 2-D bounding box. A reader
    * filtering on EITHER dimension (or both) then skips most files from
    * plain 1-D row-group stats — the multi-dimensional clustering lever
    * for scan-heavy 100 TB tables, paid once at write time.
    *
    * The z column itself is dropped before the write: it's a file-
    * placement key, not data — the pruning comes from the per-file
    * min/max of the ORIGINAL columns.
    */
  def writeZOrdered(
      df: DataFrame, path: String, xCol: String, yCol: String,
      files: Int, bits: Int = 16): Unit = {
    df.withColumn("__z",
      graft.functions.F.morton2(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
    writeLayoutMarker(df.sparkSession, path, Seq(
      "kind" -> "zorder", "x" -> xCol, "y" -> yCol,
      "bits" -> bits.toString))
  }

  /** Compact a parquet directory into ≈`targetBytes` files — the
    * maintenance pass that undoes small-files accumulation from
    * incremental appends (every append-heavy table needs it
    * periodically: scan planning, footer reads, and shuffle-fetch
    * setup all scale with FILE count, not byte count). File count is
    * sized from the actual on-disk bytes; the rewrite goes to a
    * sibling directory, then swaps in via rename-aside: the original
    * moves to `path__old`, the rewrite renames into place, and only
    * then is the old data deleted. Every rename/delete result is
    * checked and a failure throws — the original data is never deleted
    * before the new directory is live at the published path, so a
    * crash at any step leaves the rows recoverable (at `path`,
    * or at `path__old` with the rewrite in `path__compacting`), never
    * silently lost the way an unchecked delete-then-rename could lose
    * them (rename returning false is a normal failure mode on object
    * stores). Returns the new file count.
    *
    * The rewrite HONORS the table's recorded layout contract
    * (`_graft_layout`, written by [[writeZOrdered]] /
    * [[writeBloomFiltered]] / [[writePartitioned]]): a z-ordered table
    * is re-clustered (morton2 + range-repartition + sort-within, same
    * x/y/bits) so file min/max stay tight bounding boxes; a
    * bloom-filtered table gets its `parquet.bloom.filter.*` options
    * re-applied (same cols/ndv) so point lookups keep skipping row
    * groups; the marker itself is re-written into the new directory so
    * the contract survives repeated compactions. Hive-PARTITIONED
    * layouts are refused (a root-level rewrite would flatten the
    * directory scheme — compact each leaf partition directory instead,
    * which is plain by construction). Tables with no marker compact as
    * plain round-robin, as before.
    */
  def compact(
      spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.getContentSummary(hPath).getLength
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(
        s"compact: cannot clear stale aside dir $old")
    val contract = readLayoutContract(spark, path)
    val src = spark.read.parquet(path)
    contract.map(_.getOrElse("kind", "plain")) match {
      case Some("zorder") =>
        val c = contract.get
        val (x, y, bits) = (c("x"), c("y"), c("bits").toInt)
        src.withColumn("__z",
          graft.functions.F.morton2(col(x), col(y), bits))
          .repartitionByRange(n, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        writeLayoutMarker(spark, tmp.toString, Seq(
          "kind" -> "zorder", "x" -> x, "y" -> y,
          "bits" -> bits.toString))
      case Some("bloom") =>
        val c = contract.get
        val (cols, ndv) = (c("cols").split(',').toSeq, c("ndv"))
        val w = cols.foldLeft(src.repartition(n).write) { (wr, bc) =>
          wr.option(s"parquet.bloom.filter.enabled#$bc", "true")
            .option(s"parquet.bloom.filter.expected.ndv#$bc", ndv)
        }
        w.mode(SaveMode.Overwrite).parquet(tmp.toString)
        writeLayoutMarker(spark, tmp.toString, Seq(
          "kind" -> "bloom", "cols" -> cols.mkString(","),
          "ndv" -> ndv))
      case Some("partitioned") =>
        throw new IllegalArgumentException(
          s"compact: $path is hive-partitioned (cols=" +
            s"${contract.get.getOrElse("cols", "?")}); a root rewrite " +
            "would flatten the directory scheme — use " +
            "compactPartitioned, which compacts each leaf partition " +
            "directory under the recorded contract")
      case _ =>
        src.repartition(n)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    }
    swapInPlace(fs, hPath, tmp, old, "compact")
    n
  }

  /** Rename-aside swap: the original is moved, not deleted, until the
    * rewrite is live at the published path; every rename/delete result
    * is checked and a failure throws with the data's location named.
    */
  private def swapInPlace(
      fs: org.apache.hadoop.fs.FileSystem,
      hPath: org.apache.hadoop.fs.Path,
      tmp: org.apache.hadoop.fs.Path,
      old: org.apache.hadoop.fs.Path, op: String): Unit = {
    if (!fs.rename(hPath, old))
      throw new java.io.IOException(
        s"$op: failed to move $hPath aside to $old; original intact")
    if (!fs.rename(tmp, hPath)) {
      // best-effort restore so the published path doesn't stay empty
      val restored = fs.rename(old, hPath)
      throw new java.io.IOException(
        s"$op: failed to publish $tmp at $hPath; original " +
          (if (restored) s"restored at $hPath" else s"preserved at $old"))
    }
    if (!fs.delete(old, true))
      throw new java.io.IOException(
        s"$op: swap complete but failed to remove aside dir $old")
  }

  /** Compaction for hive-PARTITIONED layouts — the maintenance pass
    * [[compact]] (correctly) refuses to run at the root, provided as a
    * library operation instead of the manual loop the refusal used to
    * suggest: partitioned layout is the default posture for the
    * corpus-scale tables this engine targets (writePartitioned is the
    * first data-skipping lever), so its small-files maintenance cannot
    * be user-assembled.
    *
    * Walks the directory scheme the recorded contract declares (one
    * `col=value` level per partition column — the shape
    * [[writePartitioned]] wrote by construction) and compacts each LEAF
    * directory in place to ≈`targetBytes` files: leaves are plain
    * parquet by construction (partition values live in the directory
    * names, z-order/bloom contracts are root-level kinds), so each leaf
    * rewrite is the plain round-robin path with [[compact]]'s
    * rename-aside swap — a crash mid-pass leaves every leaf either
    * fully old, fully new, or recoverable at the '_'-prefixed sibling
    * dirs `_old_<leaf>` / `_compacting_<leaf>` (invisible to the
    * parquet reader, impossible to confuse with a partition value),
    * and all OTHER leaves untouched. The directory
    * scheme, the root `_graft_layout` marker, and any
    * `_graft_fingerprint` are never rewritten, so partition pruning and
    * freshness claims survive (LayoutSpec pins scheme + marker +
    * pruning across a compact). Returns the total new file count.
    *
    * Scale: each leaf is an independent rewrite of one partition's
    * bytes — here they run sequentially (one partition's data in
    * flight at a time; a fleet deployment can fan the independent leaf
    * jobs out under FAIR scheduling), unlike a root rewrite, which
    * would shuffle the whole table to rebuild a scheme it already has.
    */
  def compactPartitioned(
      spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): Int = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val contract = readLayoutContract(spark, path)
    val kind = contract.map(_.getOrElse("kind", "plain"))
    require(kind.contains("partitioned"),
      s"compactPartitioned: $path has no recorded hive-partitioned " +
        s"contract (found ${kind.getOrElse("no marker")}) — use compact")
    val nLevels = contract.get("cols").split(',').count(_.nonEmpty)
    def leaves(
        p: org.apache.hadoop.fs.Path,
        depth: Int): Seq[org.apache.hadoop.fs.Path] =
      if (depth == 0) Seq(p)
      else fs.listStatus(p).toSeq
        .filter { st =>
          val n = st.getPath.getName
          // recovery dirs (below) are '_'-prefixed SIBLINGS — a name
          // class the parquet reader ignores and a hive partition dir
          // can never be (a `col=value` dir starts with the column
          // name; '_'-prefixed paths are filtered by Spark's own file
          // index, so no real partition can live there). Crucially the
          // recovery name is NOT `leaf + suffix`: a genuine partition
          // VALUE ending in the suffix (status=done vs status=done__old)
          // must never be mistakable for another leaf's crash state.
          st.isDirectory && n.contains("=") && !n.startsWith("_") &&
            !n.startsWith(".")
        }
        .flatMap(st => leaves(st.getPath, depth - 1))
    leaves(hPath, nLevels).map { leaf =>
      val total = fs.getContentSummary(leaf).getLength
      val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
      val parent = leaf.getParent
      val tmp = new org.apache.hadoop.fs.Path(
        parent, s"_compacting_${leaf.getName}")
      val old = new org.apache.hadoop.fs.Path(
        parent, s"_old_${leaf.getName}")
      if (fs.exists(old) && !fs.delete(old, true))
        throw new java.io.IOException(
          s"compactPartitioned: cannot clear stale aside dir $old")
      // leaf files carry only data columns (partition values are the
      // directory names) — read and rewrite the leaf alone, so the
      // rewrite never re-infers or re-writes the partition scheme
      spark.read.parquet(leaf.toString)
        .repartition(n)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      swapInPlace(fs, leaf, tmp, old, "compactPartitioned")
      n
    }.sum
  }

  /** Parquet BLOOM-FILTER layout for point-lookup columns — the third
    * data-skipping lever beside directory pruning (writePartitioned)
    * and min/max clustering (writeZOrdered). Min/max row-group stats
    * are useless for a point lookup on a HASH-like column (every row
    * group spans the whole domain unless the table is sorted on it);
    * a per-row-group bloom filter answers "is key k possibly here?"
    * directly, so an equality predicate pushed to the scan skips row
    * groups with no sort, no clustering, and no second copy of the
    * data — the right shape for "fetch document by content
    * fingerprint" at 100 TB, where sorting by fingerprint would fight
    * the table's natural (source, time) layout.
    *
    * `expectedNdv` sizes the filter (parquet derives bits from the
    * target false-positive rate ~1%); oversizing costs footer bytes,
    * undersizing costs false positives — never correctness, because
    * the engine re-checks the predicate on surviving pages. Bloom
    * filters engage only for equality/IN predicates; range predicates
    * still need writeZOrdered's clustering.
    */
  def writeBloomFiltered(
      df: DataFrame, path: String, bloomCols: Seq[String],
      expectedNdv: Long, files: Int = 0): Unit = {
    require(bloomCols.nonEmpty, "at least one bloom column required")
    require(expectedNdv > 0, "expectedNdv must be positive")
    val base = if (files > 0) df.repartition(files) else df
    val w = bloomCols.foldLeft(base.write) { (wr, c) =>
      wr.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c",
          expectedNdv.toString)
    }
    w.mode(SaveMode.Overwrite).parquet(path)
    writeLayoutMarker(df.sparkSession, path, Seq(
      "kind" -> "bloom", "cols" -> bloomCols.mkString(","),
      "ndv" -> expectedNdv.toString))
  }
}
