package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Portable.P

/** Deterministic synthetic-corpus DataSource V2 connector:
  * `spark.read.format("graft-docs").option("rows", n)` yields a
  * `documents`-shaped table (doc_id, text, lang, source, n_chars)
  * generated ON the executors — the scale-testing path that produces an
  * arbitrarily large corpus without first materializing parquet
  * (spiritually the reference's mock API, mock_data.py:16-156, lifted
  * from a driver-side row loop to a planned, partitioned scan).
  *
  * Spark-native by construction:
  *   - `planInputPartitions` slices the id range into `partitions`
  *     independent generation tasks — 1000 executors generate 1000
  *     slices with no driver bottleneck and no shuffle;
  *   - column pruning is REAL: the reader receives the pruned schema and
  *     never assembles `text` (the only expensive column) unless `text`
  *     or `n_chars` survives the projection — `SELECT count(*)` or a
  *     metadata-only projection costs integer hashing, not string
  *     building;
  *   - every value is a pure function of (seed, doc_id) via the same
  *     cube-affine draw family as [[graft.gen.MockData]], so output is
  *     bit-identical across partition counts, executor counts, and
  *     reruns (partition-stability contract, SURVEY §2.3 F4/F5).
  *
  * Options: `rows` (default 1000), `seed` (default 7), `partitions`
  * (default 8), `minWords`/`maxWords` (default 20/120), `vocab`
  * (default 5000 distinct words).
  */
class MockDocsProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MockDocs.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MockDocsTable(MockDocs.Config(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      seed = Option(properties.get("seed")).map(_.toLong).getOrElse(7L),
      partitions =
        Option(properties.get("partitions")).map(_.toInt).getOrElse(8),
      minWords =
        Option(properties.get("minwords")).map(_.toInt).getOrElse(20),
      maxWords =
        Option(properties.get("maxwords")).map(_.toInt).getOrElse(120),
      vocab = Option(properties.get("vocab")).map(_.toInt).getOrElse(5000)))
}

private[sources] class MockDocsTable(cfg: MockDocs.Config)
    extends Table with SupportsRead {
  override def name(): String = s"graft-docs(${cfg.rows})"
  override def schema(): StructType = MockDocs.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new MockDocsScanBuilder(cfg)
}

private[sources] class MockDocsScanBuilder(cfg: MockDocs.Config)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = MockDocs.Schema
  private var idLo = 0L
  private var idHi = cfg.rows // exclusive
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the table's field order; an empty projection (count(*)) is a
    // zero-column schema and the reader emits empty rows
    required = StructType(
      MockDocs.Schema.fields.filter(f => requiredSchema.fieldNames
        .contains(f.name)))

  /** doc_id range predicates prune generation SLICES at plan time (the
    * generated-source analog of partition pruning): the slice planner
    * intersects [start, end) with the accepted bound, so a
    * `doc_id < k` probe plans ~k/rows of the work instead of
    * generating-then-discarding. Bound handling is exact, so accepted
    * filters are NOT re-evaluated by Spark; everything else stays
    * residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def asLong(v: Any): Option[Long] = v match {
      case l: Long => Some(l)
      case i: Int => Some(i.toLong)
      case _ => None
    }
    val (sup, rest) = filters.partition {
      case EqualTo("doc_id", v) => asLong(v).isDefined
      case GreaterThan("doc_id", v) => asLong(v).isDefined
      case GreaterThanOrEqual("doc_id", v) => asLong(v).isDefined
      case LessThan("doc_id", v) => asLong(v).isDefined
      case LessThanOrEqual("doc_id", v) => asLong(v).isDefined
      case IsNotNull("doc_id") => true // non-nullable: trivially true
      case _ => false
    }
    sup.foreach {
      case EqualTo("doc_id", v) =>
        val l = asLong(v).get
        idLo = math.max(idLo, l); idHi = math.min(idHi, l + 1)
      case GreaterThan("doc_id", v) =>
        idLo = math.max(idLo, asLong(v).get + 1)
      case GreaterThanOrEqual("doc_id", v) =>
        idLo = math.max(idLo, asLong(v).get)
      case LessThan("doc_id", v) =>
        idHi = math.min(idHi, asLong(v).get)
      case LessThanOrEqual("doc_id", v) =>
        idHi = math.min(idHi, asLong(v).get + 1)
      case IsNotNull(_) => ()
    }
    accepted = sup
    rest
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new MockDocsScan(cfg, required, idLo, idHi)
}

private[sources] class MockDocsScan(
    cfg: MockDocs.Config, required: StructType,
    idLo: Long, idHi: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = cfg.rows
    val parts = math.max(1, cfg.partitions)
    val per = (n + parts - 1) / parts
    (0L until parts.toLong).iterator
      .map(p => MockDocsSlice(
        math.max(p * per, idLo),
        math.min(math.min(n, (p + 1) * per), idHi),
        cfg, required.fieldNames))
      .filter(s => s.start < s.end)
      .toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MockDocsReaderFactory
}

/** One generation slice: ids in [start, end). Serialized to executors —
  * carries only scalars (the config and the pruned field names).
  */
private[sources] case class MockDocsSlice(
    start: Long, end: Long, cfg: MockDocs.Config, fields: Array[String])
  extends InputPartition

private[sources] class MockDocsReaderFactory extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new MockDocsReader(partition.asInstanceOf[MockDocsSlice])
}

private[sources] class MockDocsReader(slice: MockDocsSlice)
    extends PartitionReader[InternalRow] {
  private var id = slice.start - 1
  // n_chars needs the text length, so either column forces assembly
  private val needText =
    slice.fields.contains("text") || slice.fields.contains("n_chars")
  private val row = new Array[Any](slice.fields.length)

  override def next(): Boolean = { id += 1; id < slice.end }

  override def get(): InternalRow = {
    val cfg = slice.cfg
    lazy val text = MockDocs.text(cfg, id)
    var i = 0
    while (i < slice.fields.length) {
      row(i) = slice.fields(i) match {
        case "doc_id" => id
        case "text" => UTF8String.fromString(text)
        case "n_chars" => if (needText) text.length.toLong else 0L
        case "lang" => UTF8String.fromString(MockDocs.lang(cfg, id))
        case "source" => UTF8String.fromString(MockDocs.source(cfg, id))
      }
      i += 1
    }
    InternalRow.fromSeq(row.toIndexedSeq)
  }

  override def close(): Unit = ()
}

object MockDocs {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  case class Config(
      rows: Long, seed: Long, partitions: Int,
      minWords: Int, maxWords: Int, vocab: Int)

  val Langs: Seq[String] = Seq("en", "de", "fr", "es", "pt")

  /** Scala twin of [[graft.gen.MockData.hashLong]]: affine map then cube
    * mod P — partition-stable, bijective per (seed, tag). Coefficients
    * come from [[graft.gen.MockData.mixCoeffs]] itself so the row-space
    * generator can never drift from the column-space one (g3's DuckDB
    * oracle recomputes this exact arithmetic).
    */
  private def draw(seed: Long, tag: String, key: Long): Long = {
    val (a, b) = graft.gen.MockData.mixCoeffs(seed, tag)
    val x = (((key % P + P) % P) * a + b) % P
    (x * x % P) * x % P
  }

  /** Deterministic lowercase word for vocab index v: 3–7 base-26
    * letters of a bijectively scrambled index (distinct v < 26^3 can
    * still collide only across different lengths, never within one).
    */
  private[sources] def word(v: Int): String = {
    val scrambled = draw(0L, "vocab", v.toLong)
    val len = 3 + (scrambled % 5).toInt
    val sb = new StringBuilder(len)
    var x = scrambled / 5
    var i = 0
    while (i < len) { sb.append(('a' + x % 26).toInt.toChar); x /= 26; i += 1 }
    sb.result()
  }

  private[sources] def nWords(cfg: Config, id: Long): Int =
    cfg.minWords +
      (draw(cfg.seed, "len", id) % (cfg.maxWords - cfg.minWords + 1)).toInt

  private[sources] def text(cfg: Config, id: Long): String = {
    val n = nWords(cfg, id)
    val sb = new StringBuilder(n * 6)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      sb.append(word(
        (draw(cfg.seed, "w", id * 131 + j) % cfg.vocab).toInt))
      j += 1
    }
    sb.result()
  }

  private[sources] def lang(cfg: Config, id: Long): String =
    Langs((draw(cfg.seed, "lang", id) % Langs.length).toInt)

  private[sources] def source(cfg: Config, id: Long): String =
    f"src_${draw(cfg.seed, "src", id) % 20}%02d"
}
