package graft.operators

import org.apache.spark.sql.Dataset

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata, and feature extraction runs
  * as partition-local batch processing (the JVM analogue of an Arrow-batch
  * `mapInPandas` decode stage).
  *
  * The decode itself is STUBBED with a deterministic transform — this
  * container ships no image/audio codecs — but everything Spark-side is
  * real: the typed schema, the binary column, the batched mapPartitions
  * shape, and the downstream columnar use of the extracted features. A real
  * deployment swaps `decodeBatch` for a JNI/codec call with the same
  * signature; nothing else changes.
  */
object Media {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaDoc(
      doc_id: Long,
      media_type: String,
      payload: Array[Byte])

  /** Extracted features: byte length, rolling checksum, unit-scaled
    * 8-dim feature vector derived from the checksum.
    */
  final case class MediaFeature(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float])

  /** Deterministic stand-in for a codec decode of one batch. Batch-shaped
    * (Seq in, Seq out) so a vectorized decoder drops in unchanged.
    */
  private def decodeBatch(batch: Seq[MediaDoc]): Seq[MediaFeature] =
    batch.map { d =>
      val cs = d.payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xffL)) %
        graft.functions.Portable.P)
      val feat = Array.tabulate(8)(k => ((cs >> (k * 8)) & 0xff).toFloat / 255f)
      MediaFeature(d.doc_id, d.media_type, d.payload.length.toLong, cs, feat)
    }

  /** Partition-local, batched feature extraction. No shuffle: each input
    * partition maps straight to an output partition, so this scales with
    * executor count; batch size bounds per-task peak memory the way an
    * Arrow batch size would.
    */
  def extractFeatures(
      ds: Dataset[MediaDoc], batchSize: Int = 256): Dataset[MediaFeature] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toSeq)))
  }
}
