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

  /** One sampled "frame": evenly-spaced offset into the payload plus the
    * checksum of the 16-byte window there — the video-frame-sampling
    * stand-in (offset = i*len/nFrames, the uniform keyframe grid).
    */
  final case class MediaFrame(
      doc_id: Long,
      frame_idx: Long,
      offset: Long,
      frame_hash: Long)

  private val P = graft.functions.Portable.P

  /** Deterministic frame-sampling stand-in for a batch: a real codec
    * would decode keyframes at these offsets; the stub hashes the bytes
    * a decoder would consume, so the plumbing (row expansion, offsets,
    * per-frame features) is fully checkable.
    */
  private def sampleBatch(batch: Seq[MediaDoc], nFrames: Int): Seq[MediaFrame] =
    batch.flatMap { d =>
      val n = d.payload.length.toLong
      (0L until nFrames.toLong).flatMap { i =>
        val off = i * n / nFrames
        if (off < n) {
          val end = math.min(n, off + 16)
          val h = (off until end).foldLeft(0L)(
            (a, j) => (a * 31 + (d.payload(j.toInt) & 0xffL)) % P)
          Some(MediaFrame(d.doc_id, i, off, h))
        } else None
      }
    }

  /** Partition-local, batched frame sampling (1-to-nFrames row expansion
    * inside the partition — no shuffle, no driver involvement).
    */
  def sampleFrames(
      ds: Dataset[MediaDoc], nFrames: Int = 4,
      batchSize: Int = 256): Dataset[MediaFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => sampleBatch(g.toSeq, nFrames)))
  }

  /** Windowed energy over a payload — the audio VAD (voice-activity
    * detection) stand-in: a real deployment decodes PCM and thresholds
    * per-window RMS; the stub sums byte values over fixed-size windows,
    * so the plumbing (window segmentation, per-window stats, activity
    * thresholding) is fully checkable. `active` = mean byte ≥ 96
    * (energy ≥ 96·windowLen in exact integers).
    */
  final case class MediaWindow(
      doc_id: Long,
      win_idx: Long,
      offset: Long,
      win_len: Long,
      energy: Long,
      active: Int)

  private def energyBatch(
      batch: Seq[MediaDoc], winBytes: Int): Seq[MediaWindow] =
    batch.flatMap { d =>
      val n = d.payload.length
      (0 until (n + winBytes - 1) / winBytes).map { w =>
        val off = w * winBytes
        val end = math.min(n, off + winBytes)
        var e = 0L
        var j = off
        while (j < end) { e += (d.payload(j) & 0xffL); j += 1 }
        MediaWindow(d.doc_id, w.toLong, off.toLong, (end - off).toLong,
          e, if (e >= 96L * (end - off)) 1 else 0)
      }
    }

  /** Partition-local, batched windowed-energy extraction (the VAD
    * shape): 1-to-⌈len/winBytes⌉ row expansion inside the partition,
    * no shuffle.
    */
  def windowEnergy(
      ds: Dataset[MediaDoc], winBytes: Int = 32,
      batchSize: Int = 256): Dataset[MediaWindow] = {
    require(winBytes > 0, "winBytes must be positive")
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(batchSize).flatMap(g => energyBatch(g.toSeq, winBytes)))
  }
}
