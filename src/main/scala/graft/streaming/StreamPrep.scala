package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** The curation pipeline AT INGEST: e14's quality gate → watermark-
  * bounded exact-content dedup → per-(event-window, language) yield
  * accounting, as ONE streaming flow. The batch operators (e14, e1, e7)
  * remain the full-corpus pass; this drain keeps junk and replays from
  * ever landing in the corpus, and emits the admission statistics a
  * pipeline operator watches.
  *
  * Chains two stateful operators (dropDuplicatesWithinWatermark, then a
  * windowed aggregation) — supported in append mode since both are
  * event-time bounded; state is digests inside the horizon plus open
  * windows. The quality predicate is stateless per-row expression work
  * fused into the scan, with thresholds IDENTICAL to e14 so admission
  * here equals `keep = 1` there.
  */
object StreamPrep {

  /** @param docs streaming frame with doc_id, text, lang, n_chars and an
    *             event-time column `tsCol`
    * @param horizon  watermark delay (also the dedup memory)
    * @param windowLen tumbling event-time window for the yield stats
    */
  def curate(
      docs: DataFrame, tsCol: String, horizon: String,
      windowLen: String = "1 hour"): DataFrame = {
    val words = expr(Portable.wordsSpark)
    val gated = docs
      .withColumn("n_words", size(words).cast("long"))
      .withColumn("n_stop",
        size(filter(words, w => w.isin("the", "a"))).cast("long"))
      .withColumn("n_punct",
        size(expr("regexp_extract_all(text, '[^a-zA-Z0-9\\\\s]', 0)"))
          .cast("long"))
      .filter(col("n_words") >= 5 &&
        col("n_stop").cast("double") / col("n_words") >= 0.01 &&
        col("n_punct").cast("double") / col("n_chars") <= 0.2)
    val deduped = gated
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
    deduped
      .groupBy(window(col(tsCol), windowLen), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"))
      .select(col("window.start").as("window_start"), col("lang"),
        col("n_docs"), col("n_words"))
  }

  /** Bloom decontamination gate AT INGEST — e48's prefilter as a
    * streaming admission rule: drop any document whose word-3-gram
    * shingles hit the benchmark bitmap more than `maxHits` times.
    * Quarantine-conservative by construction: the bitmap has no false
    * negatives, so every truly contaminated document is caught; an ε
    * fraction of clean documents false-positives into the drop (e48's
    * batch path verifies exactly — at ingest the cheap stateless probe
    * is the right trade, and a quarantined doc can always be re-admitted
    * by the batch verify later). Pure per-row expression work fused
    * into the scan — no watermark, no state, safe in any output mode.
    */
  def decontaminationGate(
      docs: DataFrame, bitmap: Array[Long], mBits: Int, kHashes: Int,
      maxHits: Int = 4): DataFrame = {
    import graft.functions.{sketches, F}
    val hits = size(filter(
      F.shingle_hashes(col("text")),
      sh => sketches.might_contain(bitmap, sh, mBits, kHashes)))
    docs.filter(hits <= maxHits)
  }
}
