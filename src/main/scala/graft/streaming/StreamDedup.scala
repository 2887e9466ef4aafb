package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — e1's content-hash dedup applied AT INGEST:
  * keep the first arrival of each content digest, dropping replays and
  * boilerplate copies before they ever land in the corpus.
  *
  * Uses `dropDuplicatesWithinWatermark`, so the dedup state store holds
  * only digests younger than the watermark horizon — bounded state, the
  * requirement for an unbounded stream (plain streaming dropDuplicates
  * accumulates keys forever). Content outside the horizon can recur;
  * the batch operators (e1/e13) remain the full-corpus pass.
  */
object StreamDedup {

  /** `docs` must carry `text` and an event-time column `tsCol`; emits
    * the surviving rows plus their `content_hash`.
    */
  def firstArrivalByContent(
      docs: DataFrame, tsCol: String, horizon: String): DataFrame =
    docs
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** NEAR-dup dedup at ingest: key the watermark-bounded dedup on the
    * 32-bit SimHash instead of the exact digest, so replays that differ
    * by light edits (the e4/e28 signature family — same majority-vote
    * word profile) are dropped too. Coarser than the batch verifier
    * (signature equality, not hamming <= 3): an ingest filter trades a
    * little recall for per-record state of ONE long per horizon window.
    */
  def firstArrivalBySimhash(
      docs: DataFrame, tsCol: String, horizon: String): DataFrame =
    docs
      .withColumn("simhash", graft.functions.F.sim_hash(col("text")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("simhash")

  /** Incremental dedup at ingest — the streaming twin of e41's
    * delta-vs-base stage: drop any arriving doc whose content digest
    * already exists in the STATIC base corpus (stream-static LEFT ANTI
    * join — the static side is re-planned per micro-batch, so a base
    * refresh is picked up without restarting the query), then drop
    * within-stream replays inside the watermark horizon. `base` must be
    * a batch frame with a `text` column; digests only cross the join —
    * never text. At fleet scale the anti-join's static side reads a
    * digest-bucketed base table (one hash per base doc, pruned to the
    * arriving buckets), not the corpus itself.
    */
  def againstBase(
      docs: DataFrame, base: DataFrame, tsCol: String,
      horizon: String): DataFrame = {
    val baseHashes = base
      .select(sha2(col("text"), 256).as("content_hash")).distinct()
    docs
      .withColumn("content_hash", sha2(col("text"), 256))
      .join(baseHashes, Seq("content_hash"), "left_anti")
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("content_hash")
  }
}
