package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.F
import graft.functions.Portable.P

/** The quarantine-verify loop run ONLINE — e168's batch composition
  * ([[StreamBandGate]]'s admission tiers + e41's exact-Jaccard
  * verification of the quarantined minority) as one stateless
  * streaming operator, so an arriving document's verdict is FINAL
  * inside its own micro-batch instead of parking in a quarantine
  * bucket for the next batch pass (VERDICT r14 #2):
  *
  *  - `exact` / `exact` — content digest already in the corpus;
  *  - `neardup_candidate` / `neardup` — shares a MinHash band with the
  *    corpus AND some band-sharing corpus document verifies at exact
  *    shingle Jaccard ≥ `jaccardFloor` (e41's threshold);
  *  - `neardup_candidate` / `kept` — banded but verification REJECTED
  *    every candidate: the band rule's false positive, admitted;
  *  - `kept` / `kept` — no digest, no band.
  *
  * ZERO keyed state, like [[StreamBandGate]] and unlike the obvious
  * design: verification needs "∃ a band-sharing corpus doc with
  * Jaccard ≥ t", and the obvious explode-join-regroup computes it with
  * a streaming aggregation — per-doc state the gate must not hold. The
  * existential is instead decided by a SEMI/ANTI JOIN CASCADE: per
  * band k, a left-SEMI join (band-key equi + Jaccard residual) peels
  * off the docs verified via band k, and the matching left-ANTI join
  * passes the remainder to band k+1 — six disjoint verified slices
  * whose union needs no dedup, and the band-6 anti remainder is the
  * rejected set. Every operator in the plan is a stateless
  * stream-static join, filter, or union; the spec pins
  * `stateOperators` EMPTY on the running query.
  *
  * Static sides are the THREE persisted admission artifacts the batch
  * pipeline maintains (e172): the digest set, the doc-id-free
  * (band_id, band_key) gate index, and the (doc_id, shs, sig)
  * signature store — passed as frames (read them from the stored
  * parquet at fleet scale) and MATERIALIZED once at wiring time
  * (memory-and-disk), because the static side of a stream-static join
  * re-evaluates per micro-batch (the [[StreamFingerprint]] census
  * lesson); the signature store is additionally pre-exploded into six
  * per-band key tables so each cascade stage is a plain equi join.
  *
  * Scale: per arriving doc the gate tier is O(1) band probes; only
  * the quarantined minority (the measured 9 % of deltas at sf0.01)
  * enters the cascade, and each stage's join is band-key-selective —
  * the same asymmetric economics e168 measures in batch, paid per
  * micro-batch with no state to checkpoint.
  */
object StreamGateVerify {

  /** @param docs       streaming frame: doc_id, text, ts
    * @param digests    corpus digest set — one `h` column
    *                   ([[StreamBandGate.corpusIndex]]'s first side)
    * @param bands      doc-id-free (band_id, band_key) gate index
    * @param signatures full signature store: doc_id, shs, sig — the
    *                   e172 artifact verification reads
    * @param jaccardFloor exact-Jaccard admission threshold (e41's 0.3)
    * @param materializeStatics persist the three static sides at
    *                  wiring time (default). Each wiring CALL pins its
    *                  own copies for the session — there is no
    *                  teardown hook on a streaming plan — so a caller
    *                  that re-wires repeatedly in one long-lived
    *                  session (spec harnesses, restart loops) should
    *                  pass false and manage persistence of the frames
    *                  it passes in itself.
    * @return append-mode stream of (doc_id, ts, gate_verdict, verdict)
    */
  def verdicts(
      docs: DataFrame, digests: DataFrame, bands: DataFrame,
      signatures: DataFrame, jaccardFloor: Double = 0.3,
      materializeStatics: Boolean = true): DataFrame = {
    def mat(df: DataFrame): DataFrame =
      if (materializeStatics) df.persist(StorageLevel.MEMORY_AND_DISK)
      else df
    val dig = mat(digests)
    val bnd = mat(bands)
    // ONE persisted copy of the signature store; the six per-band
    // verification tables (vk_k, shs_b) are lazy projections over it —
    // persisting each projection would pin ~6× the corpus-scale shs
    // payload (only the small band key differs between them)
    val sigs = mat(signatures.filter(size(col("shs")) > 0)
      .select(col("sig"), col("shs")))
    val sigBand = (0 until 6).map { k =>
      sigs.select(
        (element_at(col("sig"), 2 * k + 1) * P
          + element_at(col("sig"), 2 * k + 2)).as(s"vk$k"),
        col("shs").as("shs_b"))
    }
    val shs = F.shingle_hashes(col("text"))
    val base = docs
      .where(col("doc_id").isNotNull)
      .select(col("doc_id"), col("ts"),
        sha2(col("text"), 256).as("h"),
        when(size(shs) > 0, F.min_hashes(shs)).as("sig"),
        when(size(shs) > 0, shs).as("shs"))
    val exact = base.join(dig, Seq("h"), "left_semi")
      .select(col("doc_id"), col("ts"),
        lit("exact").as("gate_verdict"), lit("exact").as("verdict"))
    val ne = base.join(dig, Seq("h"), "left_anti")
    // gate tier: StreamBandGate's six distinct-key left joins (a NULL
    // band key — shingle-less doc — matches nothing, the batch rule)
    val keyed = ne.select(
      Seq(col("doc_id"), col("ts"), col("shs")) ++
        (0 until 6).map(k => StreamBandGate.bandKey(k).as(s"bk$k")): _*)
    val withBands = (0 until 6).foldLeft(keyed) { (d, k) =>
      d.join(
        bnd.filter(col("band_id") === k)
          .select(col("band_key").as(s"bk$k"), lit(1).as(s"fn$k")),
        Seq(s"bk$k"), "left")
    }
    val tagged = withBands.withColumn("fg",
      when((0 until 6).map(k => col(s"fn$k") === 1).reduce(_ || _),
        lit(1)).otherwise(lit(0)))
    val kept = tagged.filter(col("fg") === 0)
      .select(col("doc_id"), col("ts"),
        lit("kept").as("gate_verdict"), lit("kept").as("verdict"))
    // verification cascade over the quarantined minority: exact
    // shingle Jaccard as the equi-join residual, e41's formula
    def jac(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val inter = size(array_intersect(a, b))
      round(inter.cast("double") / (size(a) + size(b) - inter), 4)
    }
    var rest = tagged.filter(col("fg") === 1).select(
      Seq(col("doc_id"), col("ts"), col("shs")) ++
        (0 until 6).map(k => col(s"bk$k")): _*)
    val verified = (0 until 6).map { k =>
      val cond = col(s"bk$k") === col(s"vk$k") &&
        jac(col("shs"), col("shs_b")) >= jaccardFloor
      val hit = rest.join(sigBand(k), cond, "left_semi")
      rest = rest.join(sigBand(k), cond, "left_anti")
      hit
    }
    val neardup = verified.reduce(_ unionByName _)
      .select(col("doc_id"), col("ts"),
        lit("neardup_candidate").as("gate_verdict"),
        lit("neardup").as("verdict"))
    val rejected = rest
      .select(col("doc_id"), col("ts"),
        lit("neardup_candidate").as("gate_verdict"),
        lit("kept").as("verdict"))
    exact.unionByName(kept).unionByName(neardup).unionByName(rejected)
  }
}
