package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming arrival-order token-budget shard assignment — the
  * incremental half of the e34/e73 delivery pipeline, and the operating
  * mode e77's stability audit argues FOR: because shards are cut in
  * arrival order, a delta batch only ever EXTENDS the shard sequence
  * (the audit's measured `moved_bp = 0` row), so already-shipped shards
  * and their e73 manifests stay valid forever and each completed shard
  * can be finalized the moment the cursor passes its budget boundary.
  *
  * State per source is O(1) — one (cumTokens, lastDocId, nDocs) cursor,
  * regardless of stream length — where a batch recompute over the
  * growing corpus would rescan everything shipped so far: at 100 TB the
  * cursor IS the only viable sharder. Parallelism is per-source (the
  * same keying as the delivery layout); a single pathological source is
  * inherently sequential here exactly as it is on disk — shard ids are
  * a running total, so the split lever is upstream (more sources /
  * source sub-partitions), never a post-hoc re-key.
  *
  * Arrival discipline: within a micro-batch, rows are folded in doc_id
  * order (ingestion offsets are monotone per source — the StreamingIngest
  * load-by-file contract); a doc at or below the cursor's high-water
  * doc_id is OUT OF ORDER and is quarantined with `shard_id = -1`
  * WITHOUT advancing the cursor (replayed or misrouted rows must not
  * double-count tokens — the at-least-once posture of StreamDedup,
  * expressed as a dead-letter lane instead of a silent merge).
  *
  * The assignment rule is e34's verbatim: `shard_id = cum_before div
  * budget` with `cum_before` the exclusive prefix sum of token counts —
  * a doc straddling a boundary belongs to the shard it starts in
  * (document-preserving packing), and the spec pins stream output equal
  * to the batch rule over the same rows.
  */
object StreamShardAssign {

  /** One arriving document: token count for `doc_id` of `source`. */
  final case class Doc(source: String, doc_id: Long, n_tok: Long)

  /** One assignment: the shard this doc belongs to, its exclusive
    * token offset within the source, and the cursor's running doc
    * count. `shard_id = -1` marks a quarantined out-of-order arrival.
    */
  final case class Assigned(
      source: String, doc_id: Long, n_tok: Long,
      shard_id: Long, cum_before: Long, n_docs: Long)

  /** Per-source cursor: lifetime token total, high-water doc_id, and
    * lifetime accepted-doc count.
    */
  final case class Cursor(cumTokens: Long, lastDocId: Long, nDocs: Long)

  private def update(budget: Long)(
      source: String, rows: Iterator[Doc],
      state: GroupState[Cursor]): Iterator[Assigned] = {
    var cur = state.getOption.getOrElse(Cursor(0L, Long.MinValue, 0L))
    val out = Seq.newBuilder[Assigned]
    // in-batch sort bounded by the micro-batch's per-source slice (the
    // Sessionize discipline) — offsets within one batch need not be
    // delivered sorted even when generation is monotone
    rows.toSeq.sortBy(_.doc_id).foreach { d =>
      if (d.doc_id <= cur.lastDocId) {
        out += Assigned(source, d.doc_id, d.n_tok, -1L, -1L, cur.nDocs)
      } else {
        out += Assigned(source, d.doc_id, d.n_tok,
          cur.cumTokens / budget, cur.cumTokens, cur.nDocs + 1)
        cur = Cursor(cur.cumTokens + d.n_tok, d.doc_id, cur.nDocs + 1)
      }
    }
    state.update(cur)
    out.result().iterator
  }

  /** Incremental shard ids for a stream of per-source documents; emits
    * one [[Assigned]] row per input doc per micro-batch.
    */
  def assign(docs: Dataset[Doc], budget: Long): Dataset[Assigned] = {
    require(budget > 0, "shard token budget must be positive")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Cursor, Assigned](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(update(budget))
  }
}
