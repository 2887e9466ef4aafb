package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming context-packing assignment — the incremental half of e78's
  * split-allowed (concatenate-then-chunk) regime: as documents arrive,
  * each is assigned the span of fixed-size training contexts it
  * occupies, from the same closed form the batch manifest uses — a doc
  * at source token offset `cum` spanning `n_tok` tokens occupies
  * contexts `floor(cum/C) .. floor((cum+n_tok-1)/C)`.
  *
  * State per source is O(1) — one (cumTokens, lastDocId, nDocs)
  * cursor — and because packing is arrival-order, a delta batch only
  * EXTENDS the context sequence (e77's stability argument in packing
  * form): every context strictly below the cursor's current context is
  * FULL and immutable the moment the cursor passes its boundary, which
  * is exactly what `n_sealed` reports — a downstream finalizer can ship
  * context `c` as soon as some emitted row seals it, without any
  * corpus-wide recount.
  *
  * Arrival discipline matches [[StreamShardAssign]]: rows fold in
  * doc_id order within a micro-batch, and a doc at or below the
  * high-water doc_id is quarantined with `ctx_first = ctx_last = -1`
  * without advancing the cursor (replays must not double-count tokens).
  */
object StreamPackContexts {

  /** One arriving document: token count for `doc_id` of `source`. */
  final case class Doc(source: String, doc_id: Long, n_tok: Long)

  /** One packing assignment: the inclusive context span this doc
    * occupies, its token offset within `ctx_first`, and how many
    * contexts its arrival sealed (filled to exactly C tokens).
    * `ctx_first = -1` marks a quarantined out-of-order arrival.
    */
  final case class Packed(
      source: String, doc_id: Long, n_tok: Long,
      ctx_first: Long, ctx_last: Long, off_in_ctx: Long, n_sealed: Long)

  /** Per-source cursor: lifetime token total, high-water doc_id, and
    * lifetime accepted-doc count.
    */
  final case class Cursor(cumTokens: Long, lastDocId: Long, nDocs: Long)

  private def update(ctxLen: Long)(
      source: String, rows: Iterator[Doc],
      state: GroupState[Cursor]): Iterator[Packed] = {
    var cur = state.getOption.getOrElse(Cursor(0L, Long.MinValue, 0L))
    val out = Seq.newBuilder[Packed]
    rows.toSeq.sortBy(_.doc_id).foreach { d =>
      if (d.doc_id <= cur.lastDocId) {
        out += Packed(source, d.doc_id, d.n_tok, -1L, -1L, -1L, 0L)
      } else if (d.n_tok <= 0L) {
        // empty docs occupy no tokens: skip without advancing, matching
        // the batch manifest's n_tok > 0 filter
        out += Packed(source, d.doc_id, d.n_tok, -1L, -1L, -1L, 0L)
      } else {
        val cum = cur.cumTokens
        val after = cum + d.n_tok
        out += Packed(source, d.doc_id, d.n_tok,
          cum / ctxLen, (after - 1) / ctxLen, cum % ctxLen,
          after / ctxLen - cum / ctxLen)
        cur = Cursor(after, d.doc_id, cur.nDocs + 1)
      }
    }
    state.update(cur)
    out.result().iterator
  }

  /** Incremental context spans for a stream of per-source documents;
    * emits one [[Packed]] row per input doc per micro-batch.
    */
  def pack(docs: Dataset[Doc], ctxLen: Long): Dataset[Packed] = {
    require(ctxLen > 0, "context length must be positive")
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Cursor, Packed](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(update(ctxLen))
  }
}
