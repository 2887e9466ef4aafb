package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hop-decayed max-plus quality propagation over a document graph — the
  * core of query e105 (AnalysisQueries), factored out so the sbt suite
  * can exercise the LIFTING path on a constructed graph: on the fixed
  * synthetic corpus every near-dup pair's quality scores sit within
  * ~131 bp of each other (measured at sf0.01), far under any meaningful
  * hop decay, so the oracle-compared query correctly lifts nothing
  * there.
  *
  * Each round replaces every node's score with
  * `max(own, max(neighbors' scores) - decayBp)` — max over integers is
  * associative and order-free, so the result is deterministic under any
  * partitioning/merge order, and a node with no in-edges is left
  * unchanged (left join + coalesce to 0: scores are non-negative, so a
  * decayed-below-zero neighbor can never win).
  *
  * Scale: per round, one src-keyed join of the edge list against the
  * score frame, one dst-keyed max aggregation (map-side partial max),
  * one doc-keyed left join — linear in |E| + |V| per round with a small
  * constant round count (contagion saturates fast under decay).
  */
object QualityPropagate {

  /** @param edges  directed edges `(src, dst)`; propagate src → dst.
    *               Pass both directions for an undirected graph.
    * @param scores node scores `(doc_id, bp)`, integer basis points.
    * @return       `(doc_id, bp)` after `rounds` rounds.
    */
  def propagate(
      edges: DataFrame, scores: DataFrame,
      rounds: Int, decayBp: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    require(decayBp >= 0, s"decayBp must be >= 0, got $decayBp")
    (1 to rounds).foldLeft(scores) { (p, _) =>
      val nb = edges
        .join(p.select(col("doc_id").as("src"), col("bp")), "src")
        .groupBy(col("dst").as("doc_id"))
        .agg((max(col("bp")) - decayBp).as("nb"))
      p.join(nb, Seq("doc_id"), "left")
        .select(col("doc_id"),
          greatest(col("bp"), coalesce(col("nb"), lit(0L))).as("bp"))
    }
  }
}
