package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{F, Portable}
import graft.sources.Tables

/** Round-9 similarity / sketch / corpus-health additions:
  *
  *  - e98 prefix-filter similarity self-join (Bayardo/Ma/Srikant
  *    "Scaling Up All Pairs", WWW'07; Xiao et al. PPJoin, WWW'08): the
  *    EXACT-threshold near-dup join. Unlike e2 (df-cap prune — drops
  *    high-df tokens, approximate recall) and e3 (LSH banding —
  *    probabilistic recall), the prefix filter is lossless: order every
  *    document's token set by ascending global document frequency, and
  *    two sets with Jaccard ≥ t MUST share a token in their first
  *    `|d| − ⌈t·|d|⌉ + 1` tokens — so joining only those prefix
  *    postings finds every qualifying pair, and rare-token-first
  *    ordering makes the prefix postings lists the SHORTEST ones.
  *  - e99 normalized head-prefix dedup: canonicalize (casefold, strip
  *    punctuation, collapse whitespace), key by the first 12 normal
  *    words, group colliding heads — the template-reuse detector for
  *    shared openings whose tails diverge; full-text normalization
  *    dedup is the K→∞ special case of the same key.
  *  - e100 Count-Min-Sketch frequency audit: build the bounded
  *    [[graft.functions.sketches.CmsAgg]] counter matrix in one pass,
  *    then report estimate-vs-exact for the top-30 3-gram occurrences —
  *    the overestimate column IS the measured CMS error, and the whole
  *    sketch is integer-replayable so the oracle recomputes it.
  *  - e101 Zipf-slope corpus-health fit: per source, the OLS slope of
  *    ln(freq) on ln(rank) over the top-200 words. Natural text sits
  *    near −1; a source drifting toward 0 (flat/boilerplate) or below
  *    −1.5 (degenerate repetition) is the classic corpus-mix red flag.
  *    Complements e54 (Heaps-law vocab growth = vocabulary OPENNESS)
  *    with the frequency-decay EXPONENT.
  *
  * Scale design (100 TB), per query:
  *  - e98's work is sum over prefix tokens of df², where the prefix
  *    holds each document's RAREST tokens by construction — the frequent
  *    tokens that make e2-style inverted indexes quadratic never enter
  *    the candidate join (they sit outside every prefix). Verification
  *    touches only candidate pairs, each verified with one bounded
  *    array intersection (token arrays ride a doc-keyed join, payload =
  *    one document's distinct tokens). Four keyed exchanges, no
  *    all-pairs stage anywhere; the df-rank window partitions by doc_id
  *    (bounded frames). At production scale the token sets would be
  *    digests (fixed-width shuffle payload) — shapes unchanged.
  *  - e99 is e1's hash-groupBy with a normalization projection in
  *    front: one shuffle keyed by the normalized head (which stands in
  *    for its digest only to keep the oracle byte-exact — at production
  *    scale the key is fixed-width), text never shuffles past the
  *    first projection.
  *  - e100's sketch build is a NO-SHUFFLE global aggregate (partial
  *    counter matrices merge map-side, one 16 KiB buffer per partition
  *    reaches the driver); the exact side is one gram-keyed aggregation
  *    reused by the probe. The sketch pull is fixed-size at any corpus
  *    scale — the point of the operator.
  *  - e101 aggregates to the (source × word) grain once, windows inside
  *    each source's bounded vocabulary, and fits over ≤ 200 rows per
  *    source — post-aggregation data is vocabulary-sized, never
  *    corpus-sized.
  */
object AnalysisQueries {

  val all: Seq[QueryDef] =
    Seq(e98PrefixJoin, e99HeadDup, e100CmsAudit, e101ZipfSlope,
      e102KmvOverlap, e103DedupRecall)

  // ---- e98: prefix-filter (AllPairs/PPJoin) similarity self-join ----------

  /** Exact Jaccard ≥ 0.6 self-join over distinct word-3-gram shingle
    * sets via the prefix filter (same token universe as e2/e3, so the
    * three near-dup joins are directly comparable: e2 trades recall for
    * a df cap, e3 trades it for banding, e98 pays the prefix postings
    * for EXACT recall). All threshold math is integer (t = 3/5):
    * ⌈3s/5⌉ = (3s+4) div 5, prefix p = s − ⌈3s/5⌉ + 1, and the final
    * predicate `5·ov ≥ 3·(sa+sb−ov)` — no floats anywhere, so both
    * engines agree bit-for-bit; similarity reports as integer basis
    * points `10000·ov div union`. At sf0.01 the filter admits 175
    * candidate pairs out of 124,750 possible (25 survive).
    */
  private def e98PrefixJoin = QueryDef.sql(
    "e98_prefix_join",
    s"""WITH w AS (SELECT doc_id, ${Portable.wordHashesDuck} AS wh
       |  FROM documents),
       |sh AS (SELECT doc_id, ${Portable.shinglesDuck} AS shs FROM w),
       |tok AS (SELECT doc_id, unnest(shs) AS h FROM sh WHERE len(shs) > 0),
       |df AS (SELECT h, count(*) AS df FROM tok GROUP BY h),
       |sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
       |ord AS (SELECT t.doc_id, t.h, s.sz,
       |    row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.h) AS r
       |  FROM tok t JOIN df d USING (h) JOIN sz s USING (doc_id)),
       |pre AS (SELECT doc_id, h FROM ord
       |  WHERE r <= sz - (3*sz + 4) // 5 + 1),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM pre a JOIN pre b ON a.h = b.h AND a.doc_id < b.doc_id),
       |sets AS (SELECT doc_id, list_sort(shs) AS ts, len(shs) AS sz
       |  FROM sh WHERE len(shs) > 0),
       |pairs AS (SELECT c.doc_a, c.doc_b,
       |    len(list_intersect(sa.ts, sb.ts)) AS ov, sa.sz AS sz_a,
       |    sb.sz AS sz_b
       |  FROM cand c JOIN sets sa ON sa.doc_id = c.doc_a
       |  JOIN sets sb ON sb.doc_id = c.doc_b)
       |SELECT doc_a, doc_b, ov, sz_a, sz_b,
       |  10000 * ov // (sz_a + sz_b - ov) AS jaccard_bp
       |FROM pairs WHERE 5 * ov >= 3 * (sz_a + sz_b - ov)
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
    // One distinct-shingle-set projection feeds everything; the postings
    // exchange (keyed by h) is built once and reused by the df census
    // and the prefix self-join, and the doc-keyed exchange is reused by
    // the rank window and the verification array fetch.
    val sets = Tables.documents(s, dir)
      .select(col("doc_id"),
        array_sort(F.shingle_hashes(col("text"))).as("ts"))
      .filter(size(col("ts")) > 0)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("ts"), size(col("ts")).cast("long").as("sz"))
    val tok = sets
      .select(col("doc_id"), col("sz"), explode(col("ts")).as("h"))
      .repartition(col("h"))
    val df = tok.groupBy("h").agg(count(col("doc_id")).as("df"))
    // Rank tokens inside each document by (global df asc, h asc): the
    // window partitions by doc_id, so every frame is one document's
    // token set — bounded, skew-free.
    val ranked = tok.join(df, "h")
      .withColumn("r", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
    val pre = ranked
      .filter(col("r") <= col("sz") - expr("(3 * sz + 4) div 5") + 1)
      .select(col("doc_id"), col("h"), col("r"), col("sz"))
      .repartition(col("h"))
    // PPJoin POSITIONAL filter (Xiao et al., WWW'08): at the pair's
    // FIRST shared prefix token (ranks are monotone in the global
    // (df, h) order, so min(r_a)/min(r_b) land on the same token, and
    // no shared token can precede it — an earlier one would sit inside
    // both prefixes, contradicting minimality), the overlap can't
    // exceed 1 + min(sz_a − r_a, sz_b − r_b); pairs whose bound misses
    // the required overlap ⌈3(sz_a+sz_b)/8⌉ are dropped BEFORE the
    // verification join touches any token array. Lossless: measured
    // 299,607 → 68,602 candidates at sf0.1 (4.4×), final 256 pairs
    // unchanged.
    val cand = pre.as("a")
      .join(pre.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(min(col("a.r")).as("ra"), min(col("b.r")).as("rb"),
        min(col("a.sz")).as("sa"), min(col("b.sz")).as("sb"))
      .filter(lit(1) + least(col("sa") - col("ra"), col("sb") - col("rb"))
        >= expr("(3 * (sa + sb) + 7) div 8"))
      .select("doc_a", "doc_b")
    // Verification fetches token arrays for CANDIDATE docs only: the
    // shingle projection is recomputed behind a doc_id semi-join, so
    // the corpus-wide ShingleHashes pass runs ONCE (for the postings);
    // the re-hash touches only docs that survived the prefix filter.
    // At sf0.1 this costs ~0.3 s over the naive 3-full-hash-pass shape
    // (two extra small joins + stages), but the naive shape's cost is
    // 3× the corpus while this one's verification is bounded by the
    // candidate count — the side to be on at 100 TB.
    val candDocs = cand
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    val setsCand = Tables.documents(s, dir)
      .join(candDocs, "doc_id")
      .select(col("doc_id"),
        array_sort(F.shingle_hashes(col("text"))).as("ts"))
      .filter(size(col("ts")) > 0)
      .select(col("doc_id"), col("ts"), size(col("ts")).cast("long").as("sz"))
    val ov = size(array_intersect(col("sa.ts"), col("sb.ts"))).cast("long")
    cand
      .join(setsCand.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(setsCand.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), ov.as("ov"),
        col("sa.sz").as("sz_a"), col("sb.sz").as("sz_b"))
      .filter(lit(5) * col("ov") >= lit(3) * (col("sz_a") + col("sz_b") - col("ov")))
      .select(col("doc_a"), col("doc_b"), col("ov"), col("sz_a"), col("sz_b"),
        expr("10000 * ov div (sz_a + sz_b - ov)").as("jaccard_bp"))
  }

  // ---- e99: normalized head-prefix duplicate groups -----------------------

  /** Canonicalize-then-key dedup on the document HEAD: normalize
    * (casefold, strip non-alphanumerics, collapse whitespace — the
    * regexp tokenization performs all three), key each document by its
    * first 12 normalized words, and group colliding heads — the
    * template-reuse / shared-opening detector a curation stack runs to
    * catch boilerplate intros and syndicated copies whose tails diverge
    * (full-text normalization-collision dedup is the K→∞ special case
    * of the same key). Per group: smallest doc_id as canonical, member
    * count, how many distinct FULL normalized bodies the group spans,
    * source spread, and whether members are body-identical (`exact`) or
    * share only the head (`head_only`).
    */
  private def e99HeadDup = {
    val K = 12
    QueryDef.sql(
      "e99_head_dup",
      s"""WITH n AS (SELECT doc_id, source,
         |    array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+'),
         |      ' ') AS norm,
         |    array_to_string(list_slice(
         |      regexp_extract_all(lower(text), '[a-z0-9]+'), 1, $K),
         |      ' ') AS head
         |  FROM documents)
         |SELECT min(doc_id) AS canonical_id, count(*) AS n_docs,
         |  count(DISTINCT norm) AS n_body_variants,
         |  count(DISTINCT source) AS n_sources,
         |  CASE WHEN count(DISTINCT norm) = 1 THEN 'exact' ELSE 'head_only'
         |    END AS dup_kind
         |FROM n GROUP BY head HAVING count(*) > 1
         |ORDER BY canonical_id""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          array_join(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"),
            " ").as("norm"),
          array_join(slice(
            expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"), 1, K),
            " ").as("head"))
        .groupBy("head")
        .agg(
          min(col("doc_id")).as("canonical_id"),
          count(lit(1)).as("n_docs"),
          countDistinct(col("norm")).as("n_body_variants"),
          countDistinct(col("source")).as("n_sources"),
          when(countDistinct(col("norm")) === 1, lit("exact"))
            .otherwise(lit("head_only")).as("dup_kind"))
        .filter(col("n_docs") > 1)
        .select("canonical_id", "n_docs", "n_body_variants", "n_sources",
          "dup_kind")
        .orderBy("canonical_id")
    }
  }

  // ---- e100: Count-Min-Sketch frequency audit -----------------------------

  /** CMS estimate vs exact count for the top-30 word-3-gram occurrences
    * (positional grams, repeats counted — the n-gram frequency table a
    * contamination/memorization stage consults, 16k distinct keys at
    * sf0.01). The sketch (4×512 long counters) is built by the native
    * [[graft.functions.sketches.CmsAgg]] in one no-shuffle pass, pulled
    * to the driver (16 KiB — the e29 bounded-pull discipline), and
    * probed with builtin arithmetic; `over_cnt` = estimate − exact ≥ 0
    * is the realized sketch error, capped in probability by the CMS
    * bound e·N/width (≈ 139 at sf0.01's 26k grams — measured max 56).
    * The oracle replays the counter matrix exactly: linear counters,
    * integer bucket arithmetic.
    */
  private def e100CmsAudit = {
    val depth = 4
    val width = 512
    val as = Portable.CmsA
    val bs = Portable.CmsB
    val P = Portable.P
    def duckBucket(i: Int, key: String): String =
      s"((${as(i)} * $key + ${bs(i)}) % $P) % $width"
    def duckBucketCase(key: String): String =
      s"CASE i.i ${(0 until depth).map { i =>
        s"WHEN $i THEN ${duckBucket(i, key)}" }.mkString(" ")} END"
    QueryDef.sql(
      "e100_cms_audit",
      s"""WITH w AS (SELECT doc_id, ${Portable.wordHashesDuck} AS wh
         |  FROM documents),
         |g AS (SELECT doc_id, ${Portable.posShinglesDuck} AS gs FROM w
         |  WHERE len(wh) >= 3),
         |tok AS (SELECT unnest(gs) AS h FROM g),
         |buck AS (SELECT i.i, ${duckBucketCase("h")} AS b, count(*) AS c
         |  FROM tok CROSS JOIN (SELECT unnest(range(0, $depth)) AS i) i
         |  GROUP BY 1, 2),
         |probe AS (SELECT h, count(*) AS exact_cnt FROM tok
         |  GROUP BY h ORDER BY exact_cnt DESC, h LIMIT 30)
         |SELECT p.h AS gram, p.exact_cnt, min(bk.c) AS cms_est,
         |  min(bk.c) - p.exact_cnt AS over_cnt
         |FROM probe p
         |CROSS JOIN (SELECT unnest(range(0, $depth)) AS i) i
         |JOIN buck bk ON bk.i = i.i AND bk.b = ${duckBucketCase("p.h")}
         |GROUP BY 1, 2
         |ORDER BY exact_cnt DESC, gram""".stripMargin) { (s, dir) =>
      val tok = Tables.documents(s, dir)
        .select(F.word_hashes(col("text")).as("wh"))
        .filter(size(col("wh")) >= 3)
        .select(explode(expr(Portable.posShinglesSpark)).as("h"))
      // Build + pull the sketch: one no-shuffle global aggregate (partial
      // counter matrices combine map-side), a 16 KiB driver pull.
      val counters = tok
        .agg(graft.functions.sketches.cms_sketch(col("h"), depth, width)
          .as("cms"))
        .head().getSeq[Long](0).toArray
      val probe = tok.groupBy("h")
        .agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("h"))
        .limit(30)
      val est = graft.functions.sketches.cms_estimate(
        counters, col("h"), depth, width)
      probe.select(col("h").as("gram"), col("exact_cnt"),
        est.as("cms_est"), (est - col("exact_cnt")).as("over_cnt"))
        .orderBy(col("exact_cnt").desc, col("gram"))
    }
  }

  // ---- e102: KMV-sketch cross-source overlap matrix -----------------------

  /** Sketch-estimated cross-source shingle-set Jaccard, calibrated
    * against the exact answer — the sketch-scale path of e52's exact
    * duplication matrix (Beyer et al., SIGMOD'07: the k smallest of
    * KMV(A) ∪ KMV(B) is exactly KMV(A∪B), and the fraction of those
    * k' values present in BOTH input sketches estimates J(A,B)).
    * Estimator per pair: un = k'-smallest of the merged sketches,
    * m = |{v ∈ KMV(A) ∩ KMV(B) : v ≤ un[k']}|, Ĵ = m/k' — all sorted
    * longs and integer arithmetic, replayed bit-for-bit by the oracle.
    * Pairs with zero exact overlap are omitted WITHOUT loss: a value in
    * both sketches IS a shared shingle, so m > 0 ⟹ exact > 0 and the
    * omitted rows are identically zero on both sides.
    *
    * At 100 TB the exact side (Σ df² self-join; the calibration
    * harness) is what production drops: per-source KMV sketches are
    * ≤ k longs each — the whole #sources² overlap matrix computes from
    * a #sources×k table that fits anywhere, replacing the corpus-wide
    * (source, shingle)-distinct pair shuffle.
    */
  private def e102KmvOverlap = {
    val k = 64
    QueryDef.sql(
      "e102_kmv_overlap",
      s"""WITH w AS (SELECT source, ${Portable.wordHashesDuck} AS wh
         |  FROM documents),
         |sh AS (SELECT source, ${Portable.shinglesDuck} AS shs FROM w
         |  WHERE len(wh) >= 3),
         |ex AS (SELECT source, unnest(shs) AS h FROM sh),
         |d AS (SELECT DISTINCT source, h FROM ex),
         |per AS (SELECT source, count(*) AS n,
         |    (list_sort(list(h)))[1:$k] AS kmv
         |  FROM d GROUP BY source),
         |iv AS (SELECT a.source AS source_a, b.source AS source_b,
         |    count(*) AS inter_exact
         |  FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
         |  GROUP BY 1, 2),
         |j AS (SELECT i.source_a, i.source_b, pa.n AS n_a, pb.n AS n_b,
         |    i.inter_exact, pa.kmv AS ka, pb.kmv AS kb
         |  FROM iv i JOIN per pa ON pa.source = i.source_a
         |  JOIN per pb ON pb.source = i.source_b),
         |c1 AS (SELECT *, list_sort(list_distinct(ka || kb)) AS un0 FROM j),
         |c2 AS (SELECT *, least($k, len(un0)) AS kp FROM c1),
         |c3 AS (SELECT *, un0[kp] AS thr FROM c2),
         |c4 AS (SELECT *,
         |    len(list_filter(list_intersect(ka, kb), x -> x <= thr)) AS m
         |  FROM c3)
         |SELECT source_a, source_b, CAST(n_a AS BIGINT) AS n_a,
         |  CAST(n_b AS BIGINT) AS n_b, inter_exact,
         |  10000 * inter_exact // (n_a + n_b - inter_exact)
         |    AS jac_exact_bp,
         |  CAST(10000 * m // kp AS BIGINT) AS jac_est_bp,
         |  CAST(abs(10000 * m // kp -
         |    10000 * inter_exact // (n_a + n_b - inter_exact)) AS BIGINT)
         |    AS err_bp
         |FROM c4 ORDER BY source_a, source_b""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir)
        .select(col("source"),
          explode(F.shingle_hashes(col("text"))).as("h"))
        .distinct()
      val per = d.groupBy("source")
        .agg(count(lit(1)).as("n"),
          graft.functions.sketches.kmv_sketch(col("h"), k).as("kmv"))
      val iv = d.as("a")
        .join(d.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("inter_exact"))
      val un0 = array_sort(array_distinct(concat(col("ka"), col("kb"))))
      val jacExact =
        expr("10000 * inter_exact div (n_a + n_b - inter_exact)")
      val jacEst = expr(s"10000 * m div kp")
      iv
        .join(per.as("pa"), col("source_a") === col("pa.source"))
        .join(per.as("pb"), col("source_b") === col("pb.source"))
        .select(col("source_a"), col("source_b"),
          col("pa.n").as("n_a"), col("pb.n").as("n_b"),
          col("inter_exact"), col("pa.kmv").as("ka"), col("pb.kmv").as("kb"))
        .withColumn("un0", un0)
        .withColumn("kp", least(lit(k), size(col("un0"))))
        .withColumn("thr", element_at(col("un0"), col("kp")))
        .withColumn("m",
          size(filter(array_intersect(col("ka"), col("kb")),
            x => x <= col("thr"))))
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
          col("inter_exact"), jacExact.as("jac_exact_bp"),
          jacEst.as("jac_est_bp"),
          abs(jacEst - jacExact).as("err_bp"))
        .orderBy("source_a", "source_b")
    }
  }

  // ---- e101: Zipf-slope corpus-health fit ---------------------------------

  /** Per-source OLS fit of ln(freq) on ln(rank) over the top-200 words
    * (rank by count desc, word asc — fully tie-broken). Slope and r²
    * round at 4 dp with the `+ 0` normalization (QueryDef scaladoc);
    * e22's precedent pins that last-ulp ln() drift survives 4-dp
    * rounding on this data.
    */
  private def e101ZipfSlope = {
    val topN = 200
    QueryDef.sql(
      "e101_zipf_slope",
      s"""WITH w AS (SELECT source, ${Portable.wordsDuck} AS ws
         |  FROM documents),
         |tok AS (SELECT source, unnest(ws) AS wd FROM w),
         |cnt AS (SELECT source, wd, count(*) AS c FROM tok GROUP BY 1, 2),
         |rk AS (SELECT source, c,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY c DESC, wd) AS rank
         |  FROM cnt),
         |top AS (SELECT source, ln(CAST(rank AS DOUBLE)) AS lx,
         |    ln(CAST(c AS DOUBLE)) AS ly
         |  FROM rk WHERE rank <= $topN)
         |SELECT source, count(*) AS n_words,
         |  round(regr_slope(ly, lx), 4) + 0 AS zipf_slope,
         |  round(regr_r2(ly, lx), 4) + 0 AS r2
         |FROM top GROUP BY source ORDER BY source""".stripMargin) {
      (s, dir) =>
        val cnt = Tables.documents(s, dir)
          .select(col("source"), explode(expr(Portable.wordsSpark)).as("wd"))
          .groupBy("source", "wd").agg(count(lit(1)).as("c"))
        // Window partitions by source over its aggregated vocabulary —
        // post-agg cardinality, not corpus rows.
        val top = cnt
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("c").desc, col("wd"))))
          .filter(col("rank") <= topN)
          .select(col("source"), log(col("rank").cast("double")).as("lx"),
            log(col("c").cast("double")).as("ly"))
        top.groupBy("source")
          .agg(
            count(lit(1)).as("n_words"),
            (round(covar_pop(col("ly"), col("lx")) / var_pop(col("lx")), 4)
              + lit(0)).as("zipf_slope"),
            // DuckDB's regr_r2 convention for a constant y (var=0) is a
            // perfect fit (1.0); Spark's corr would yield NaN — match it.
            (round(when(var_pop(col("ly")) === 0, lit(1.0))
              .otherwise(pow(corr(col("ly"), col("lx")), 2)), 4) + lit(0))
              .as("r2"))
          .orderBy("source")
    }
  }

  // ---- e103: dedup-detector recall audit ----------------------------------

  /** Candidate-generator recall matrix: the three sub-quadratic near-dup
    * detectors, each scored against the EXACT set of pairs at Jaccard
    * ≥ 3/5 (derived via e98's prefix+positional filter, whose recall is
    * 1 by the AllPairs theorem — the one generator allowed to define
    * truth). Per method: candidate count, hits, recall and candidate
    * efficiency (pre-verification precision) in basis points —
    * the measured form of each method's design trade:
    *
    *  - `prefix` (e98): recall 10000 by construction; efficiency is
    *    what the positional filter bought.
    *  - `lsh` (e3's r=2, b=6 banding): collision probability at
    *    J = 0.6 is 1 − (1 − 0.36)^6 ≈ 0.93 — the measured recall
    *    should sit near it (pair-level, so dup-heavy corpora differ).
    *  - `winnow` (e80's w=4/k=3 fingerprints, df ≤ 100, ≥ 2 shared):
    *    guaranteed for shared word RUNS ≥ 7, not for scattered
    *    overlap — recall on high-Jaccard pairs measures how much of
    *    the corpus's duplication is run-shaped.
    *
    * The audit is the detector-selection artifact: at 100 TB one runs
    * it on a sampled slice to pick the cheapest detector whose recall
    * clears the pipeline's bar. All counts integer; one row per method.
    */
  private def e103DedupRecall = QueryDef.sql(
    "e103_dedup_recall",
    s"""WITH w AS (SELECT doc_id, ${Portable.wordHashesDuck} AS wh
       |  FROM documents),
       |sh AS (SELECT doc_id, ${Portable.shinglesDuck} AS shs FROM w
       |  WHERE len(wh) >= 3),
       |tok AS (SELECT doc_id, unnest(shs) AS h FROM sh WHERE len(shs) > 0),
       |df AS (SELECT h, count(*) AS df FROM tok GROUP BY h),
       |sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
       |ord AS (SELECT t.doc_id, t.h, s.sz,
       |    row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.h) AS r
       |  FROM tok t JOIN df d USING (h) JOIN sz s USING (doc_id)),
       |pre AS (SELECT doc_id, h, r, sz FROM ord
       |  WHERE r <= sz - (3*sz + 4) // 5 + 1),
       |cand0 AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    min(a.r) AS ra, min(b.r) AS rb, min(a.sz) AS sa, min(b.sz) AS sb
       |  FROM pre a JOIN pre b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |candp AS (SELECT doc_a, doc_b FROM cand0
       |  WHERE 1 + least(sa - ra, sb - rb) >= (3*(sa + sb) + 7) // 8),
       |truth AS (SELECT doc_a, doc_b FROM (
       |    SELECT c.doc_a, c.doc_b,
       |      len(list_intersect(sa.shs, sb.shs)) AS ov,
       |      len(sa.shs) AS za, len(sb.shs) AS zb
       |    FROM candp c JOIN sh sa ON sa.doc_id = c.doc_a
       |    JOIN sh sb ON sb.doc_id = c.doc_b)
       |  WHERE 5*ov >= 3*(za + zb - ov)),
       |tc AS (SELECT count(*) AS n_truth FROM truth),
       |mh AS (SELECT doc_id,
       |  ${(0 until 12).map(k =>
            s"list_min(list_transform(shs, x -> (${Portable.MinHashA(k)}*x" +
            s" + ${Portable.MinHashB(k)}) % ${Portable.P})) AS mh$k")
            .mkString(",\n  ")}
       |  FROM sh WHERE len(shs) > 0),
       |bands AS (SELECT doc_id, unnest(range(0, 6)) AS band_id,
       |    unnest(${(0 until 6).map(k =>
              s"mh${2 * k}*${Portable.P} + mh${2 * k + 1}")
              .mkString("[", ", ", "]")}) AS band_key
       |  FROM mh),
       |lshc AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band_id = b.band_id
       |    AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |gr AS (SELECT doc_id, ${Portable.posShinglesDuck} AS g FROM w
       |  WHERE len(wh) >= 3),
       |fps AS (SELECT doc_id, ${Portable.winnowedDuck} AS fp_set FROM gr),
       |fex AS (SELECT doc_id, unnest(fp_set) AS fp FROM fps),
       |fkept AS (SELECT fp FROM fex GROUP BY fp HAVING count(*) <= 100),
       |fpr AS (SELECT fex.doc_id, fex.fp FROM fex JOIN fkept USING (fp)),
       |winc AS (SELECT doc_a, doc_b FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
       |    FROM fpr a JOIN fpr b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2) WHERE c >= 2),
       |trutht AS (SELECT doc_a, doc_b, 1 AS t FROM truth),
       |stats AS (
       |  SELECT 'prefix' AS method, count(*) AS n_cand,
       |    CAST(sum(coalesce(t, 0)) AS BIGINT) AS n_hit
       |  FROM candp c LEFT JOIN trutht t USING (doc_a, doc_b)
       |  UNION ALL
       |  SELECT 'lsh', count(*), CAST(sum(coalesce(t, 0)) AS BIGINT)
       |  FROM lshc c LEFT JOIN trutht t USING (doc_a, doc_b)
       |  UNION ALL
       |  SELECT 'winnow', count(*), CAST(sum(coalesce(t, 0)) AS BIGINT)
       |  FROM winc c LEFT JOIN trutht t USING (doc_a, doc_b))
       |SELECT method, n_cand, n_hit, tc.n_truth,
       |  CAST(CASE WHEN tc.n_truth = 0 THEN 10000
       |    ELSE 10000 * n_hit // tc.n_truth END AS BIGINT) AS recall_bp,
       |  CAST(CASE WHEN n_cand = 0 THEN 10000
       |    ELSE 10000 * n_hit // n_cand END AS BIGINT) AS efficiency_bp
       |FROM stats CROSS JOIN tc
       |ORDER BY method""".stripMargin) { (s, dir) =>
    val P = Portable.P
    val sets = Tables.documents(s, dir)
      .select(col("doc_id"),
        array_sort(F.shingle_hashes(col("text"))).as("ts"))
      .filter(size(col("ts")) > 0)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("ts"), size(col("ts")).cast("long").as("sz"))
    val tok = sets
      .select(col("doc_id"), col("sz"), explode(col("ts")).as("h"))
      .repartition(col("h"))
    val dfc = tok.groupBy("h").agg(count(col("doc_id")).as("df"))
    val ranked = tok.join(dfc, "h")
      .withColumn("r", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))))
    val pre = ranked
      .filter(col("r") <= col("sz") - expr("(3 * sz + 4) div 5") + 1)
      .select(col("doc_id"), col("h"), col("r"), col("sz"))
      .repartition(col("h"))
    val candp = pre.as("a")
      .join(pre.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(min(col("a.r")).as("ra"), min(col("b.r")).as("rb"),
        min(col("a.sz")).as("sa"), min(col("b.sz")).as("sb"))
      .filter(lit(1) + least(col("sa") - col("ra"), col("sb") - col("rb"))
        >= expr("(3 * (sa + sb) + 7) div 8"))
      .select("doc_a", "doc_b")
    val ov = size(array_intersect(col("sa.ts"), col("sb.ts"))).cast("long")
    val truth = candp
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), ov.as("ov"),
        col("sa.sz").as("za"), col("sb.sz").as("zb"))
      .filter(lit(5) * col("ov") >= lit(3) * (col("za") + col("zb") - col("ov")))
      .select("doc_a", "doc_b")
    val sig = sets.select(col("doc_id"), F.min_hashes(col("ts")).as("sig"))
    val bandKeys = array((0 until 6).map(k =>
      element_at(col("sig"), 2 * k + 1) * P +
        element_at(col("sig"), 2 * k + 2)): _*)
    val bands = sig.select(col("doc_id"),
      posexplode(bandKeys).as(Seq("band_id", "band_key")))
    val lshc = bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val fex = Tables.documents(s, dir)
      .select(col("doc_id"), F.winnow_hashes(col("text")).as("fp_set"))
      .filter(size(col("fp_set")) > 0)
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id"), explode(col("fp_set")).as("fp"))
      .repartition(col("fp"))
    val fkept = fex.groupBy("fp").agg(count(col("doc_id")).as("fdf"))
      .filter(col("fdf") <= 100).select("fp")
    val fpr = fex.join(fkept, "fp")
    val winc = fpr.as("a")
      .join(fpr.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .select("doc_a", "doc_b")
    val truthTagged = truth.withColumn("t", lit(1))
    def audit(name: String, cand: DataFrame): DataFrame = cand
      .join(truthTagged, Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_cand"),
        coalesce(sum(col("t")), lit(0)).cast("long").as("n_hit"))
      .select(lit(name).as("method"), col("n_cand"), col("n_hit"))
    val tc = truth.agg(count(lit(1)).as("n_truth"))
    audit("prefix", candp)
      .union(audit("lsh", lshc))
      .union(audit("winnow", winc))
      .crossJoin(broadcast(tc))
      // Dup-free-corpus guard: ANSI div would fail loudly on n_truth=0
      // or an empty candidate set; vacuous ratios report as 10000.
      .select(col("method"), col("n_cand"), col("n_hit"), col("n_truth"),
        expr("case when n_truth = 0 then 10000L " +
          "else 10000 * n_hit div n_truth end").as("recall_bp"),
        expr("case when n_cand = 0 then 10000L " +
          "else 10000 * n_hit div n_cand end").as("efficiency_bp"))
      .orderBy("method")
  }
}
