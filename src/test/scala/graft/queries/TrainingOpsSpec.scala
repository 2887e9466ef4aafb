package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Behavior pins for the curation-stage operators (beyond the oracle
  * row/hash compare): redaction actually removes every PII form, chunk
  * geometry obeys the window/stride contract, the split is exhaustive
  * and disjoint, and quantization output stays in int8 range.
  */
class TrainingOpsSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("e19: every synthesized PII form is found once and redacted") {
    val out = q("e19_pii_redact").cache()
    // each message carries exactly one email, one phone, one IP
    assert(out.filter(
      col("n_email") =!= 1 || col("n_phone") =!= 1 || col("n_ip") =!= 1)
      .isEmpty)
    // and the redacted text carries the placeholders, never the raw forms
    assert(out.filter(!col("redacted").contains("[EMAIL]") ||
      !col("redacted").contains("[PHONE]") ||
      !col("redacted").contains("[IP]")).isEmpty)
    assert(out.filter(col("redacted").rlike("@|[0-9]{3}-[0-9]{3}")).isEmpty)
    out.unpersist()
  }

  test("e24: chunk geometry follows window=64 stride=48") {
    val out = q("e24_chunking").cache()
    assert(out.filter(col("n_words") > 64).isEmpty)
    assert(out.filter(col("chunk_start") =!= col("chunk_id") * 48).isEmpty)
    // chunk ids are contiguous from 0 within each doc: max_id + 1 = count
    val perDoc = out.groupBy("doc_id")
      .agg(max("chunk_id").as("mx"), count(lit(1)).as("n"))
    assert(perDoc.filter(col("mx") + 1 =!= col("n")).isEmpty)
    out.unpersist()
  }

  test("e24 routing equals brute-force window slicing at boundary sizes") {
    // word counts straddling every W/S boundary case: empty, single,
    // exactly one window, one past it, stride edges, two windows, ...
    import spark.implicits._
    val W = 64; val S = 48
    val sizes = Seq(0, 1, 47, 48, 63, 64, 65, 111, 112, 113, 160, 200)
    val docs = sizes.zipWithIndex
      .map { case (n, id) => (id.toLong, (0 until n).map(i => s"w$i").mkString(" ")) }
      .toDF("doc_id", "text")
    val routed = TrainingQueries.chunked(docs, W, S)
      .select("doc_id", "chunk_id", "n_words")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = sizes.zipWithIndex.flatMap { case (n, id) =>
      val nChunks = if (n == 0) 0 else math.max(1, math.ceil((n - W).toDouble / S).toInt + 1)
      (0 until nChunks).flatMap { j =>
        val len = math.max(0, math.min(n, j * S + W) - j * S)
        if (len > 0) Some((id.toLong, j.toLong) -> len.toLong) else None
      }
    }.toMap
    assert(routed === expected)
  }

  test("e23: split is exhaustive over documents and roughly 80/10/10") {
    val rows = q("e23_train_split").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = graft.sources.Tables.documents(spark, dir).count()
    assert(total === docs)
    val bysplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    assert(bysplit.keySet === Set("train", "val", "test"))
    // 6-sigma binomial bounds at n = docs
    val n = docs.toDouble
    assert(math.abs(bysplit("train") / n - 0.8) < 6 * math.sqrt(0.8 * 0.2 / n))
  }

  test("e26: quantization stays in int8 range with positive scale") {
    val out = q("e26_quantize")
    assert(out.filter(col("scale") <= 0).isEmpty)
    // n_pos bounded by dims; checksum within [0, P)
    assert(out.filter(col("n_pos") > 64 || col("n_pos") < 0).isEmpty)
    assert(out.filter(
      col("checksum") < 0 || col("checksum") >= graft.functions.Portable.P)
      .isEmpty)
  }

  test("e74: epoch schedule arithmetic is self-consistent") {
    val out = q("e74_epoch_schedule").cache()
    // epochs_bp is the integer-division basis-point ratio of quota to size
    assert(out.filter(
      col("epochs_bp") =!= expr("quota_tokens * 10000 div n_tokens"))
      .isEmpty)
    // capped <=> demand exceeds cap*size; shortfall agrees with capping
    assert(out.filter(
      (col("quota_tokens") > lit(4L) * col("n_tokens")) =!=
        (col("capped") === 1L)).isEmpty)
    assert(out.filter(
      col("eff_tokens") + col("shortfall_tokens") =!= col("quota_tokens"))
      .isEmpty)
    assert(out.filter(
      (col("shortfall_tokens") > 0L) =!= (col("capped") === 1L)).isEmpty)
    // floor() in the quota keeps the schedule within budget
    val totalQuota = out.agg(sum("quota_tokens")).head.getLong(0)
    assert(totalQuota <= 1000000L, s"schedule over budget: $totalQuota")
    out.unpersist()
  }

  test("e75: fertility bounds — every word >= 1 token, every token >= 1 char") {
    val out = q("e75_token_fertility").cache()
    assert(out.filter(col("fertility_bp") < 10000).isEmpty)
    assert(out.filter(col("chars_per_token_bp") < 10000).isEmpty)
    assert(out.filter(col("n_tokens") > col("n_chars") ||
      col("n_tokens") < col("n_words")).isEmpty)
    out.unpersist()
  }

  test("e76: decile bins have disjoint, ordered score ranges covering all docs") {
    val rows = q("e76_curriculum_bins").orderBy("bin").collect()
    assert(rows.nonEmpty && rows.forall { r =>
      val b = r.getAs[Int]("bin"); b >= 0 && b <= 9
    })
    // consecutive bins never overlap in score space
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getAs[Long]("hi_score_bp") < hi.getAs[Long]("lo_score_bp"))
      case _ =>
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val docs = graft.sources.Tables.documents(spark, dir)
      .where(size(expr(graft.functions.Portable.wordsSpark)) > 0).count()
    assert(total === docs)
  }

  test("e77: appends never re-shard arrival-order shards; shuffled-order " +
    "sharding moves most of the base corpus") {
    val rows = q("e77_shard_stability").collect()
      .map(r => r.getAs[String]("mode") ->
        (r.getAs[Long]("n_base_docs"), r.getAs[Long]("n_moved"),
          r.getAs[Long]("moved_bp"))).toMap
    assert(rows("arrival")._2 === 0L)
    assert(rows("arrival")._3 === 0L)
    // the permutation interleaves the delta throughout: most base docs move
    assert(rows("shuffled")._3 > 5000L,
      s"expected >50% reassignment, got ${rows("shuffled")}")
    assert(rows("arrival")._1 === rows("shuffled")._1)
  }

  test("e78: every context except the tail is exactly full; token mass " +
    "and splits are conserved") {
    val rows = q("e78_pack_contexts").orderBy("ctx_id").collect()
    val last = rows.length - 1
    // contiguous ids from 0
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("ctx_id") === i.toLong)
    }
    // full contexts everywhere but the tail
    rows.init.foreach(r => assert(r.getAs[Long]("n_tokens") === 512L))
    assert(rows(last).getAs[Long]("n_tokens") <= 512L)
    // token mass equals the corpus total
    val total = graft.sources.Tables.documents(spark, dir)
      .agg(sum(size(expr(graft.functions.Portable.wordsSpark))
        .cast("long"))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === total)
    // a context's split docs continue into the next: every non-tail
    // context with a split must share its last_doc with the next's first
    rows.sliding(2).foreach {
      case Array(a, b) =>
        if (a.getAs[Long]("n_split") > 0)
          assert(a.getAs[Long]("last_doc") === b.getAs[Long]("first_doc"))
      case _ =>
    }
    assert(rows(last).getAs[Long]("n_split") === 0L)
  }

  test("e79: both regimes batch the same corpus; length-sorting strictly " +
    "cuts pad waste") {
    val rows = q("e79_length_buckets").collect()
      .map(r => r.getAs[String]("mode") -> r).toMap
    assert(rows.keySet === Set("arrival", "sorted"))
    val (a, s) = (rows("arrival"), rows("sorted"))
    // identical corpus, identical batch count — only the assignment moves
    assert(a.getAs[Long]("n_batches") === s.getAs[Long]("n_batches"))
    assert(a.getAs[Long]("n_tokens") === s.getAs[Long]("n_tokens"))
    // sorting can only shrink every pad metric
    assert(s.getAs[Long]("pad_tokens") <= a.getAs[Long]("pad_tokens"))
    assert(s.getAs[Long]("max_batch_pad") <= a.getAs[Long]("max_batch_pad"))
    // on sf0.001's length spread the cut is large (~9x at sf0.01)
    assert(s.getAs[Long]("pad_bp") < a.getAs[Long]("pad_bp"))
    // pad_bp is pad over padded capacity (= pad + real tokens), in bp
    Seq(a, s).foreach { r =>
      val (pad, tok) = (r.getAs[Long]("pad_tokens"), r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("pad_bp") === pad * 10000L / (pad + tok))
    }
  }

  test("e82: the interleave schedule spreads every source evenly — " +
    "bounded gaps, no long same-source runs") {
    val rows = q("e82_interleave_schedule").collect()
    assert(rows.length === 20)
    val total = rows.map(_.getAs[Long]("n_units")).sum
    rows.foreach { r =>
      val u = r.getAs[Long]("n_units")
      assert(u >= 1L)
      val ideal = total / u // target spacing for this source
      if (u >= 2L) {
        val (lo, hi) = (r.getAs[Long]("min_gap"), r.getAs[Long]("max_gap"))
        // even spread: consecutive units of a source land within a
        // factor-2 band of the ideal gap, never adjacent-heavy
        assert(lo >= ideal / 2,
          s"${r.getString(0)}: min_gap $lo < ideal/2 ${ideal / 2}")
        assert(hi <= 2 * ideal + 2,
          s"${r.getString(0)}: max_gap $hi > 2*ideal+2 ${2 * ideal + 2}")
      }
      // a minority source (< half the stream) never ships back-to-back
      if (2 * u < total) assert(r.getAs[Long]("max_run") === 1L)
    }
  }

  test("e83: memorization audit ranks repeated 8-grams — counts " +
    "consistent, descending, keys in-range") {
    val rows = q("e83_memorization_ngrams").collect()
    assert(rows.length === 20)
    var prev = Long.MaxValue
    rows.foreach { r =>
      val (key, n, nd) = (r.getAs[Long]("gram_key"), r.getAs[Long]("n"),
        r.getAs[Long]("n_docs"))
      assert(key >= 0L && key < graft.functions.Portable.P)
      assert(n >= 2L, s"gram $key: n $n < 2 escaped the HAVING filter")
      assert(nd >= 1L && nd <= n,
        s"gram $key: n_docs $nd outside [1, n=$n]")
      assert(n <= prev, s"gram $key: n $n not descending (prev $prev)")
      prev = n
    }
    // a gram repeated across documents must show a real example doc
    val multi = rows.filter(_.getAs[Long]("n_docs") >= 2L)
    assert(multi.nonEmpty,
      "sf0.01 carries exact-dup clusters; expected cross-doc repeats")
    multi.foreach(r => assert(r.getAs[Long]("example_doc") >= 0L))
  }

  test("e84: boilerplate prefixes rank top-3 per source with " +
    "consistent shares") {
    val rows = q("e84_boilerplate_prefix").collect()
    assert(rows.length === 60) // 3 ranks x 20 sources
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L, 3L))
      val counts = sorted.map(_.getAs[Long]("n_docs"))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"$src: n_docs not descending across ranks: ${counts.toSeq}")
      val shares = sorted.map(_.getAs[Long]("share_bp"))
      assert(shares.forall(bp => bp >= 0L && bp <= 10000L))
      // three disjoint prefix groups can never exceed the whole source
      assert(shares.sum <= 10000L, s"$src: top-3 shares ${shares.toSeq}")
    }
  }

  test("e85: char-skew scores sit inside the algebraic envelope " +
    "(uniform floor, top-share ceiling)") {
    val rows = q("e85_char_skew").collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (top, simp) =
        (r.getAs[Long]("top_bp"), r.getAs[Long]("simpson_bp"))
      assert(r.getAs[Long]("n_letters") > 0L)
      // Cauchy-Schwarz over <= 26 letters: collision mass >= 1/26
      assert(simp >= 384L, s"doc ${r.getLong(0)}: simpson_bp $simp < 384")
      // collision mass never exceeds the max letter share
      assert(simp <= top, s"doc ${r.getLong(0)}: simpson $simp > top $top")
      assert(top <= 10000L)
    }
    // English-like synthetic text is skewed but nowhere near char spam
    val meanSimp = rows.map(_.getAs[Long]("simpson_bp")).sum / rows.length
    assert(meanSimp > 384L && meanSimp < 3000L,
      s"mean simpson_bp $meanSimp outside the natural-text band")
  }

  test("e55: surprisal bounds hold, and repeated text scores below " +
    "shuffled-rare text") {
    val out = q("e55_lm_surprisal")
    // per-position proxy is floor(1000 * (c1+V)/(c12+1)): with add-one
    // smoothing c12+1 <= c1+1 <= c1+V always, so every position
    // contributes >= 1000 — avg_surprisal below 1000 is arithmetically
    // impossible; zero/negative counts likewise
    assert(out.filter(col("n_bigrams") <= 0).isEmpty)
    assert(out.filter(col("avg_surprisal") < 1000).isEmpty)
    assert(out.filter(col("surprisal") <
      col("n_bigrams") * 1000).isEmpty)

    // discrimination: a corpus of one heavily-repeated sentence plus one
    // unique-word document must rank the repeated doc as LESS surprising
    // — the property the perplexity filter exists for
    import spark.implicits._
    // rare words must be pure letters: the [a-z]+ tokenizer would split
    // digit-carrying tokens into REPEATING fragments ("xq0zt" -> "xq
    // zt" forever), silently inverting the fixture
    val rep = ("the cat sat on the mat " * 50).trim
    val rare = (0 until 100).map { i =>
      s"q${('a' + i / 26 % 26).toChar}${('a' + i % 26).toChar}z"
    }.mkString(" ")
    val docs = Seq((1L, rep, "en", "s", rep.length.toLong),
      (2L, rare, "en", "s", rare.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_e55").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val scored = graft.SparkEntry.queries("e55_lm_surprisal")(spark, tmp)
      .select("doc_id", "avg_surprisal")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scored(1L) < scored(2L),
      s"repeated text must be less surprising: $scored")
  }
}
