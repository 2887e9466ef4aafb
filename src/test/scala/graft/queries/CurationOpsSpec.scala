package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.{F, TextHash}

/** Engine-level pins for the round-9 curation operators (the oracle
  * compare checks values; these pin the SEMANTIC invariants that a
  * value hash alone would not explain).
  */
class CurationOpsSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("avg_hash64 matches a direct reference implementation") {
    // independent re-implementation of aHash (float means, no
    // cross-multiplication) — agreement pins the integer formulation
    def ref(bytes: Array[Byte]): Long = {
      val len = bytes.length
      if (len == 0) return 0L
      val blocks = Array.fill(64)(Vector.empty[Int])
      bytes.zipWithIndex.foreach { case (b, i) =>
        val j = ((i.toLong * 64) / len).toInt
        blocks(j) = blocks(j) :+ (b & 0xff)
      }
      val mean = bytes.map(b => (b & 0xff).toLong).sum.toDouble / len
      blocks.zipWithIndex.foldLeft(0L) { case (h, (blk, j)) =>
        if (blk.nonEmpty && blk.sum.toDouble / blk.size > mean)
          h | (1L << j)
        else h
      }
    }
    val samples = Seq("", "a", "abc def", "z" * 63, "spark " * 40,
      new String((0 until 200).map(i => ('a' + i % 26).toChar).toArray))
    samples.foreach { s =>
      val bytes = s.getBytes("UTF-8")
      assert(TextHash.avgHash64(bytes) === ref(bytes), s"text: '$s'")
    }
    // and the Catalyst expression agrees with the static method
    import spark.implicits._
    val got = samples.toDF("text")
      .select(F.avg_hash64(col("text").cast("binary")))
      .as[Long].collect().toSeq
    assert(got === samples.map(s => TextHash.avgHash64(s.getBytes("UTF-8"))))
    // SQL registration (GraftExtensions) resolves and agrees
    val viaSql = spark.sql(
      "SELECT avg_hash64(CAST('abc def' AS BINARY))").as[Long].head()
    assert(viaSql === TextHash.avgHash64("abc def".getBytes("UTF-8")))
  }

  test("e86 line dedup: kept lines are distinct and first-occurrence wins") {
    val out = CurationQueries.all.find(_.name == "e86_line_dedup").get
      .run(spark, dir).cache()
    val rows = out.collect()
    // every doc appears once; counts are sane
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach { r =>
      val (nLines, nKept, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nKept <= nLines && nKept >= 0)
      assert(bp >= 0 && bp <= 10000)
    }
    // total kept lines == number of DISTINCT lines in the corpus
    // (exactly one occurrence of each distinct line survives)
    val totalKept = rows.map(_.getLong(2)).sum
    val lines = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        posexplode(expr(graft.functions.Portable.wordsSpark))
          .as(Seq("pos", "word")))
      .groupBy(col("doc_id"), expr("pos div 8").as("li"))
      .agg(concat_ws(" ",
        expr("transform(array_sort(collect_list(struct(pos, word)))," +
          " x -> x.word)")).as("line"))
      .select("line").distinct().count()
    assert(totalKept === lines, s"kept $totalKept != distinct lines $lines")
    out.unpersist()
  }

  test("e89 priority sample: size, threshold estimator lower bound") {
    val out = CurationQueries.all.find(_.name == "e89_priority_sample").get
      .run(spark, dir).collect()
    assert(out.length === 50)
    // DLT invariant: every kept item's estimate is >= its true weight,
    // and equals max(weight*1000, tau) for a single corpus-wide tau
    val taus = out.map(r => r.getLong(3) max r.getLong(1) * 1000).distinct
    out.foreach { r =>
      assert(r.getLong(3) >= r.getLong(1) * 1000)
    }
    assert(taus.nonEmpty)
  }

  test("e91 ivf upsert: delta fully assigned, growth consistent") {
    val rows = CurationQueries.all.find(_.name == "e91_ivf_upsert").get
      .run(spark, dir).collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nDelta = emb.filter(col("vec_id") % 10 === 7).count()
    val nBase = emb.filter(col("vec_id") % 10 =!= 7).count()
    // every base and delta vector lands in exactly one cell
    assert(rows.map(_.getLong(1)).sum === nBase)
    assert(rows.map(_.getLong(2)).sum === nDelta)
    rows.foreach { r =>
      val (nb, nd, bp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      if (nb > 0) assert(bp === nd * 10000 / nb) else assert(bp === -1L)
    }
  }

  test("e92 manifest diff: append flips only the boundary shard") {
    val rows = CurationQueries.all.find(_.name == "e92_manifest_diff").get
      .run(spark, dir).collect()
    val byStatus = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // append-only growth: every base shard except the boundary one is
    // byte-identical; the boundary shard is the only 'changed' row and
    // the delta appends 'new' shards after it
    assert(byStatus.getOrElse("changed", 0) <= 1)
    assert(byStatus.getOrElse("new", 0) >= 1)
    assert(byStatus.getOrElse("unchanged", 0) >= 1)
    // unchanged shards carry equal checksums, changed/new differ
    rows.foreach { r =>
      val (st, bck, fck) = (r.getString(1), r.getLong(4), r.getLong(5))
      if (st == "unchanged") assert(bck === fck)
      else assert(bck !== fck)
    }
  }

  test("e90 hashed classifier is a pure projection (no shuffle)") {
    val df = CurationQueries.all.find(_.name == "e90_hashed_classifier").get
      .run(spark, dir)
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "e90 must not shuffle")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, raw, mean, kept) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw >= 0 && raw <= 2000L * n)
      assert(mean === raw * 1000 / n)
      assert(kept === (if (raw > 1000 * n) 1L else 0L))
    }
  }

  test("e96 ablation: matrix bounds, one corpus scan, no join") {
    // static plan assertions need the non-adaptive physical plan
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (df, plan) =
      try {
        val d = CurationQueries.all.find(_.name == "e96_filter_ablation").get
          .run(spark, dir)
        (d, d.queryExecution.executedPlan) // force planning while AQE is off
      } finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 1, "ablation must read the corpus exactly once")
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(joins.isEmpty, "the pair matrix explodes one aggregated row")
    val rows = df.collect()
    assert(rows.length === 4 * 3 / 2) // unordered filter pairs
    val nDocs = rows.map(_.getLong(6)).distinct
    assert(nDocs.length === 1 && nDocs.head > 0)
    rows.foreach { r =>
      val (ra, rb, both, jbp) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(both <= math.min(ra, rb), "co-rejections bounded by each side")
      assert(ra <= nDocs.head && rb <= nDocs.head)
      assert(jbp >= 0 && jbp <= 10000)
      val denom = ra + rb - both
      if (denom > 0) assert(jbp === both * 10000 / denom)
      else assert(jbp === 0L)
    }
  }

  test("e97 CDC chunking: boundaries are insertion-stable past the window") {
    import spark.implicits._
    // letters-only words (the tokenizer extracts [a-z]+ runs)
    val words = (0 until 300).map(i => ('a' + i % 26).toChar.toString * (1 + i % 5))
    val text = words.mkString(" ")
    val shifted = "zzz " + text // one-word prefix edit
    def boundaries(t: String): Set[Long] = {
      val df = Seq(t).toDF("text")
        .select(CurationQueries.cdcBoundaries(
          graft.functions.F.word_hashes(col("text"))).as("b"))
      df.as[Seq[Long]].head().toSet
    }
    val b0 = boundaries(text)
    val b1 = boundaries(shifted)
    assert(b0.nonEmpty, "divisor 16 over 300 words must hit boundaries")
    // CDC property: every original boundary survives, shifted by the
    // edit length; anything new sits inside the 4-word hash window of
    // the edit. Fixed-size chunking would instead shift EVERY chunk.
    assert(b0.map(_ + 1).subsetOf(b1))
    assert((b1 -- b0.map(_ + 1)).forall(_ <= 4))

    // the audit itself is a pure projection: no shuffle in the plan
    val adaptiveWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try CurationQueries.all.find(_.name == "e97_cdc_chunks").get
        .run(spark, dir).queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", adaptiveWas)
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "CDC chunking must not shuffle")
  }

  test("e122 greedy coverage: submodular gains, exact greedy trace") {
    val got = AnalysisQueries.all
      .find(_.name == "e122_coverage_select").get
      .run(spark, dir)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    assert(got.length === 5)
    // submodularity signature: marginal gains never increase
    assert(got.sliding(2).forall { case Array(a, b) => b._3 <= a._3 },
      got.mkString(", "))
    // picks are distinct docs; cum_cov is the running gain sum
    assert(got.map(_._2).distinct.length === 5)
    assert(got.scanLeft(0L)(_ + _._3).tail.toSeq === got.map(_._4).toSeq)
    assert(got.forall(r => r._5 >= 0 && r._5 <= 10000))

    // exact greedy trace vs a driver-side set-cover reimplementation
    // over the engine's own shingle sets
    val shs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), F.shingle_hashes(col("text")).as("shs"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .filter(_._2.nonEmpty).toMap
    var covered = Set.empty[Long]
    val expect = (1 to 5).map { r =>
      val (doc, gain) = shs.keys.toSeq.sorted
        .map(d => d -> (shs(d) -- covered).size.toLong)
        .maxBy { case (d, g) => (g, -d) }
      covered ++= shs(doc)
      (r, doc, gain)
    }
    assert(got.map(t => (t._1, t._2, t._3)).toSeq === expect)
  }

  test("e123 Neyman allocation: exact isqrt, exact budget, optimality") {
    val got = AnalysisQueries.all.find(_.name == "e123_neyman_alloc").get
      .run(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // largest-remainder apportionment hits the budget EXACTLY
    assert(got.map(_._4).sum === 1000L)
    // w_h is the exact integer sqrt of N·ΣX² − (ΣX)², vs BigInt truth
    val moments = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars").cast("long")).as("s1"),
        sum(col("n_chars").cast("long") * col("n_chars")).as("s2"))
      .collect()
      .map(r => r.getString(0) -> (BigInt(r.getLong(1)) * r.getLong(3)
        - BigInt(r.getLong(2)) * r.getLong(2)))
      .toMap
    got.foreach { case (src, _, w, _, _, _) =>
      val x = moments(src)
      assert(BigInt(w) * w <= x && x < BigInt(w + 1) * (w + 1),
        s"$src: w=$w not isqrt of $x")
    }
    // shares are the Neyman optimum: alloc_bp tracks w_h/Σw (±1 bp of
    // floor rounding), and every share column sums to ≤ 10000
    val tw = got.map(_._3).sum
    got.foreach { case (src, _, w, _, shareBp, _) =>
      assert(shareBp === w * 10000 / tw, src)
    }
    assert(got.map(_._5).sum <= 10000L && got.map(_._6).sum <= 10000L)
  }

  test("e129 3-core equals a driver-side fixpoint peel") {
    val got = AnalysisQueries.all.find(_.name == "e129_kcore").get
      .run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side truth: peel the SAME verified edge set to fixpoint
    val pairs = ExtensionQueries.minhashVerifiedPairs(spark, dir)
      .filter(col("jaccard") >= 0.3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var adj = pairs.flatMap(p => Seq(p, p.swap)).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var changed = true
    while (changed) {
      val keep = adj.collect { case (u, ns) if ns.size >= 3 => u }.toSet
      changed = keep.size != adj.size
      adj = adj.collect { case (u, ns) if keep(u) =>
        u -> ns.filter(keep)
      }.filter(_._2.nonEmpty)
    }
    val expect = adj.map { case (u, ns) => u -> ns.size.toLong }
    // 8 fixed rounds reach the fixpoint on this graph, and the
    // within-core degrees agree exactly
    assert(got === expect)
    assert(got.values.forall(_ >= 3L))
  }

  test("e131 Youden equals a driver-side exact TPR/FPR/J recomputation") {
    import spark.implicits._
    // Synthetic score/label table with ties (both classes share bp 40
    // and 60 in `good`), an anti-correlated source (`anti`: positives
    // score LOW — the gate direction adds nothing), and a one-class
    // source (`onlypos`) that must be dropped, not divided by zero.
    val rows: Seq[(String, Long, Boolean)] =
      Seq.fill(3)(("good", 80L, true)) ++ Seq.fill(2)(("good", 60L, true)) ++
        Seq(("good", 40L, true)) ++
        Seq.fill(4)(("good", 20L, false)) ++
        Seq.fill(2)(("good", 40L, false)) ++ Seq(("good", 60L, false)) ++
        Seq.fill(3)(("anti", 10L, true)) ++ Seq.fill(2)(("anti", 20L, true)) ++
        Seq.fill(3)(("anti", 80L, false)) ++
        Seq.fill(2)(("anti", 90L, false)) ++
        Seq.fill(5)(("onlypos", 50L, true))
    val freq = rows.toDF("source", "bp", "is_pos")
      .groupBy("source", "bp")
      .agg(sum(when(col("is_pos"), 1L).otherwise(0L)).as("pos_c"),
        sum(when(col("is_pos"), 0L).otherwise(1L)).as("neg_c"))
    val got = AnalysisQueries.youdenFromFreq(freq).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap

    // Driver-side truth: scan every observed threshold per source,
    // compute TPR/FPR at `flag if bp >= t` exactly, argmax the integer
    // numerator with ties to the LOWEST threshold.
    val bySource = rows.groupBy(_._1)
    val expect = bySource.flatMap { case (src, rs) =>
      val np = rs.count(_._3).toLong
      val nn = rs.count(!_._3).toLong
      if (np == 0 || nn == 0) None
      else {
        val thrs = rs.map(_._2).distinct.sorted
        val best = thrs.map { t =>
          val posGe = rs.count(r => r._3 && r._2 >= t).toLong
          val negGe = rs.count(r => !r._3 && r._2 >= t).toLong
          (t, posGe, negGe, posGe * nn - negGe * np)
        }.maxBy { case (t, _, _, num) => (num, -t) } // num desc, thr asc
        val (t, posGe, negGe, num) = best
        Some(src -> (np, nn, t, num * 10000L / (np * nn),
          posGe * 10000L / np, negGe * 10000L / nn))
      }
    }
    assert(got === expect)
    // the docstring's structural claims, asserted directly:
    assert(!got.contains("onlypos")) // one-class source dropped
    got.values.foreach { case (_, _, _, j, _, _) => assert(j >= 0L) }
    // anti-correlated signal reads as "flag everything": the lowest
    // observed threshold, J = 0, TPR = FPR = 1
    assert(got("anti") === ((5L, 5L, 10L, 0L, 10000L, 10000L)))
    // the correlated source finds a real operating point (J > 0) and
    // the tie-break selected the lowest threshold among argmax rows
    val (_, _, thrGood, jGood, _, _) = got("good")
    assert(jGood > 0L)
    val goodRows = rows.filter(_._1 == "good")
    val npG = goodRows.count(_._3).toLong
    val nnG = goodRows.count(!_._3).toLong
    val numAt = goodRows.map(_._2).distinct.sorted.map { t =>
      t -> (goodRows.count(r => r._3 && r._2 >= t).toLong * nnG -
        goodRows.count(r => !r._3 && r._2 >= t).toLong * npG)
    }
    val maxNum = numAt.map(_._2).max
    assert(thrGood === numAt.filter(_._2 == maxNum).map(_._1).min)
  }

  test("e131b returns-screen Youden is non-empty and reconciles support") {
    val out = AnalysisQueries.all.find(_.name == "e131b_youden_returns").get
      .run(spark, dir).collect()
    assert(out.nonEmpty) // populated at EVERY sf — the point of e131b
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_linestatus"), (col("l_returnflag") === "R").as("p"))
      .collect().map(r => (r.getString(0), r.getBoolean(1)))
    out.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) === li.count(x => x._1 == src && x._2).toLong)
      assert(r.getLong(2) === li.count(x => x._1 == src && !x._2).toLong)
      assert(r.getLong(4) >= 0L) // J never negative
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 10L) // thr on the 1% grid
    }
  }
}
