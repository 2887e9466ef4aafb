package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** e178 — the generation-card diff's stored-artifact contract beyond
  * the oracle row (the E173Spec discipline applied to the datasheet
  * family): generation A's card must be a REAL parquet artifact whose
  * fingerprint amortizes — a second invocation must not rebuild it —
  * and the diff must reconcile with per-generation ground truth
  * computed independently on a hand-checkable fixture (doc counts per
  * generation, dup rates, and the vocabulary-growth column actually
  * detecting gen-B-only vocabulary).
  */
class E178Spec extends SparkSpecBase {

  test("A card persists + amortizes; diff reconciles with the " +
    "fixture's per-generation ground truth") {
    import spark.implicits._
    def genA(id: Long): Boolean =
      ((id % 1000003) * 2654435761L) % 1000000007L % 2 == 0
    // two sources; srcB's gen-B docs carry vocabulary gen A never saw.
    // LETTERS ONLY: the word tokenizer is [a-z]+, so a digit inside a
    // word would split it and collapse "novel" words back to a shared
    // stem — numbers are spelled in letters
    def alpha(n: Long): String =
      n.toString.map(c => ('a' + (c - '0')).toChar).mkString
    val docs = (0L until 60L).map { i =>
      val src = if (i < 30) "srcA" else "srcB"
      val novel = src == "srcB" && !genA(i)
      val words =
        if (novel) (0 until 8).map(j => s"zq${alpha(i)}${alpha(j)}")
        else (0 until 8).map(j => s"common${alpha(j)}")
      val text = words.mkString(" ")
      (i, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val fixDir = java.nio.file.Files
      .createTempDirectory("graft_e178").toString
    docs.write.parquet(s"$fixDir/documents.parquet")

    val run = graft.SparkEntry.queries("e178_generation_card_diff")
    val r1 = run(spark, fixDir).collect()
    assert(r1.map(_.getString(0)).toSeq === Seq("srcA", "srcB"))

    // the stored card is real parquet + fingerprint, and a second
    // invocation amortizes (marker untouched) with identical output
    val cardPath = AnalysisQueries.cardStorePath(spark, fixDir)
    assert(new java.io.File(cardPath).listFiles()
      .exists(_.getName.endsWith(".parquet")),
      "gen-A card not persisted as parquet")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def mtime(): Long = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      cardPath, "_graft_fingerprint")).getModificationTime
    val t0 = mtime()
    val r2 = run(spark, fixDir).collect()
    assert(mtime() === t0, "second invocation rebuilt the A card")
    assert(r2.map(_.toSeq).toSeq === r1.map(_.toSeq).toSeq)

    // ground truth per source: doc counts and dup rates per generation
    val rows = r1.map(r => r.getString(0) -> r).toMap
    for (src <- Seq("srcA", "srcB")) {
      val ids = (0L until 60L)
        .filter(i => (if (i < 30) "srcA" else "srcB") == src)
      val (a, b) = ids.partition(genA)
      val row = rows(src)
      assert(row.getLong(1) === a.length.toLong, s"$src n_docs_a")
      assert(row.getLong(2) === b.length.toLong, s"$src n_docs_b")
      // srcA is all-identical text per generation: dup rate
      // (n - distinct)/n in bp; srcB's gen B is all-distinct → 0
      def dupBp(n: Int, distinct: Int): Long =
        (n - distinct).toLong * 10000 / n
      if (src == "srcA") {
        assert(row.getLong(6) === dupBp(a.length, 1), "srcA dup_bp_a")
        assert(row.getLong(7) === dupBp(b.length, 1), "srcA dup_bp_b")
      } else {
        assert(row.getLong(6) === dupBp(a.length, 1), "srcB dup_bp_a")
        assert(row.getLong(7) === 0L, "srcB dup_bp_b (all novel)")
      }
    }
    // vocabulary growth: srcA's gen B adds NO new shingles, so its
    // union registers EQUAL its A registers and vocab_new_est is
    // exactly 0 (register-max idempotence — no estimator tolerance
    // needed); srcB's gen B adds ~6 novel shingles per novel doc, so
    // its growth column must read strictly positive
    val newA = rows("srcA").getLong(13)
    val newB = rows("srcB").getLong(13)
    assert(newA === 0L,
      s"srcA grew vocabulary from identical registers: $newA")
    assert(newB > 0L,
      s"vocab_new_est did not detect srcB's gen-B-only vocabulary: " +
        s"$newB")
  }
}
