package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** e144 (containment screen) exists to catch the pairs the symmetric
  * Jaccard detectors structurally drop. Pin the defining regime on a
  * constructed quote pair — a 20-word passage extracted verbatim from a
  * 100-word article: e144 must report it at containment 10000 bp with
  * `hidden` = 1, and e2 (the same postings machinery thresholded on
  * J ≥ 0.3) must NOT report it on the same corpus. Also pin the
  * smaller-set arithmetic against a driver-side set computation at
  * sf0.01.
  */
class E144ContainmentSpec extends SparkSpecBase {

  private def run(name: String, dir: String) =
    (ExtensionQueries.all ++ AnalysisQueries.all)
      .find(_.name == name).get.run(spark, dir)

  test("a 20-in-100-word quote pair: containment 10000, hidden, absent" +
    " from e2") {
    import spark.implicits._
    // 100 distinct alphabetic words; doc 2 = words 40..59 verbatim
    val words = (0 until 100)
      .map(i => s"w${('a' + i / 10).toChar}${('a' + i % 10).toChar}")
    val docs = Seq(
      (1L, words.mkString(" ")),
      (2L, words.slice(40, 60).mkString(" ")))
    val dir = Files.createTempDirectory("e144spec").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.parquet(s"$dir/documents.parquet")
    val out = run("e144_containment", dir).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 2L && r.getLong(1) === 1L) // small, big
    assert(r.getLong(2) === 18L && r.getLong(3) === 98L)
    assert(r.getLong(4) === 18L) // every small-doc gram is shared
    assert(r.getLong(5) === 10000L) // containment
    assert(r.getLong(6) === 18L * 10000 / 98L) // jaccard 1836 bp
    assert(r.getInt(7) === 1) // hidden from the J >= 0.3 detectors...
    val e2 = run("e2_ngram_jaccard", dir).collect()
    assert(!e2.exists(p => p.getLong(0) === 1L && p.getLong(1) === 2L))
  }

  test("smaller-set pick and ratios match a driver-side set computation" +
    " at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val out = run("e144_containment", dir).collect()
    assert(out.nonEmpty)
    // driver-side: pruned shingle sets (df <= 100) per doc
    val sets = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.F.shingle_hashes(col("text")).as("shs"))
      .filter(size(col("shs")) > 0)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
    val df = sets.flatMap(_._2.toSeq).groupBy(identity)
      .map { case (h, v) => h -> v.size }
    val pruned = sets
      .map { case (id, s) => id -> s.filter(h => df(h) <= 100) }
      .toMap
    out.foreach { r =>
      val (small, big) = (r.getLong(0), r.getLong(1))
      val (a, b) = (pruned(small), pruned(big))
      assert(a.size <= b.size)
      if (a.size == b.size) assert(small < big) // tie -> lower id
      val c = (a intersect b).size.toLong
      assert(r.getLong(2) === a.size.toLong)
      assert(r.getLong(3) === b.size.toLong)
      assert(r.getLong(4) === c)
      assert(r.getLong(5) === c * 10000 / a.size)
      assert(r.getLong(6) === c * 10000 / (a.size + b.size - c))
    }
  }
}
