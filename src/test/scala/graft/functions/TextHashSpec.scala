package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (seeded sampling): the compiled hash loops must
  * equal the portable SQL reference semantics (regex words + polynomial
  * fold) for arbitrary ASCII input.
  */
class TextHashSpec extends AnyFunSuite {

  private val P = Portable.P
  private val rnd = new scala.util.Random(42)

  private def refWords(s: String): Seq[String] =
    "[a-z]+".r.findAllIn(s.toLowerCase).toSeq

  private def refWordHash(w: String): Long =
    w.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % P)

  private val alphabet =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ    .,!?;:0123456789"
  private def asciiTexts(n: Int): Seq[String] =
    Seq("", " ", "one", "one two", "a b c d") ++
      (0 until n).map { _ =>
        val len = rnd.nextInt(120)
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }

  test("wordHashes equals regex+fold reference") {
    asciiTexts(300).foreach { s =>
      val got = TextHash.wordHashes(UTF8String.fromString(s)).toLongArray().toSeq
      val want = refWords(s).map(refWordHash)
      assert(got === want, s"text=<$s>")
    }
  }

  test("shingleHashes: distinct 3-gram hashes, empty below 3 words") {
    asciiTexts(300).foreach { s =>
      val wh = refWords(s).map(refWordHash)
      val want =
        if (wh.size < 3) Seq.empty[Long]
        else wh.sliding(3).map(w =>
          w.foldLeft(0L)((a, x) => (a * 31 + x) % P)).toSeq.distinct
      val got = TextHash
        .shingleHashes(UTF8String.fromString(s), 3).toLongArray().toSeq
      assert(got === want, s"text=<$s>")
    }
  }

  test("polyHash equals char fold; simHash majority vote") {
    asciiTexts(300).foreach { s =>
      val want = s.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % P)
      assert(TextHash.polyHash(UTF8String.fromString(s)) === want)
      val wh = refWords(s).map(refWordHash)
      val wantSim = (0 until 32).map { j =>
        if (2 * wh.count(h => ((h >> j) & 1L) == 1L) > wh.size) 1L << j else 0L
      }.sum
      assert(TextHash.simHash(UTF8String.fromString(s)) === wantSim)
    }
  }

  test("minHashes: affine min per coefficient pair") {
    (0 until 100).foreach { _ =>
      val xs = Seq.fill(1 + rnd.nextInt(60))(rnd.nextLong().abs % P)
      val got = TextHash.minHashes(ArrayData.toArrayData(xs.toArray))
        .toLongArray().toSeq
      val want = Portable.MinHashA.zip(Portable.MinHashB).map { case (a, b) =>
        xs.map(x => (a * x + b) % P).min
      }
      assert(got === want)
    }
  }

  test("dotD: left fold of products") {
    (0 until 100).foreach { _ =>
      val a = Seq.fill(8)(rnd.nextDouble() * 20 - 10)
      val b = Seq.fill(8)(rnd.nextDouble() * 20 - 10)
      val got = TextHash.dotD(
        ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray))
      val want = a.zip(b).foldLeft(0.0)((s, p) => s + p._1 * p._2)
      assert(got === want)
    }
  }
}
