package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled implementations of the portable hash primitives in
  * [[Portable]]. These are the runtime bodies of the custom Catalyst
  * expressions in [[expressions]]; codegen emits direct static calls to
  * this object (Scala objects expose static forwarders), so the char
  * loops run as plain JVM code inside WholeStageCodegen instead of
  * per-element interpreted lambda evaluation.
  *
  * Semantics are bit-identical to the DuckDB-side SQL in [[Portable]]:
  * words are maximal `[a-z]+` runs of the lowercased text, hashed with a
  * base-31 polynomial over char codes mod P; shingles re-hash sliding
  * word-hash windows with the same polynomial. The ASCII-only lowercase
  * here equals SQL `lower()` + `[a-z]+` for any ASCII input (the corpus
  * is ASCII; non-ASCII letters fall out of `[a-z]` in both engines'
  * regex path and are treated as word boundaries here).
  */
object TextHash {
  private val P = Portable.P

  /** Polynomial hash of each maximal ASCII-letter run of `text`. */
  def wordHashes(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Long]()
    var h = 0L
    var inWord = false
    var i = 0
    val n = s.length
    while (i < n) {
      var c = s.charAt(i).toInt
      if (c >= 'A' && c <= 'Z') c += 32
      if (c >= 'a' && c <= 'z') {
        h = (h * 31 + c) % P
        inWord = true
      } else if (inWord) {
        out.add(h); h = 0L; inWord = false
      }
      i += 1
    }
    if (inWord) out.add(h)
    val arr = new Array[Long](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** Distinct word-k-gram shingle hashes of `text` (first-occurrence
    * order; empty when the text has fewer than k words).
    */
  def shingleHashes(text: UTF8String, k: Int): ArrayData = {
    val wh = wordHashes(text).toLongArray()
    if (wh.length < k) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[Long]()
    var i = 0
    while (i <= wh.length - k) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 31 + wh(i + j)) % P; j += 1 }
      seen.add(h)
      i += 1
    }
    val arr = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): the
    * distinct window-min selection over the POSITIONAL word-k-gram hash
    * sequence — every window of `w` consecutive gram hashes contributes
    * its minimum (rightmost position on ties, the robust-winnowing
    * convention), guaranteeing any shared word run of length >= w+k-1
    * yields a shared fingerprint while keeping expected density at
    * 2/(w+1) of the grams. Docs with fewer than k words return empty;
    * docs with fewer than w grams contribute their global min.
    */
  def winnowHashes(text: UTF8String, k: Int, w: Int): ArrayData = {
    val wh = wordHashes(text).toLongArray()
    if (wh.length < k) return new GenericArrayData(Array.emptyLongArray)
    val m = wh.length - k + 1
    val g = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 31 + wh(i + j)) % P; j += 1 }
      g(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[Long]()
    val nw = math.max(m - w + 1, 1)
    var p = 0
    while (p < nw) {
      val end = math.min(p + w, m) // exclusive
      var best = p
      var j = p + 1
      while (j < end) { if (g(j) <= g(best)) best = j; j += 1 }
      seen.add(g(best))
      p += 1
    }
    val arr = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  /** Char-level rolling hash of the whole text (code points, mod P). */
  def polyHash(text: UTF8String): Long = polyHash(text, 31L, P)

  /** Parameterized rolling hash: base/modulus choose an independent hash
    * family, so k reductions under k distinct (base, mod) pairs collide
    * together only for astronomically unlikely inputs (the uuid draw
    * independence fix — see [[graft.gen.MockData.uuidFromParts]]).
    */
  def polyHash(text: UTF8String, base: Long, mod: Long): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * base + s.charAt(i).toInt) % mod; i += 1 }
    h
  }

  /** 32-bit SimHash of the word-hash multiset: bit j is set when a
    * strict majority of word hashes have bit j set.
    */
  def simHash(text: UTF8String): Long = simHashBits(text, 32)

  /** 60-bit SimHash — the near-dup SEARCH signature (e28): on a
    * narrow-vocabulary corpus the 32-bit majority vote saturates (most
    * pairs land within a few bits), so both the hamming metric and the
    * band buckets lose discrimination; 60 bits keeps the signature
    * positive in a BIGINT (no arithmetic-shift sign traps in either
    * engine) while making band collisions track genuine similarity.
    * Bits 32-59 vote on a REMIXED word hash (h * ((h+13) mod P) mod P)
    * because the raw word hashes only carry ~30 bits of entropy; bits
    * 0-31 vote on the raw hash, so the low 32 bits EQUAL [[simHash]]
    * (e4's oracle-pinned fingerprint is unchanged).
    */
  def simHash60(text: UTF8String): Long = simHashBits(text, 60)

  private def simHashBits(text: UTF8String, bits: Int): Long = {
    val wh = wordHashes(text).toLongArray()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < wh.length) {
      val h = wh(i)
      val h2 = h * ((h + 13L) % P) % P
      var j = 0
      while (j < bits) {
        val src = if (j < 32) h else h2
        val bit = if (j < 32) j else j - 32
        counts(j) += ((src >> bit) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) { if (2 * counts(j) > wh.length) sig |= 1L << j; j += 1 }
    sig
  }

  /** Affine MinHash signature over a shingle-hash array: element i is
    * min over the array of (A(i)*x + B(i)) mod P.
    */
  def minHashes(shingles: ArrayData): ArrayData = {
    val xs = shingles.toLongArray()
    val n = Portable.MinHashA.length
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val a = Portable.MinHashA(i)
      val b = Portable.MinHashB(i)
      var m = Long.MaxValue
      var j = 0
      while (j < xs.length) {
        val v = (a * xs(j) + b) % P
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Left-fold dot product of two double arrays (fold order = element
    * order, matching both engines' list_reduce/aggregate semantics).
    */
  def dotD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative coordinates: bit j of x lands at position 2j, bit j of
    * y at 2j+1. Pure integer bit math — the portable-SQL twin is the
    * shift/mask sum in [[Portable.morton2Duck]], bit-identical. Capped
    * at 31 bits per coordinate so the result stays in a positive Long.
    */
  def morton2(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var j = 0
    while (j < bits) {
      z |= ((x >> j) & 1L) << (2 * j)
      z |= ((y >> j) & 1L) << (2 * j + 1)
      j += 1
    }
    z
  }

  /** 64-bit average-hash (aHash) of a byte payload: partition the bytes
    * into 64 contiguous blocks (byte i lands in block `i*64 div len`, so
    * block sizes differ by at most one), and set bit j iff block j's
    * byte mean exceeds the global byte mean — compared cross-multiplied
    * in integers (`sum_j * len > total * count_j`), so no division and
    * no float. The perceptual-dedup primitive for opaque media columns:
    * near-identical payloads differ in few bits, and Hamming distance
    * over the hash is a banded-joinable similarity. Empty input hashes
    * to 0. Overflow-safe for payloads under ~2^27 bytes (sum_j*len ≤
    * 255·len² < 2^63).
    */
  def avgHash64(bytes: Array[Byte]): Long = {
    val len = bytes.length
    if (len == 0) return 0L
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var total = 0L
    var i = 0
    while (i < len) {
      val j = ((i.toLong * 64) / len).toInt
      val v = (bytes(i) & 0xff).toLong
      sums(j) += v
      cnts(j) += 1
      total += v
      i += 1
    }
    var h = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) * len > total * cnts(j)) h |= (1L << j)
      j += 1
    }
    h
  }

  /** Symmetric int8 quantization scale of a double vector: max|x|/127
    * (e26/e93's rule). The max is order-independent, so the value is
    * bit-identical to the engines' list_reduce(greatest) formulation.
    */
  def int8Scale(a: ArrayData): Double = {
    val n = a.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(a.getDouble(i))
      if (v > m) m = v
      i += 1
    }
    m / 127.0
  }

  /** Pack a double vector into signed int8 codes (one byte per
    * element): q_i = floor(x_i / scale + 0.5) with scale = max|x|/127,
    * so |q_i| ≤ 127 by construction — 8× smaller than the ARRAY<DOUBLE>
    * it replaces as a shuffle payload. A zero vector (scale 0) packs to
    * all-zero codes. The arithmetic is plain IEEE double ops in element
    * order, so an engine replaying the same formula on lists produces
    * the same integers.
    */
  def int8Pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    val s = int8Scale(a)
    if (s == 0.0) return out
    var i = 0
    while (i < n) {
      out(i) = math.floor(a.getDouble(i) / s + 0.5).toByte
      i += 1
    }
    out
  }

  /** Integer dot product of two int8 code vectors (signed bytes) —
    * the inner loop int8 retrieval runs: 1-byte multiply-accumulates,
    * the form SIMD executes 4–8× wider than float32. Exact in a Long
    * for any realistic dimension (|Σ| ≤ 127²·n).
    */
  def int8Dot(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var s = 0L
    var i = 0
    while (i < n) { s += a(i).toLong * b(i).toLong; i += 1 }
    s
  }
}
