package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitters sketch as a native Catalyst
  * TypedImperativeAggregate — the bounded-memory candidate generator for
  * frequency analysis at corpus scale: `k` counters per partial
  * aggregate regardless of input size, mergeable (Agarwal et al.,
  * "Mergeable Summaries", PODS'12), with the classic guarantee that any
  * key with true count > N/(k+1) survives into the final sketch.
  *
  * The sketch SET beyond that guarantee is arrival-order dependent (like
  * every MG implementation), so the operator contract is
  * sketch-then-verify: treat the ≤ k emitted keys as CANDIDATES, compute
  * their exact counts in a second bounded pass, and threshold exactly —
  * the final answer is then deterministic and engine-portable (see
  * e29_heavy_hitters). At 100 TB this replaces a full-vocabulary
  * shuffle with one ≤ k-entry sketch per partition plus one
  * candidate-filtered aggregation.
  */
object sketches {

  /** State: key → counter, capped at `k` entries. */
  case class MisraGriesAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LongMap[Long]] {

    require(k > 0, "sketch size k must be positive")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "misra_gries"

    override def createAggregationBuffer(): mutable.LongMap[Long] =
      mutable.LongMap.empty[Long]

    override def update(
        buf: mutable.LongMap[Long],
        input: org.apache.spark.sql.catalyst.InternalRow): mutable.LongMap[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val key = v.asInstanceOf[Long]
        if (buf.contains(key)) buf(key) += 1L
        else if (buf.size < k) buf(key) = 1L
        else {
          // decrement-all step; drop exhausted counters
          val dead = mutable.ArrayBuffer.empty[Long]
          buf.foreachEntry { (kk, c) =>
            if (c == 1L) dead += kk else buf(kk) = c - 1L
          }
          dead.foreach(buf.remove)
        }
      }
      buf
    }

    override def merge(
        buf: mutable.LongMap[Long],
        other: mutable.LongMap[Long]): mutable.LongMap[Long] = {
      other.foreachEntry { (kk, c) =>
        buf(kk) = buf.getOrElse(kk, 0L) + c
      }
      if (buf.size > k) {
        // subtract the (k+1)-th largest counter from all, keep positives
        val counts = buf.values.toArray
        java.util.Arrays.sort(counts)
        val pivot = counts(counts.length - (k + 1))
        val dead = mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (kk, c) =>
          if (c - pivot <= 0L) dead += kk else buf(kk) = c - pivot
        }
        dead.foreach(buf.remove)
      }
      buf
    }

    override def eval(buf: mutable.LongMap[Long]): Any = {
      val keys = buf.keys.toArray
      java.util.Arrays.sort(keys) // deterministic ORDER for a given set
      new GenericArrayData(keys)
    }

    override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + buf.size * 16)
      bb.putLong(buf.size.toLong)
      buf.foreachEntry { (kk, c) => bb.putLong(kk); bb.putLong(c) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getLong.toInt
      val buf = mutable.LongMap.empty[Long]
      var i = 0
      while (i < n) { buf(bb.getLong) = bb.getLong; i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(off: Int): MisraGriesAgg =
      copy(mutableAggBufferOffset = off)
    override def withNewInputAggBufferOffset(off: Int): MisraGriesAgg =
      copy(inputAggBufferOffset = off)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): MisraGriesAgg =
      copy(child = newChildren.head)
  }

  /** Column API: sorted array of ≤ k candidate keys. */
  def misra_gries(keys: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(keys), k)
        .toAggregateExpression())

  /** k smallest LONG values per group as a bounded native aggregate —
    * the posting-list truncator: `sort_array(collect_list(id))[1:k]`
    * holds the whole group in one buffer (a stopword's posting list is
    * corpus-sized), while this keeps ≤ k longs per partial aggregate,
    * map-side combines, and merges associatively. Exact (not a sketch):
    * the k smallest of a union is determined by each side's k smallest.
    */
  case class MinKAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[Long]] {

    require(k > 0, "k must be positive")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "min_k"

    // max-heap of the k smallest seen so far (root = current cutoff)
    override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
      mutable.PriorityQueue.empty[Long]

    private def add(buf: mutable.PriorityQueue[Long], v: Long): Unit =
      if (buf.size < k) buf.enqueue(v)
      else if (v < buf.head) { buf.dequeue(); buf.enqueue(v) }

    override def update(
        buf: mutable.PriorityQueue[Long],
        input: org.apache.spark.sql.catalyst.InternalRow)
      : mutable.PriorityQueue[Long] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(
        buf: mutable.PriorityQueue[Long],
        other: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
      other.foreach(add(buf, _))
      buf
    }

    override def eval(buf: mutable.PriorityQueue[Long]): Any = {
      val out = buf.toArray
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }

    override def serialize(buf: mutable.PriorityQueue[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.size * 8)
      bb.putInt(buf.size)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = mutable.PriorityQueue.empty[Long]
      var i = 0
      while (i < n) { buf.enqueue(bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(off: Int): MinKAgg =
      copy(mutableAggBufferOffset = off)
    override def withNewInputAggBufferOffset(off: Int): MinKAgg =
      copy(inputAggBufferOffset = off)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): MinKAgg =
      copy(child = newChildren.head)
  }

  /** Column API: ascending array of the ≤ k smallest values. */
  def min_k(values: Column, k: Int): Column =
    ColumnBridge.column(
      MinKAgg(ColumnBridge.expression(values), k)
        .toAggregateExpression())

  /** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
    * 2002; Beyer et al., SIGMOD'07): the k smallest DISTINCT hash values
    * seen, as a bounded native aggregate — ≤ k longs per partial buffer
    * regardless of input size, map-side combined, merged by set union
    * then re-truncation (mergeable summary, same family as [[MinKAgg]]
    * but duplicate-insensitive, which is what makes it a DISTINCT
    * estimator rather than a posting-list truncator).
    *
    * For hashes uniform on [0, M) the estimator is
    * `D ≈ (k−1)·M / h_k` with h_k the k-th smallest distinct hash
    * (relative standard error ~ 1/√(k−2)); when fewer than k distinct
    * values exist the sketch holds ALL of them and the exact count is
    * its size. Everything downstream of the emitted sorted array is
    * plain integer arithmetic, so an external engine can replay the
    * estimate bit-for-bit from the same hash set (e60's oracle does).
    *
    * At 100 TB this replaces the (group, value)-distinct shuffle that an
    * exact `count(DISTINCT …)` pays — cardinality of the DATA — with one
    * ≤ k-entry buffer per partial aggregate: the shuffle payload is
    * k longs per group, independent of corpus size.
    */
  case class KmvAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

    require(k > 1, "KMV sketch size k must be > 1")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "kmv_sketch"

    // ordered set of the k smallest distinct values (last = cutoff)
    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
      if (buf.size < k) { buf.add(v); () }
      else if (v < buf.last) {
        if (buf.add(v)) { buf.remove(buf.last); () }
      }

    override def update(
        buf: java.util.TreeSet[java.lang.Long],
        input: org.apache.spark.sql.catalyst.InternalRow)
      : java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(
        buf: java.util.TreeSet[java.lang.Long],
        other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
      val it = other.iterator()
      while (it.hasNext) add(buf, it.next())
      buf
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out) // ascending by TreeSet order
    }

    override def serialize(
        buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.size * 8)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(
        bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(off: Int): KmvAgg =
      copy(mutableAggBufferOffset = off)
    override def withNewInputAggBufferOffset(off: Int): KmvAgg =
      copy(inputAggBufferOffset = off)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): KmvAgg =
      copy(child = newChildren.head)
  }

  /** Column API: ascending array of the ≤ k smallest DISTINCT values. */
  def kmv_sketch(values: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(values), k)
        .toAggregateExpression())

  /** Bloom-filter bitmap over LONG keys in [0, Portable.P) as a bounded
    * native aggregate: `mBits/64` longs per partial buffer regardless of
    * input size, map-side combined, merged by bitwise OR (trivially
    * associative and commutative — the built bitmap is partitioning-
    * independent). Probe positions are the affine family
    * `(BloomA(i)·floorMod(v, P) + BloomB(i)) mod P mod mBits` for
    * i < kHashes (the inner floorMod is identity on the documented
    * [0, P) domain and keeps out-of-domain keys consistent between
    * build and probe instead of crashing) —
    * plain integer arithmetic, so [[might_contain]] recomputes them
    * with builtin column functions and any external engine can too.
    *
    * The sketch contract is prefilter-then-verify (the e29 discipline):
    * `might_contain` has no false negatives by construction, so
    * filtering a probe side with it before an exact semi-join preserves
    * the exact result while shrinking the join input to the true hits
    * plus an ε false-positive fraction — the manual form of a runtime
    * bloom join filter, usable where the optimizer can't infer one
    * (e.g. across a collected-sketch boundary). FPP is pinned by
    * BloomSpec against the (1 − e^{−kn/m})^k model.
    */
  case class BloomAgg(
      child: Expression,
      mBits: Int,
      kHashes: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    require(mBits > 0 && Integer.bitCount(mBits) == 1,
      "mBits must be a positive power of two")
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    require(kHashes > 0 && kHashes <= graft.functions.Portable.BloomA.size,
      s"kHashes must be in [1, ${graft.functions.Portable.BloomA.size}]")

    private val P = graft.functions.Portable.P
    private val as = graft.functions.Portable.BloomA.toArray
    private val bs = graft.functions.Portable.BloomB.toArray

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "bloom_bitmap"

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](mBits / 64)

    override def update(
        buf: Array[Long],
        input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        // Normalize into [0, P) BEFORE the affine transform: the
        // documented domain is [0, P), but a key outside it must degrade
        // to a consistent insert (still a valid bloom), not an
        // ArrayIndexOutOfBounds mid-job. Normalizing first also keeps
        // every product < 2^38, so the probe side can mirror this with
        // pmod under ANSI arithmetic without overflow.
        val key = Math.floorMod(v.asInstanceOf[Long], P)
        var i = 0
        while (i < kHashes) {
          val pos = ((as(i) * key + bs(i)) % P % mBits).toInt
          buf(pos >> 6) |= 1L << (pos & 63)
          i += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) |= other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(off: Int): BloomAgg =
      copy(mutableAggBufferOffset = off)
    override def withNewInputAggBufferOffset(off: Int): BloomAgg =
      copy(inputAggBufferOffset = off)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): BloomAgg =
      copy(child = newChildren.head)
  }

  /** Column API: the `mBits`-bit bloom bitmap as ARRAY<LONG>. */
  def bloom_bitmap(keys: Column, mBits: Int, kHashes: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(keys), mBits, kHashes)
        .toAggregateExpression())

  /** Count-Min Sketch over LONG keys in [0, Portable.P) as a bounded
    * native aggregate (Cormode & Muthukrishnan, J. Algorithms'05):
    * `depth × width` long counters per partial buffer regardless of
    * input size, map-side combined, merged by elementwise sum (counter
    * matrices are linear, so the built sketch is partitioning- and
    * arrival-order-INDEPENDENT — unlike Misra-Gries, the same corpus
    * always yields the same sketch, making the whole estimate
    * replayable in an external engine). Row i's bucket is the affine
    * family `(CmsA(i)·floorMod(v, P) + CmsB(i)) mod P mod width` —
    * plain integer arithmetic, so [[cms_estimate]] and any external
    * engine recompute it with builtin column functions.
    *
    * Estimate contract: `min_i counters[i][h_i(v)]` NEVER underestimates
    * the true count, and overestimates by more than `e·N/width` with
    * probability ≤ e^-depth (N = total insertions). The sketch is the
    * scale path for frequency queries where the full key space cannot be
    * shuffled: the counter matrix is a fixed-size pull (depth·width
    * longs) at any corpus size.
    */
  case class CmsAgg(
      child: Expression,
      depth: Int,
      width: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    require(depth > 0 && depth <= graft.functions.Portable.CmsA.size,
      s"depth must be in [1, ${graft.functions.Portable.CmsA.size}]")
    require(width > 1, "width must be > 1")

    private val P = graft.functions.Portable.P
    private val as = graft.functions.Portable.CmsA.toArray
    private val bs = graft.functions.Portable.CmsB.toArray

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "cms_sketch"

    override def createAggregationBuffer(): Array[Long] =
      new Array[Long](depth * width)

    override def update(
        buf: Array[Long],
        input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        // Same domain discipline as BloomAgg: normalize into [0, P) so an
        // out-of-domain key degrades to a consistent insert, never an
        // ArrayIndexOutOfBounds, and the probe side can mirror with pmod.
        val key = Math.floorMod(v.asInstanceOf[Long], P)
        var i = 0
        while (i < depth) {
          val pos = ((as(i) * key + bs(i)) % P % width).toInt
          buf(i * width + pos) += 1L
          i += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(off: Int): CmsAgg =
      copy(mutableAggBufferOffset = off)
    override def withNewInputAggBufferOffset(off: Int): CmsAgg =
      copy(inputAggBufferOffset = off)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): CmsAgg =
      copy(child = newChildren.head)
  }

  /** Column API: the depth×width counter matrix as ARRAY<LONG>
    * (row-major: counter[i][b] at index i·width + b).
    */
  def cms_sketch(keys: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsAgg(ColumnBridge.expression(keys), depth, width)
        .toAggregateExpression())

  /** Point-estimate probe against a DRIVER-HELD counter matrix (the
    * bounded sketch pull — depth·width longs, e.g. 16 KiB at 4×512):
    * `min_i counters[i·width + h_i(key)]`, built entirely from codegen'd
    * builtin arithmetic over an array literal — no join, no shuffle, no
    * custom expression. Never underestimates; overestimate bounded by
    * the CMS guarantee.
    */
  def cms_estimate(
      counters: Array[Long], key: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    require(counters.length == depth * width,
      "counters length must equal depth * width")
    val words = lit(counters)
    val k = pmod(key, lit(graft.functions.Portable.P))
    (0 until depth).map { i =>
      val pos = (lit(graft.functions.Portable.CmsA(i)) * k +
        lit(graft.functions.Portable.CmsB(i))) %
        graft.functions.Portable.P % lit(width.toLong)
      element_at(words, (lit(i.toLong * width) + pos).cast("int") + 1)
    }.reduce(least(_, _))
  }

  /** HyperLogLog register vector (Flajolet et al., AofA'07) as a native
    * TypedImperativeAggregate — the production-standard cardinality
    * sketch: 64 one-byte-equivalent registers (stored as longs for
    * buffer simplicity — 512 B per partial), merged by ELEMENT-WISE
    * MAX, which is commutative/associative/idempotent, so the built
    * sketch is partitioning-independent AND at-least-once-replay-proof
    * (unlike counting sketches, re-inserting an element is a no-op) —
    * the property that makes HLL the fleet choice for distributed
    * distinct counts and cross-shard unions: union(A, B) is just
    * max(M_A, M_B) on 64 registers, no re-scan.
    *
    * Portable by construction ([[Portable.HllA]] contract): affine
    * rehash mod P, bucket = h mod 64, rank = trailing-zeros + 1 of
    * h div 64 (capped at 25 for the zero word), so an external engine
    * replays the registers with a generated integer CASE ladder — no
    * bit intrinsics required. The ESTIMATE stays integer too: with
    * S = Σ_j 2^(25 − M[j]) (an exact integer ≤ 64·2^25), the raw-HLL
    * estimate α₆₄·m²/Σ2^(−M[j]) equals 709·2^37/(1000·S) under the
    * DEFINED α₆₄ = 709/1000 — one integer floor division both engines
    * compute identically; no float ever enters the hash-compared
    * columns (the linear-counting small-range branch is the one float
    * (ln) consumer and is emitted as a separate convention-rounded
    * column only when it engages — see e134).
    */
  case class HllAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

    private val P = graft.functions.Portable.P
    private val m = graft.functions.Portable.HllM
    private val maxRho = graft.functions.Portable.HllMaxRho

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "hll_sketch"

    override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

    override def update(
        buf: Array[Long],
        input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val key = Math.floorMod(v.asInstanceOf[Long], P)
        val x = (graft.functions.Portable.HllA * key +
          graft.functions.Portable.HllB) % P
        // cube the affine mix (the MockData.hashLong pattern): an
        // affine map alone sends consecutive keys to an arithmetic
        // progression whose trailing-zero statistics are wildly
        // non-geometric (measured: sequential user ids estimated 294
        // for a true 150); x^3 mod P is non-linear, breaks the
        // progression, and stays in Long (x < P ~ 2^30, x^2 < 2^60).
        val h = (x * x % P) * x % P
        val j = (h % m).toInt
        val w = h / m
        val rho =
          if (w == 0L) maxRho
          else java.lang.Long.numberOfTrailingZeros(w) + 1
        if (rho > buf(j)) buf(j) = rho.toLong
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < m) {
        if (other(i) > buf(i)) buf(i) = other(i)
        i += 1
      }
      buf
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(off: Int): HllAgg =
      copy(mutableAggBufferOffset = off)
    override def withNewInputAggBufferOffset(off: Int): HllAgg =
      copy(inputAggBufferOffset = off)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): HllAgg =
      copy(child = newChildren.head)
  }

  /** Column API: the 64-register vector as ARRAY<LONG>. */
  def hll_sketch(values: Column): Column =
    ColumnBridge.column(
      HllAgg(ColumnBridge.expression(values)).toAggregateExpression())

  /** Membership probe against a DRIVER-HELD bitmap (mBits/64 longs —
    * e.g. 32 KiB at 2^18 bits — the bounded sketch pull, like e29's
    * candidate list): k bit tests built entirely from codegen'd builtin
    * arithmetic over an array literal, so the probe rides the task
    * closure with no join, no shuffle, and no custom expression. No
    * false negatives; false positives at the modeled FPP.
    */
  def might_contain(
      bitmap: Array[Long], key: Column, mBits: Int, kHashes: Int): Column = {
    import org.apache.spark.sql.functions._
    require(bitmap.length == mBits / 64, "bitmap length must match mBits")
    val words = lit(bitmap)
    // pmod = Java floorMod: normalize the key into [0, P) exactly as
    // BloomAgg.update does, so out-of-domain keys probe the same bits
    // they inserted and the affine products can't overflow under ANSI.
    val k = pmod(key, lit(graft.functions.Portable.P))
    (0 until kHashes).map { i =>
      val pos = (lit(graft.functions.Portable.BloomA(i)) * k +
        lit(graft.functions.Portable.BloomB(i))) %
        graft.functions.Portable.P % lit(mBits.toLong)
      val word = element_at(words, (pos / 64).cast("int") + 1)
      ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.ShiftRight(
          ColumnBridge.expression(word),
          ColumnBridge.expression((pos % 64).cast("int"))))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
