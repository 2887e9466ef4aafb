package graft.functions

/** Engine-portable deterministic text/hash primitives, defined as paired
  * Spark-SQL and DuckDB-SQL expression snippets so every LSH / dedup /
  * similarity operator computes bit-identical values in the engine and in
  * the driver's DuckDB oracle.
  *
  * Randomness is replaced by modular arithmetic over a large prime: a
  * polynomial rolling hash for strings and affine re-hashes `(a*x+b) mod P`
  * for MinHash. At production scale the word hash would be
  * `xxhash64(col, seed)` (single codegen'd call, no char loop) — the
  * operator SHAPES (explode → bucket → join) are unchanged by that swap;
  * the portable variant exists so correctness is externally checkable.
  *
  * All arithmetic stays within Long: operands are < P (~2^30), products
  * < 2^60. Both engines evaluate left-to-right IEEE-754 double folds, so
  * even floating-point reductions (dot products, norms) match exactly.
  */
object Portable {
  /** Large prime modulus for all integer hashing. */
  val P: Long = 1000000007L

  /** MinHash affine coefficients (12 hash functions → 6 bands of 2). */
  val MinHashA: Seq[Long] =
    Seq(131L, 137L, 139L, 149L, 151L, 157L, 163L, 167L, 173L, 179L, 181L, 191L)
  val MinHashB: Seq[Long] =
    Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L, 37L, 41L, 43L, 47L)

  /** Bloom-filter affine coefficients (k = 4 probe hashes), a distinct
    * prime block from the MinHash family. Inputs are hashes already in
    * [0, P), so `(a·v + b) mod P mod m` stays within Long and is
    * identically computable as plain column arithmetic in any engine.
    */
  val BloomA: Seq[Long] = Seq(211L, 223L, 227L, 229L)
  val BloomB: Seq[Long] = Seq(53L, 59L, 61L, 67L)

  /** Count-Min-Sketch affine coefficients (d = 4 counter rows), a prime
    * block distinct from both the MinHash and the Bloom families. Row i's
    * bucket for a key v in [0, P) is `(CmsA(i)·v + CmsB(i)) mod P mod w`
    * — Long-safe (products < 2^38) and replayable as plain column
    * arithmetic in any engine.
    */
  val CmsA: Seq[Long] = Seq(233L, 239L, 241L, 251L)
  val CmsB: Seq[Long] = Seq(71L, 73L, 79L, 83L)

  /** HyperLogLog mixing coefficients (affine-then-cube rehash before
    * the bucket/rank split), a prime pair distinct from every family
    * above. For a key v in [0, P): x = (HllA·v + HllB) mod P,
    * h = x³ mod P (the non-linear MockData.hashLong mix — an affine
    * map alone turns sequential keys into an arithmetic progression
    * with degenerate trailing-zero statistics), bucket j = h mod 64,
    * rank word w = h div 64 ∈ [0, P/64 ≈ 2^23.9).
    * The rank is the TRAILING-zero form ρ(w) = tz(w) + 1 (w > 0;
    * P(ρ ≥ r) = 2^{1−r} for uniform bits, same analysis as the
    * leading form) capped at [[HllMaxRho]] = 25 for w = 0 — all
    * integer, replayable as a generated CASE ladder in any engine.
    */
  val HllA: Long = 263L
  val HllB: Long = 89L
  val HllM: Int = 64

  /** DuckDB integer division matching Spark's `div` (truncation toward
    * zero) for a possibly-NEGATIVE numerator: DuckDB `//` floors while
    * Spark `div` truncates, so the two diverge on every negative
    * non-exact quotient. The division is applied to |num| and the sign
    * re-attached — the e130 kappa rule, factored here because the
    * unfloored kNN edge lists (e173/e176 avg_cos_t) can sum negative
    * on adversarial corpora. `den` must be positive.
    */
  def tdivDuck(num: String, den: String): String =
    s"CASE WHEN ($num) >= 0 THEN ($num) // ($den)" +
      s" ELSE -((-($num)) // ($den)) END"
  val HllMaxRho: Int = 25

  // ---- Spark SQL dialect --------------------------------------------------

  /** Lowercase alpha word tokens of `text`. (The hash primitives
    * themselves live as compiled Catalyst expressions in [[TextHash]] /
    * [[expressions]]; only this tokenizer is still used as inline SQL.)
    */
  val wordsSpark = "regexp_extract_all(lower(text), '[a-z]+', 0)"

  // ---- DuckDB dialect -----------------------------------------------------

  val wordsDuck = "regexp_extract_all(lower(text), '[a-z]+')"

  val wordHashesDuck: String =
    s"""list_transform($wordsDuck,
       |  w -> list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split(w, ''), c -> CAST(ascii(c) AS BIGINT))),
       |    (a, c) -> (a*31 + c) % $P))""".stripMargin

  val shinglesDuck: String =
    s"""list_distinct(list_transform(range(1, greatest(len(wh) - 1, 1)),
       |  i -> (((wh[i]*31 + wh[i + 1]) % $P)*31 + wh[i + 2]) % $P))""".stripMargin

  /** POSITIONAL word-3-gram hashes over `wh` (no dedup — index i is the
    * gram starting at word i, the sequence winnowing slides over).
    * Callers must guard `len(wh) >= 3`.
    */
  val posShinglesDuck: String =
    s"""list_transform(range(1, len(wh) - 1),
       |  i -> (((wh[i]*31 + wh[i + 1]) % $P)*31 + wh[i + 2]) % $P)""".stripMargin

  /** Spark-SQL twin of [[posShinglesDuck]] (same `wh` binding, same
    * 1-based index range, same mod-P folds — products stay < 2^35, ANSI
    * safe). Callers must guard `size(wh) >= 3`.
    */
  val posShinglesSpark: String =
    s"""transform(sequence(1, size(wh) - 2),
       |  i -> (((element_at(wh, i)*31 + element_at(wh, i + 1)) % $P)*31
       |    + element_at(wh, i + 2)) % $P)""".stripMargin

  /** Winnowing selection over the positional gram list `g` (window w=4,
    * rightmost-min tie-break, distinct selected values) — the DuckDB
    * twin of [[TextHash.winnowHashes]]. Callers must guard
    * `len(g) >= 1`.
    */
  val winnowedDuck: String =
    """list_distinct(list_transform(range(1, greatest(len(g) - 3, 1) + 1),
      |  p -> g[list_max(list_filter(range(p, least(p + 3, len(g)) + 1),
      |        j -> g[j] = list_min(list_slice(g, p, least(p + 3, len(g))))))]))"""
      .stripMargin

  /** DuckDB polynomial hash of an arbitrary single-string SQL expression
    * `s` — the same base-31 mod-P left fold as [[TextHash.polyHash]], so
    * per-word hashes computed from an unnested word column match the
    * engine's `F.poly_hash` bit-for-bit.
    */
  def polyHashDuck(s: String): String = polyHashDuckBase(s, 31L)

  /** Base-parameterized variant — two folds with coprime bases give
    * independent digests whose PAIR has a ~2⁻⁶⁰ collision budget where
    * a single mod-P fold has ~2⁻³⁰ (the e92/e94 checksum upgrade).
    */
  def polyHashDuckBase(s: String, base: Long): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (a, c) -> (a*$base + c) % $P)""".stripMargin

  val textFingerprintDuck: String = polyHashDuck("text")

  /** Second independent text fingerprint (base 37). */
  val textFingerprint2Duck: String = polyHashDuckBase("text", 37L)

  // ---- Portable pseudo-random hyperplanes (sign-LSH over embeddings) ------

  /** Deterministic hyperplane weight for (plane j, 0-based dim d) in [-1,1).
    * Pure integer arithmetic then one division — identical in Scala, Spark
    * and DuckDB.
    */
  def hyperplaneWeight(j: Int, d: Int): Double =
    ((j.toLong * 64 + d) * 2654435761L % 2147483647L).toDouble /
      2147483647.0 * 2 - 1

  /** DuckDB expression for the same weight, with 1-based dim index `d`. */
  def hyperplaneWeightDuck(j: Int): String =
    s"(CAST((($j*64 + (d-1)) * 2654435761) % 2147483647 AS DOUBLE)" +
      " / 2147483647.0 * 2 - 1)"

  /** DuckDB twin of [[TextHash.morton2]]: explicit shift/mask sum over
    * the low `bits` bits of the `x` / `y` SQL expressions. Pure integer
    * bit math — bit-identical to the codegen'd expression.
    */
  def morton2Duck(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { j =>
      s"(((($x) >> $j) & 1) << ${2 * j}) + (((($y) >> $j) & 1) << ${2 * j + 1})"
    }.mkString("(", " + ", ")")
}
