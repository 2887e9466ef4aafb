package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (the manual fallback when AQE's
  * skew-join split can't apply — e.g. the skewed side feeds a stateful
  * or bucketed operator that pins its partitioning, or the engine runs
  * with AQE off).
  *
  * Standard construction: the skewed (fact) side appends a deterministic
  * salt in [0, S) hashed from its whole row key-set, widening each hot
  * key across S shuffle partitions; the dim side is replicated S times
  * via a literal-array explode. The join key becomes (key, salt), so no
  * single reducer sees more than ~1/S of a hot key's rows. Results are
  * identical to the plain equi-join (every fact row still meets exactly
  * its key's dim row — once, under its own salt).
  *
  * Cost model: replicates the RIGHT side S times — use it fact ⟕ dim
  * with a small-to-medium dim that is too big to broadcast but cheap to
  * replicate S ways; for dims that DO fit in memory, `broadcast()` is
  * strictly better (no shuffle at all).
  */
object SkewJoin {

  /** Join types that preserve the plain-equi-join result under dim-side
    * replication: every fact row still meets its key's dim row exactly
    * once (under its own salt), and semi/anti existence checks see the
    * dim key at every salt. Right/full outer would emit each UNMATCHED
    * dim row once per salt — `salts` duplicates — so they are rejected.
    */
  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  /** @param saltCols columns the fact-side salt is hashed from. Default
    *                  (empty) hashes EVERY fact column — deterministic,
    *                  but a hot key whose rows are byte-identical (the
    *                  duplicate-heavy corpus case this operator targets)
    *                  then collapses to one salt and the straggler is
    *                  silently back. Callers with a unique or
    *                  high-entropy payload column (a doc uid, an event
    *                  id) should pass it here so identical-looking hot
    *                  rows still spread across all `salts` reducers.
    *                  All named columns must be xxhash64-hashable (no
    *                  MapType).
    */
  def saltedEquiJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 8, joinType: String = "inner",
      saltCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(SupportedJoinTypes(joinType.toLowerCase),
      s"saltedEquiJoin: joinType '$joinType' would duplicate unmatched dim " +
        "rows (dim side is replicated per salt); use inner/left/semi/anti")
    val missing = saltCols.filterNot(fact.columns.contains)
    require(missing.isEmpty,
      s"saltedEquiJoin: saltCols not in fact: ${missing.mkString(", ")}")
    // Salt derived from ROW CONTENT only: a nondeterministic component
    // (rand, monotonically_increasing_id) would re-salt rows differently
    // when a lost shuffle map output forces partial stage recomputation —
    // Spark's indeterminate-stage rollback does not cover expression-level
    // nondeterminism inside a partitioning key, so rows could be
    // duplicated or dropped across attempt generations. Hashing content
    // reproduces identical salts on any recomputation.
    val hashInput =
      (if (saltCols.nonEmpty) saltCols else fact.columns.toIndexedSeq)
        .map(col)
    val salted = fact.withColumn(
      "__salt", pmod(xxhash64(hashInput: _*), lit(salts)))
    val replicated = dim.withColumn(
      "__salt", explode(array((0 until salts).map(lit(_)): _*)))
    val out = salted.join(replicated, Seq(key, "__salt"), joinType)
    out.drop("__salt")
  }

  /** Diagnostic: rows per key above `threshold` — the keys that would
    * straggle a plain shuffle join; feed the count into `salts`.
    */
  def hotKeys(df: DataFrame, key: Column, threshold: Long): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n")).filter(col("n") >= threshold)

  /** SELECTIVE salting — the production form SCALING.md names as q32's
    * next lever: census the fact side's hot keys with the Misra-Gries
    * sketch (`minShare − 1` counters per partition, one bounded driver
    * pull — the e29 discipline, NO vocabulary-sized shuffle), then salt
    * only rows carrying a candidate key; everything else takes the
    * plain equi-join with zero dim replication. The MG guarantee makes
    * the candidate set a SUPERSET of every key holding > 1/minShare of
    * the fact — and salting a false-positive key is result-neutral
    * (each fact row still meets its dim row exactly once), so no exact
    * second pass is needed: correctness is unconditional, the sketch
    * only decides WHERE the replication cost is paid. Replication drops
    * from |dim|·S to |hot dim rows|·S and the cold path keeps normal
    * AQE planning. Keys must be integral (the sketch counts longs);
    * NULL-key fact rows ride the cold path, preserving outer semantics.
    */
  def saltedEquiJoinSelective(
      fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 8, joinType: String = "inner",
      saltCols: Seq[String] = Nil, minShare: Int = 64): DataFrame = {
    require(minShare > 1, "minShare must be > 1")
    // Contract check up front: the empty-candidate fast path below would
    // otherwise accept right/full outer that the hot path rejects, making
    // the API's legality depend on the data's skew profile.
    require(SupportedJoinTypes(joinType.toLowerCase),
      s"saltedEquiJoinSelective: joinType '$joinType' would duplicate " +
        "unmatched dim rows on the salted path; use inner/left/semi/anti")
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType)
        .contains(fact.schema(key).dataType),
      s"saltedEquiJoinSelective: key '$key' must be integral for the" +
        " hot-key sketch; use saltedEquiJoin for other key types")
    val cand = fact
      .agg(graft.functions.sketches
        .misra_gries(col(key).cast("long"), minShare - 1))
      .head().getSeq[Long](0)
    if (cand.isEmpty) fact.join(dim, Seq(key), joinType)
    else {
      val hot = col(key).isin(cand: _*)
      val hotPath = saltedEquiJoin(
        fact.filter(hot), dim.filter(hot), key, salts, joinType, saltCols)
      // NULL-key fact rows: hot is NULL there; keep them on the cold
      // path so left/anti semantics see them exactly once
      val coldPath = fact.filter(coalesce(!hot, lit(true)))
        .join(dim.filter(hot.isNotNull && !hot), Seq(key), joinType)
      hotPath.unionByName(coldPath)
    }
  }
}
