package graft.gen

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the generator's PURE arithmetic (SURVEY §5's
  * property-test item): coefficient ranges and the affine-bijection
  * guarantee that underwrites id uniqueness (distinct keys can never
  * collide within a (seed, tag)). The Column implementations are pinned
  * to this same arithmetic by q15_gen_scalars' DuckDB oracle and the
  * formula-mirror test in MockDataSpec.
  */
object MockDataProps extends Properties("MockData") {

  private val P = 1000000007L
  private val tagGen = Gen.alphaNumStr.map(_.take(24))
  private val keyGen = Gen.choose(0L, P - 1)

  property("mixCoeffs lands in range: a in [1,P-1], b in [0,P-1]") =
    Prop.forAll(Gen.long, tagGen) { (seed, tag) =>
      val (a, b) = MockData.mixCoeffs(seed, tag)
      a >= 1 && a < P && b >= 0 && b < P
    }

  /** The full draw: affine map then cube mod P (gcd(3, P-1) = 1, so
    * cubing is a permutation and the composition stays a bijection).
    */
  private def draw(seed: Long, tag: String, k: Long): Long = {
    val (a, b) = MockData.mixCoeffs(seed, tag)
    val x = (k % P * a + b) % P
    (x * x % P) * x % P
  }

  property("cubed-affine draw is a bijection mod P (distinct keys never collide)") =
    Prop.forAll(Gen.long, tagGen, keyGen, keyGen) { (seed, tag, k1, k2) =>
      (k1 == k2) == (draw(seed, tag, k1) == draw(seed, tag, k2))
    }

  property("draws stay in [0, P) for any nonnegative key") =
    Prop.forAll(Gen.long, tagGen, Gen.choose(0L, Long.MaxValue)) {
      (seed, tag, key) =>
        val d = draw(seed, tag, key)
        d >= 0 && d < P
    }
}
