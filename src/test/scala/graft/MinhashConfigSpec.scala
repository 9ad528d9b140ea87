package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

/** The n-adaptive minhash banding rule (text analog of lshRowsForN):
  * B = 2^r pins the S-curve threshold J* = (1/B)^(1/r) at 0.5 for every
  * output, r grows with log₂ n, and the ORACLED configuration is the
  * rule's own output at the sf0.01 gate corpus (500 docs) — the static
  * oracle compromise documented in Dedup.
  */
class MinhashConfigSpec extends AnyFunSuite {

  test("oracled constants are the rule's output at the 500-doc gate") {
    val r = Dedup.minhashRowsForN(500)
    assert(r === 2)
    assert(Dedup.minhashBandsForR(r) === 4)
    assert(Dedup.BandRows === r)
    assert(Dedup.Bands === Dedup.minhashBandsForR(r))
    assert(Dedup.NumHashes === Dedup.BandRows * Dedup.Bands)
  }

  test("B = 2^r pins the S-curve threshold at 0.5 for every rule output") {
    for (n <- Seq(10L, 500L, 100000L, 1L << 30, 1L << 40)) {
      val r = Dedup.minhashRowsForN(n)
      val b = Dedup.minhashBandsForR(r)
      val jStar = math.pow(1.0 / b, 1.0 / r)
      assert(math.abs(jStar - 0.5) < 1e-9, s"n=$n r=$r B=$b J*=$jStar")
    }
  }

  test("r grows with log2 n into the industrial range at 1e9 docs") {
    assert(Dedup.minhashRowsForN(1L << 30) === 6)
    assert(Dedup.minhashBandsForR(6) === 64) // 384 hashes/doc
    // monotone non-decreasing
    val rs = Seq(2L, 500L, 10000L, 1L << 20, 1L << 30, 1L << 40)
      .map(Dedup.minhashRowsForN)
    assert(rs === rs.sorted)
  }
}
