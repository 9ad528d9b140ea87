package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Similarity

/** The IVF quantizer-width rule: cells ≈ √n above the multi-probe
  * floor, monotone in n, and equal to the oracled gate config at test
  * scale (same discipline as MinhashConfigSpec / the lshRowsForN
  * assertions in EmbedLshSpec).
  */
class IvfConfigSpec extends AnyFunSuite {

  test("gate corpora sit on the floor = the oracled BucketDims") {
    assert(Similarity.ivfBitsForN(500) === 8)
    assert(Similarity.ivfBitsForN(2000) === 8)
  }

  test("bits track ceil(log2(sqrt(n))) into the industrial range") {
    assert(Similarity.ivfBitsForN(1L << 16) === 8) // 65k vectors: 256 cells
    assert(Similarity.ivfBitsForN(1L << 20) === 10) // 1M: 1024 cells
    assert(Similarity.ivfBitsForN(1000000000L) === 15) // 1e9: 32768 cells ~ sqrt(n)
  }

  test("monotone non-decreasing in n") {
    val ns = Seq(2L, 100L, 10000L, 1000000L, 100000000L, 10000000000L)
    val bits = ns.map(Similarity.ivfBitsForN)
    assert(bits === bits.sorted)
  }
}
