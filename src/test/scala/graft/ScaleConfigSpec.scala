package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

/** The n-adaptive story, auditable in one place: at the gate corpus
  * size every oracle-pinned constant equals its sizing rule's output —
  * except the one documented embed-LSH divergence — and the rules keep
  * their growth shape at production scales. No SparkSession needed:
  * these are pure arithmetic.
  */
class ScaleConfigSpec extends AnyFunSuite {

  test("gate constants equal the rules' outputs at the gate corpus size") {
    val rule = ScaleConfig.forCorpus(ScaleConfig.GateN)
    val gate = ScaleConfig.gate
    assert(gate.minhashRowsPerBand === rule.minhashRowsPerBand)
    assert(gate.minhashBands === rule.minhashBands)
    assert(gate.minhashHashes === rule.minhashHashes)
    assert(gate.ivfBits === rule.ivfBits)
    assert(gate.ivfCells === rule.ivfCells)
    assert(gate.kmeansCells === rule.kmeansCells)
    assert(gate.kmeansProbes === rule.kmeansProbes)
    assert(gate.pqCodewords === rule.pqCodewords)
    assert(gate.seqPackShards === rule.seqPackShards)
    assert(gate.shuffleShards === rule.shuffleShards)
    // SemDeDup shares the learned-quantizer operating point
    assert(Dedup.SemdedupK === graft.queries.Similarity.KmeansK)
    // the ONE deliberate divergence: the oracled embed-LSH pins r=8
    // (192 inlined hyperplane literals) where the rule says 9 — pinned
    // here so the gap can never silently widen
    assert(rule.embedLshRowsPerBand === 9)
    assert(gate.embedLshRowsPerBand === 8)
  }

  test("rules keep their documented shape at production scales") {
    val m = ScaleConfig.forCorpus(1000000000L) // 10^9 docs/vectors
    assert(m.minhashRowsPerBand === 6 && m.minhashBands === 64)
    assert(m.ivfBits === 15 && m.ivfCells === 32768)
    assert(m.embedLshRowsPerBand === 30)
    assert(m.kmeansCells === 16384)
    assert(m.kmeansProbes === 1024)
    assert(ScaleConfig.forCorpus(1000000L).kmeansCells === 512)
    // ADC code budget: √n snapped to a power of two, floored at the
    // gate's 16, capped at byte codes (K=256) — the recall-study
    // decades and the billion-scale cap
    assert(ScaleConfig.forCorpus(2000L).pqCodewords === 32)
    assert(ScaleConfig.forCorpus(20000L).pqCodewords === 128)
    assert(ScaleConfig.forCorpus(200000L).pqCodewords === 256)
    assert(m.pqCodewords === 256)
    assert(m.seqPackShards === 15259)
    // shuffle shards: seqPack's target snapped UP to a power of two
    // (the shard id is a bit-range of the 32-bit coin)
    assert(m.shuffleShards === 16384)
    assert(ScaleConfig.forCorpus(1000000L).shuffleShards === 16)
    // monotone non-decreasing in n, for every knob
    val ns = Seq(500L, 10000L, 1000000L, 100000000L, 10000000000L)
    val rs = ns.map(ScaleConfig.forCorpus)
    def mono(f: ScaleConfig.Resolved => Int) =
      rs.map(f).sliding(2).forall(w => w(0) <= w(1))
    assert(mono(_.minhashHashes) && mono(_.embedLshRowsPerBand) &&
      mono(_.ivfBits) && mono(_.kmeansCells) && mono(_.seqPackShards) &&
      mono(_.shuffleShards) && mono(_.pqCodewords))
  }

  test("the gate minhash constants stay internally consistent") {
    assert(Dedup.Bands === Dedup.minhashBandsForR(Dedup.BandRows))
    assert(Dedup.NumHashes === Dedup.BandRows * Dedup.Bands)
  }
}
