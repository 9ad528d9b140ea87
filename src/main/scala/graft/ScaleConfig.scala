package graft

import graft.queries.{Dedup, Similarity, TextAnalysis}

/** The engine's n-adaptive sizing rules, resolved in ONE place.
  *
  * Every candidate-generating operator carries a knob that must GROW
  * with the corpus or its cost curve breaks — minhash rows/bands
  * (candidate-join volume), embedding-LSH bits per band (random
  * collision budget), IVF quantizer bits (within-cell scan), sequence-
  * packing shards (per-shard window sort). Each rule lives next to its
  * operator with its own derivation; this object is the audit surface:
  * resolve them all for a given corpus size and compare against the
  * oracle-pinned gate constants.
  *
  * Resolved examples (ScaleConfigSpec pins the first and last):
  *
  *   n        minhash r×B   lsh r   ivf bits (cells)   kmeans cells   seqpack shards
  *   500      2×4           9       8 (256)            16             8
  *   10⁶      2×4(→4×16)    20      10 (1 024)         512            16
  *   10⁹      6×64          30      15 (32 768)        16 384         15 259
  *
  * Gate discipline: the driver's oracle SQL is static, so the oracled
  * queries bake in the rules' outputs AT THE GATE CORPUS (n = 500) —
  * with one documented exception: [[Dedup.lshRowsForN]](500) = 9 while
  * the oracled embed-LSH pins r = 8, trading one bit of random-
  * collision headroom (inert at gate scale, measured) to keep the
  * hyperplane constant table at the 192 literals both engines inline.
  * ScaleConfigSpec asserts every equality — and that one deliberate
  * divergence — so a rule edit that silently un-pins a gate config
  * fails tests, not the oracle.
  */
object ScaleConfig {

  /** Every adaptive knob, resolved for one corpus size. */
  final case class Resolved(
      minhashRowsPerBand: Int,
      minhashBands: Int,
      minhashHashes: Int,
      embedLshRowsPerBand: Int,
      ivfBits: Int,
      ivfCells: Int,
      kmeansCells: Int,
      kmeansProbes: Int,
      pqCodewords: Int,
      seqPackShards: Int,
      shuffleShards: Int)

  def forCorpus(n: Long): Resolved = {
    val r = Dedup.minhashRowsForN(n)
    val bands = Dedup.minhashBandsForR(r)
    val bits = Similarity.ivfBitsForN(n)
    Resolved(
      minhashRowsPerBand = r,
      minhashBands = bands,
      minhashHashes = r * bands,
      embedLshRowsPerBand = Dedup.lshRowsForN(n),
      ivfBits = bits,
      ivfCells = 1 << bits,
      kmeansCells = Similarity.kmeansCellsForN(n),
      // the structureless-data probe fallback (constant scanned
      // fraction); clustered corpora keep the gate's fixed budget —
      // see kmeansProbesForK's derivation and the round-8 recall study
      kmeansProbes = Similarity.kmeansProbesForK(Similarity.kmeansCellsForN(n)),
      // the ADC code budget (codewords per subspace) — fixed codes are
      // a fixed error band; see Pq.pqKForN's derivation and the
      // round-9 recall table
      pqCodewords = graft.queries.Pq.pqKForN(n),
      seqPackShards = TextAnalysis.seqPackShardsForN(n),
      shuffleShards = TextAnalysis.shuffleShardsForN(n))
  }

  /** documents/embeddings row count of the driver's gate corpus — the n
    * at which the oracled queries' baked-in constants were resolved.
    */
  val GateN = 500L

  /** The constants the oracled queries actually use. */
  def gate: Resolved = Resolved(
    minhashRowsPerBand = Dedup.BandRows,
    minhashBands = Dedup.Bands,
    minhashHashes = Dedup.NumHashes,
    embedLshRowsPerBand = Dedup.LshRowsPerBand,
    ivfBits = Similarity.BucketDims,
    ivfCells = 1 << Similarity.BucketDims,
    kmeansCells = Similarity.KmeansK,
    kmeansProbes = Similarity.KmeansProbes,
    pqCodewords = graft.queries.Pq.PqK,
    seqPackShards = TextAnalysis.GateSeqPackShards,
    shuffleShards = TextAnalysis.ShuffleShards)
}
