package graft

import org.apache.spark.sql.functions._

import graft.queries.TextAnalysis

/** The sequence-packing scale rule ([[TextAnalysis.seqPackShardsForN]])
  * and the shard-count invariance of the packing itself: shards only
  * redistribute WHICH packs documents land in — every document is packed
  * exactly once and the token mass is conserved for any shard count.
  */
class SeqPackSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("seqPackShardsForN: floor 8 at test scale, ~64k docs per shard beyond") {
    assert(TextAnalysis.seqPackShardsForN(1L) === 8)
    assert(TextAnalysis.seqPackShardsForN(500L) === 8)
    assert(TextAnalysis.seqPackShardsForN(8L * 65536) === 8)
    assert(TextAnalysis.seqPackShardsForN(9L * 65536) === 9)
    assert(TextAnalysis.seqPackShardsForN(1000000L) === 16)
    // ~15k shards at a billion docs — cluster-width parallelism
    assert(TextAnalysis.seqPackShardsForN(1000000000L) === 15259)
    // monotone non-decreasing over a broad sweep
    val ns = Seq(1L, 1000L, 524288L, 1048576L, 100000000L, 1000000000L)
    val shards = ns.map(TextAnalysis.seqPackShardsForN)
    assert(shards === shards.sorted, s"not monotone: ${ns.zip(shards)}")
  }

  test("gate config is the rule's floor at the verify corpus size") {
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(TextAnalysis.seqPackShardsForN(n) === 8,
      s"oracle pins 8 shards but the rule yields a different count for n=$n")
  }

  test("packing invariants hold for any shard count") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = d.count()
    val reference = TextAnalysis.seqPack(d, 8)
      .agg(sum("n_docs").as("docs"), sum("n_tokens").as("toks"))
      .head()
    assert(reference.getLong(0) === nDocs) // every doc packed exactly once
    Seq(1, 3, 16).foreach { shards =>
      val packed = TextAnalysis.seqPack(d, shards)
      val totals = packed.agg(sum("n_docs").as("docs"), sum("n_tokens").as("toks")).head()
      assert(totals.getLong(0) === nDocs, s"shards=$shards lost documents")
      assert(totals.getLong(1) === reference.getLong(1), s"shards=$shards lost tokens")
      // every shard id is within range and every pack has at least one doc
      val bad = packed.where(col("shard") < 0 || col("shard") >= shards ||
        col("n_docs") < 1).count()
      assert(bad === 0L, s"shards=$shards produced out-of-range rows")
    }
  }
}
