package graft

import graft.queries.TextAnalysis

/** ta_shuffle_shard's contract: the sharded layout IS a deterministic
  * global permutation. Shards are contiguous ranges of the md5-coin
  * space (range partition = distributed global sort), so reading shard
  * 0..S-1 each in `pos` order replays the exact md5-ordered shuffle —
  * verified here against an independent Java-MD5 recomputation, with
  * the range-partition arithmetic (coin >> 29) and the per-shard
  * position contiguity pinned separately.
  */
class ShuffleShardSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  test("sharded output is exactly the md5-coin global permutation") {
    val rows = TextAnalysis.taShuffleShard(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val n = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.length.toLong === n)

    // coin and shard re-derived independently (Java MD5, not Spark's)
    rows.foreach { case (shard, _, docId, coin) =>
      val expect = md5hex(s"graft-shuf-1|$docId").take(8)
      assert(coin === expect, s"coin mismatch for doc $docId")
      assert(shard === (java.lang.Long.parseLong(expect, 16) >> 29).toInt,
        s"shard is not the top-3-bit coin range for doc $docId")
    }

    // positions are contiguous 1..|shard| within every shard
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1 to rs.length),
        s"positions not contiguous in shard $shard")
    }

    // concatenating shards in (shard, pos) order IS the global
    // (coin, doc_id) sort — the permutation property
    val byShardPos = rows.sortBy(r => (r._1, r._2)).map(r => (r._4, r._3)).toSeq
    assert(byShardPos === rows.map(r => (r._4, r._3)).sortBy(identity).toSeq)

    // every shard populated at gate scale (500 docs over 8 ranges)
    assert(rows.map(_._1).distinct.sorted.toSeq ===
      (0 until TextAnalysis.ShuffleShards))
  }

  test("a non-gate shard width keeps the permutation property (rule path)") {
    import spark.implicits._
    val d = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val rows = TextAnalysis.shuffleShard(d, 32).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(rows.length === 200)
    // shard = top-5-bit coin range at width 32
    rows.foreach { case (shard, _, docId, coin) =>
      val expect = md5hex(s"graft-shuf-1|$docId").take(8)
      assert(coin === expect)
      assert(shard === (java.lang.Long.parseLong(expect, 16) >> 27).toInt)
    }
    // (shard, pos) concatenation is still the global (coin, doc_id) sort
    val byShardPos = rows.sortBy(r => (r._1, r._2)).map(r => (r._4, r._3)).toSeq
    assert(byShardPos === rows.map(r => (r._4, r._3)).sortBy(identity).toSeq)
  }

  test("the rule: power-of-two widths only, ~64k-doc target, gate floor 8") {
    assert(TextAnalysis.shuffleShardsForN(500L) === TextAnalysis.ShuffleShards)
    assert(TextAnalysis.shuffleShardsForN(1000000L) === 16)
    assert(TextAnalysis.shuffleShardsForN(1000000000L) === 16384)
    intercept[IllegalArgumentException] {
      TextAnalysis.shuffleShard(spark.range(1).toDF, 12)
    }
  }
}
