package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** clusterPairs must compute exact connected components — including
  * multi-hop chains, where a single propagation round is not enough and
  * the fixpoint loop has to keep going.
  */
class DedupClusterSpec extends SparkSpec {

  test("chain pairs collapse to one component (multi-round propagation)") {
    import spark.implicits._
    // path 10-11-12-13-14-15: min label 10 must travel 5 hops
    val pairs = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (10L to 15L).map(_ -> 10L).toMap)
  }

  test("separate components keep separate canonical ids; order-insensitive") {
    import spark.implicits._
    // two components, edges listed in arbitrary direction/order, plus a
    // triangle (cycle must not loop forever)
    val pairs = Seq((5L, 2L), (2L, 9L), (9L, 5L), (40L, 30L), (30L, 20L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusterPairs(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 2L, 5L -> 2L, 9L -> 2L,
      20L -> 20L, 30L -> 20L, 40L -> 20L))
  }

  test("empty pair set yields empty clustering") {
    import spark.implicits._
    val pairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.clusterPairs(pairs).count() === 0L)
  }

  test("dd_cluster members are exactly the J>=0.5 minhash pair members") {
    val pairs = Dedup.ddMinhashLsh(spark, "/root/testdata/sf0.001")
      .where(col("jaccard") >= 0.5)
    val members = pairs.select(col("doc_a").as("d"))
      .union(pairs.select(col("doc_b").as("d")))
      .distinct().collect().map(_.getLong(0)).toSet
    val clustered = Dedup.ddCluster(spark, "/root/testdata/sf0.001").collect()
    assert(clustered.map(_.getLong(0)).toSet == members)
    // every cluster id is a member of its own cluster (canonical keep doc)
    val byCluster = clustered.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_.getLong(0)).contains(cid), s"cluster $cid missing its rep")
    }
  }
}
