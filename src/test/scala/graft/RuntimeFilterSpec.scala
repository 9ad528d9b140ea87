package graft

import org.apache.spark.sql.functions._

/** Runtime join-filter features — the two Catalyst mechanisms that cut
  * the probe side of a selective join BEFORE the shuffle, essential at
  * 100 TB where the fact scan dominates:
  *
  *  - DYNAMIC PARTITION PRUNING: a filter on the dimension side of a
  *    join on a partition column becomes a runtime subquery that prunes
  *    fact PARTITIONS at file-listing time (q36 pins the static form;
  *    this pins the join-driven form).
  *  - RUNTIME BLOOM FILTER: a selective non-partition join builds a
  *    bloom filter over the build side's keys and applies
  *    `might_contain` on the probe side's scan, dropping most rows
  *    before the join exchange.
  *
  * Both are config-gated optimizer rewrites — these tests prove the
  * rewrite fires on this build of Spark with this session's extensions,
  * and that results are invariant under it. The size thresholds are
  * lowered to test scale; at production scale the defaults (10 MB
  * creation / 10 GB application side) gate sensibly.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    val s = spark
    // per-run unique scratch: concurrent runs must not race on overwrite
    val base = graft.core.TempDirs.create("graft_dpp_events_")
    graft.sources.Tables(s, sfDir).events
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(base)

    // the dim must be a real source: a filtered LocalRelation is
    // constant-folded (ConvertToLocalRelation), leaving no selective
    // Filter node for DPP's benefit heuristic to see
    val dimPath = graft.core.TempDirs.create("graft_dpp_dim_")
    s.createDataFrame(Seq(
      ("click", 1.0), ("view", 0.5), ("purchase", 3.0), ("error", 0.0),
      ("scroll", 0.1))).toDF("etype", "weight")
      .write.mode("overwrite").parquet(dimPath)
    val dim = s.read.parquet(dimPath)

    def joined = s.read.parquet(base)
      .join(dim.where(col("weight") >= 3.0), col("event_type") === col("etype"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("cents"))

    val withDpp = joined
    val p = withDpp.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter on the fact scan:\n$p")

    // result invariance: same join with DPP disabled
    val expected = withConf("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "false")(joined.collect().toSeq.map(_.toString))
    assert(withDpp.collect().toSeq.map(_.toString) == expected)
  }

  test("runtime bloom filter: selective join injects might_contain on the probe side") {
    val s = spark
    val t = graft.sources.Tables(s, sfDir)
    def q = t.lineitem.select("l_orderkey", "l_extendedprice")
      .join(t.orders.where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"), sum(cents(col("l_extendedprice"))).as("cents"))

    val (bloomPlan, bloomRows) = withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // keep the join a shuffle join so the probe side is worth filtering
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      (q.queryExecution.executedPlan.toString, q.collect().toSeq.map(_.toString))
    }
    assert(bloomPlan.contains("might_contain") || bloomPlan.contains("bloom_filter"),
      s"expected a runtime bloom filter on the probe scan:\n$bloomPlan")

    val plainRows = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")(
      q.collect().toSeq.map(_.toString))
    assert(bloomRows == plainRows, "bloom pre-filter must be result-invisible")
  }

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  private def withConf[A](key: String, value: String)(body: => A): A =
    withConfs(key -> value)(body)

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
