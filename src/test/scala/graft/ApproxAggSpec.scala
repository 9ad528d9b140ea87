package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates — the declared 100 TB path where the exact
  * forms stop scaling (COVERAGE: q12's exact COUNT(DISTINCT) plans an
  * Expand + two exchanges; q33's exact percentile sorts every group's
  * values in the aggregate buffer). The sketches are mergeable partials
  * — constant-size state per partition, one normal exchange — which is
  * the whole point at scale. They are engine-specific, so they can't go
  * under the DuckDB hash gate; these specs pin instead:
  *  (1) the estimate lands within the configured error of the exact
  *      answer (deterministic: Spark's HLL++/GK sketches have no RNG),
  *  (2) MERGEABILITY — HLL++'s estimate is exactly invariant under
  *      repartitioning; the GK percentile summary's merge is NOT
  *      layout-invariant (documented on its test) and only the error
  *      band is guaranteed.
  */
class ApproxAggSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("approx_count_distinct: within rsd band of exact, partition-invariant") {
    val li = graft.sources.Tables(spark, sfDir).lineitem
    val exact = li.agg(countDistinct("l_orderkey")).head().getLong(0)
    val rsd = 0.05
    val est = li.agg(approx_count_distinct("l_orderkey", rsd)).head().getLong(0)
    val relErr = math.abs(est - exact).toDouble / exact
    assert(relErr <= 3 * rsd,
      s"HLL++ estimate $est vs exact $exact: rel err $relErr > ${3 * rsd}")

    // mergeability: any partition layout must give the identical estimate
    val est1 = li.repartition(1)
      .agg(approx_count_distinct("l_orderkey", rsd)).head().getLong(0)
    val est7 = li.repartition(7, col("l_partkey"))
      .agg(approx_count_distinct("l_orderkey", rsd)).head().getLong(0)
    assert(est1 == est7 && est7 == est,
      s"sketch merge must be layout-invariant: $est1 / $est7 / $est")
  }

  test("q53_profile_approx: every profiled column's estimate within band of exact") {
    // the gated row carries only the sanity envelope (engine-specific
    // sketch values can't hash across engines); THIS is the tight bound
    // for the approx-profile path a 100 TB user actually runs
    val out = graft.queries.Relational.q53ProfileApprox(spark, sfDir).collect()
    assert(out.length === 6)
    assert(out.forall(_.getBoolean(3)), "approx_sane must hold on every column")
    val li = graft.sources.Tables(spark, sfDir).lineitem
    val profiled = Seq("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_shipdate")
    for (c <- profiled) {
      val exact = li.agg(countDistinct(col(c))).head().getLong(0)
      val est = li.agg(approx_count_distinct(col(c))).head().getLong(0)
      val relErr = math.abs(est - exact).toDouble / math.max(1L, exact)
      assert(relErr <= 3 * 0.05,
        s"$c: estimate $est vs exact $exact rel err $relErr > 0.15")
    }
  }

  /** NOTE the asymmetry with HLL++: the GK quantile summary's merge is
    * order/layout-SENSITIVE (merging two compressed summaries is not
    * associative-exact), so unlike approx_count_distinct the estimate
    * varies with partitioning — each layout must only stay within the
    * accuracy band. Downstream consequence at 100 TB: re-running the
    * same approx_percentile after a repartition may shift the estimate
    * within the band; pin the layout (or the exact form) if a pipeline
    * diffs successive runs.
    */
  test("approx_percentile: every layout's median lands between exact p45 and p55") {
    val li = graft.sources.Tables(spark, sfDir).lineitem
    val Seq(p45, p55) = li
      .agg(expr("percentile(l_extendedprice, 0.45)"),
        expr("percentile(l_extendedprice, 0.55)"))
      .head().toSeq.map(_.asInstanceOf[Double]).toList match {
      case l => l
    }
    val acc = 1000
    val est = li.agg(expr(s"approx_percentile(l_extendedprice, 0.5, $acc)"))
      .head().getDouble(0)
    assert(est >= p45 && est <= p55,
      s"approx median $est outside exact [$p45, $p55]")

    val est1 = li.repartition(1)
      .agg(expr(s"approx_percentile(l_extendedprice, 0.5, $acc)"))
      .head().getDouble(0)
    val est5 = li.repartition(5, col("l_orderkey"))
      .agg(expr(s"approx_percentile(l_extendedprice, 0.5, $acc)"))
      .head().getDouble(0)
    for ((e, layout) <- Seq(est1 -> "1 partition", est5 -> "5 partitions"))
      assert(e >= p45 && e <= p55,
        s"approx median $e ($layout) outside exact [$p45, $p55]")
  }
}
