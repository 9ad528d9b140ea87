package graft

import org.apache.spark.sql.functions._
import graft.core.{Bucketing, Skew}

/** The scale utilities produce correct results AND the plan shapes they
  * promise (salt key in the shuffle; no Exchange on bucketed joins).
  */
class ScaleUtilsSpec extends SparkSpec {

  test("saltedInnerJoin == plain inner join, and shuffles on (key, salt)") {
    import spark.implicits._
    // skewed left: key 1 dominates
    val left = (Seq.fill(500)(1) ++ (2 to 50)).map(k => (k, s"l$k")).toDF("k", "lv")
    val right = (1 to 50).map(k => (k, s"r$k")).toDF("k", "rv")
    val salted = Skew.saltedInnerJoin(left, right, "k", 8)
    val plain = left.join(right, "k")
    val a = salted.select("k", "lv", "rv").collect().map(_.toString).sorted
    val b = plain.select("k", "lv", "rv").collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "salt column must participate in the join")
  }

  test("identical duplicate rows on one hot key spread across all salts") {
    import spark.implicits._
    // The worst case a row-hash salt cannot spread: every left row is
    // byte-identical. The partition-local counter must still round-robin
    // them over the n salts.
    val n = 8
    val left = Seq.fill(4000)((1, "same")).toDF("k", "lv").repartition(4)
    val salted = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(n.toLong)).cast("int"))
    val perSalt = salted.groupBy("__salt").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perSalt.keySet == (0 until n).toSet, s"all $n salts must be hit: $perSalt")
    val max = perSalt.values.max.toDouble
    val min = perSalt.values.min.toDouble
    assert(max / min < 2.0, s"spread must be near-uniform: $perSalt")
    // and the join result is still exactly the plain join
    val right = Seq((1, "r1"), (2, "r2")).toDF("k", "rv")
    val a = Skew.saltedInnerJoin(left, right, "k", n)
      .select("k", "lv", "rv").collect().map(_.toString).sorted.toSeq
    val b = left.join(right, "k")
      .select("k", "lv", "rv").collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("q27_skew_join shuffles on (user_id, __salt) and equals the plain join") {
    val dir = "/root/testdata/sf0.001"
    // Disable broadcast so the salted SHUFFLE path materializes (at real
    // scale the premise is a right side too big to broadcast; at sf0.001
    // Catalyst would rightly broadcast it and hide the exchange).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = graft.sources.Tables(spark, dir)
      val ev = t.events.select(col("user_id"), col("value"))
      val cust = t.customer.select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      val salted = Skew.saltedInnerJoin(ev, cust, "user_id", 8)
      val plan = salted.queryExecution.executedPlan.toString
      assert("hashpartitioning\\([^)]*__salt".r.findFirstIn(plan).isDefined,
        s"__salt must be in the exchange's shuffle key:\n$plan")

      val viaQuery = graft.queries.Relational.q27SkewJoin(spark, dir)
        .collect().map(_.toString).toSeq
      val plain = ev.join(cust, "user_id")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("value_cents"))
        .orderBy("c_mktsegment")
        .collect().map(_.toString).toSeq
      assert(viaQuery == plain)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedCount == plain count per key") {
    import spark.implicits._
    val df = (Seq.fill(300)("hot") ++ Seq("a", "b", "b")).toDF("k")
    val got = Skew.saltedCount(df, "k", 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 300L, "a" -> 1L, "b" -> 2L))
  }

  test("skewReport surfaces the hot key first") {
    import spark.implicits._
    val df = (Seq.fill(90)("hot") ++ (1 to 10).map(_.toString)).toDF("k")
    val top = Skew.skewReport(df, "k", 3).collect()
    assert(top.head.getString(0) == "hot")
    assert(top.head.getDouble(3) > 5.0) // ~9.9x the mean
  }

  test("contamination broadcast path: BroadcastHashJoin on the test side, same result") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array, col, lit}
    // synthetic staged (doc_id, lang, sh): docs 0/10/20 are the held-out
    // split; doc 11 shares a shingle with doc 10, doc 12 shares none
    val staged = Seq(
      (0L, Seq("a b c", "b c d")), (10L, Seq("x y z")), (20L, Seq("p q r")),
      (11L, Seq("x y z", "m n o")), (12L, Seq("u v w"))
    ).toDF("doc_id", "sh").withColumn("lang", lit("en"))
      .select(col("doc_id"), col("lang"), col("sh"))
    val bcast = graft.queries.Dedup.contam(staged, broadcastTest = true)
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small test side must broadcast:\n$plan")
    val a = bcast.collect().map(_.toString).toSeq
    val b = graft.queries.Dedup.contam(staged, broadcastTest = false)
      .collect().map(_.toString).toSeq
    assert(a == b, "join strategy must be result-invisible")
    assert(a.size == 1 && a.head.contains("11"), s"only doc 11 is contaminated: $a")
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    // the runtime complement to Skew.saltedInnerJoin: salting is the
    // plan-time fix you reach for when you KNOW the hot keys; AQE's
    // skew-join split is the runtime fix for the skew you didn't
    // predict. This pins that the engine's session actually re-plans:
    // one key carries ~1000x the rows, and the final adaptive plan must
    // mark the join skew=true (the hot partition split across tasks),
    // with results identical to the unsplit join.
    import spark.implicits._
    val conf = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = ((1 to 200000).map(_ => 1) ++ (2 to 200))
        .map(k => (k, "x" * 32)).toDF("k", "lv")
      val right = (1 to 200).map(k => (k, s"r$k")).toDF("k", "rv")
      val joined = left.join(right, "k")
      val rows = joined.collect()
      assert(rows.length == 200000 + 199)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE must mark the skewed join:\n$p")
    } finally prev.foreach { case (k, vo) =>
      vo.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("bucketed join runs with no Exchange on either side") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i % 97, s"f$i")).toDF("k", "fv")
    val dims = (0 until 97).map(i => (i, s"d$i")).toDF("k", "dv")
    Bucketing.writeBucketed(facts, "graft_facts_b", "k", 8)
    Bucketing.writeBucketed(dims, "graft_dims_b", "k", 8)
    // Force the sort-merge path: with broadcast on, the small side would
    // be a BroadcastExchange and hide the co-partitioning win.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "graft_facts_b", "graft_dims_b", "k")
      assert(joined.count() == 1000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected exchange-free bucketed join, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        "scan must read bucketed")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
