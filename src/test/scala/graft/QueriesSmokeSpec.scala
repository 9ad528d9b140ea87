package graft

/** Every SparkEntry query executes on sf0.001 and returns a stable,
  * deterministic result (run twice, same rows). Value-level correctness
  * is the driver's DuckDB oracle at sf0.01; this guards runtime
  * regressions (analysis errors, non-determinism, nulls in key columns)
  * at commit time.
  */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and is deterministic on sf0.001") {
      val a = fn(spark, sfDir).collect()
      val b = fn(spark, sfDir).collect()
      assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "two runs differ")
    }
  }

  test("every query has oracle SQL") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
