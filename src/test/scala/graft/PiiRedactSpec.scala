package graft

import org.apache.spark.sql.functions.col
import graft.queries.Pii

/** PII redaction: closed-form mask fixtures (including ordering
  * interactions between the three stages), an independent
  * java.util.regex replay of the full gate query, and the
  * nothing-left-behind property on the masked output.
  */
class PiiRedactSpec extends SparkSpec {

  private def run(lines: String*): Seq[(String, Long, Long, Long)] = {
    import spark.implicits._
    lines.toDF("line")
      .select(Pii.redact(col("line")): _*)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("closed-form fixtures: masks, counts, and stage ordering") {
    assert(run("mail a.b-c%d@ex-1.org now") ===
      Seq(("mail [EMAIL] now", 1L, 0L, 0L)))
    assert(run("hosts 10.0.0.1 and 192.168.255.3") ===
      Seq(("hosts [IP] and [IP]", 0L, 2L, 0L)))
    assert(run("call 555-0042 ext") === Seq(("call [PHONE] ext", 0L, 0L, 1L)))
    // an email whose domain has digit runs is consumed by stage 1 and
    // must NOT be re-counted by the IP stage
    assert(run("x 12.34.56.78@a.bc y") === Seq(("x [EMAIL] y", 1L, 0L, 0L)))
    // all three in one line; digits without a hyphen or 4 dot-groups
    // stay untouched
    assert(run("u@v.wx 1.2.3.4 999-1234 id 123456789") ===
      Seq(("[EMAIL] [IP] [PHONE] id 123456789", 1L, 1L, 1L)))
    // no matches -> identity
    assert(run("plain text only") === Seq(("plain text only", 0L, 0L, 0L)))
  }

  test("gate query: equals an independent java.util.regex replay") {
    val sfDir = "/root/testdata/sf0.001"
    import spark.implicits._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name", "c_nationkey")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val expect = cust.toSeq.sortBy(_._1).map { case (ck, name, nk) =>
      val line = s"reach $name at user$ck@mail$nk.example.com or 10.${ck % 200}" +
        s".$nk.7 tel 555-${"%04d".format(ck % 10000)}"
      def count(re: String, s: String) =
        re.r.findAllMatchIn(s).length.toLong
      val t1 = line.replaceAll(Pii.EmailRe, "[EMAIL]")
      val t2 = t1.replaceAll(Pii.Ipv4Re, "[IP]")
      val t3 = t2.replaceAll(Pii.PhoneRe, "[PHONE]")
      (ck, t3, count(Pii.EmailRe, line), count(Pii.Ipv4Re, t1),
        count(Pii.PhoneRe, t2))
    }
    val got = Pii.taPiiRedact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expect)
    // every fixture row must actually exercise all three stages
    assert(got.forall { case (_, _, e, i, p) => e == 1 && i == 1 && p == 1 })
  }

  test("nothing left behind: masked output has no residual matches") {
    val got = Pii.taPiiRedact(spark, "/root/testdata/sf0.001")
      .select("masked").collect().map(_.getString(0))
    for (m <- got; re <- Seq(Pii.EmailRe, Pii.Ipv4Re, Pii.PhoneRe))
      assert(re.r.findFirstIn(m).isEmpty, s"residual PII in: $m")
  }
}
