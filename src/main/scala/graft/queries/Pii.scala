package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection + redaction — the scrub pass every training-data
  * pipeline runs before anything ships (emails, phone numbers, IP
  * addresses → typed mask tokens, with per-entity counts for the
  * audit log).
  *
  * The 100 TB shape: pure per-row regexp projection folded into the
  * scan — no shuffle, no join, no state; the only aggregate a caller
  * might add (per-source counts) is a partial-agg rollup. The three
  * patterns are written in the dialect-portable subset shared by Java
  * regex and RE2 (character classes + bounded repeats; no lookaround,
  * no backrefs), so the DuckDB oracle replays the same masks
  * bit-for-bit — both engines implement leftmost, greedy,
  * non-overlapping matching for this subset.
  *
  * Redaction is SEQUENTIAL (email → IPv4 → phone) and each stage's
  * count is taken on ITS input — i.e. the counts report exactly what
  * each stage masked, and an entity consumed by an earlier mask is
  * never double-counted by a later stage.
  *
  * The gate corpus is synthetic word-salad with no natural PII, so the
  * query derives a deterministic contact line per CUSTOMER row
  * (name, a custkey-derived email, an IPv4, a phone extension) and
  * redacts that — the kernel is exercised on real matches in both
  * engines, and the full masked text (not just the counts) goes
  * under the driver's hash.
  */
object Pii {

  /** Dialect-portable entity patterns (Java regex ∩ RE2). */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re  = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private[graft] val PhoneRe = "[0-9]{3}-[0-9]{4}"

  /** One redaction stage: (masked text, n matched) on this input. */
  private def stage(in: Column, re: String, tok: String): (Column, Column) =
    (regexp_replace(in, re, tok), regexp_count(in, lit(re)).cast("long"))

  /** The kernel over any text column: returns the fully-masked text
    * and the three per-stage counts, as named columns.
    */
  private[graft] def redact(line: Column): Seq[Column] = {
    val (t1, nEmails) = stage(line, EmailRe, "[EMAIL]")
    val (t2, nIps)    = stage(t1, Ipv4Re, "[IP]")
    val (t3, nPhones) = stage(t2, PhoneRe, "[PHONE]")
    Seq(t3.as("masked"), nEmails.as("n_emails"), nIps.as("n_ips"),
      nPhones.as("n_phones"))
  }

  /** The deterministic contact-line fixture, derived per customer row
    * (kept in the modulo range so lpad never truncates — identical
    * string algebra in both engines).
    */
  private def contactLine: Column = concat(
    lit("reach "), col("c_name"),
    lit(" at user"), col("c_custkey").cast("string"),
    lit("@mail"), col("c_nationkey").cast("string"), lit(".example.com"),
    lit(" or 10."), (col("c_custkey") % 200).cast("string"),
    lit("."), col("c_nationkey").cast("string"), lit(".7 tel 555-"),
    lpad((col("c_custkey") % 10000).cast("string"), 4, "0"))

  def taPiiRedact(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables(s, dir).customer
      .select(Seq(col("c_custkey")) ++ redact(contactLine): _*)
      .orderBy("c_custkey")

  private[graft] def oracleSql: String = {
    // single-line on purpose: a multi-line fragment whose continuation
    // lines start with the `||` concat operator would lose a pipe to
    // the OUTER query's stripMargin
    val line = "'reach ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)" +
      " || '@mail' || CAST(c_nationkey AS VARCHAR) || '.example.com or 10.'" +
      " || CAST(c_custkey % 200 AS VARCHAR) || '.' || CAST(c_nationkey AS VARCHAR)" +
      " || '.7 tel 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')"
    s"""WITH base AS (
       |  SELECT c_custkey, $line AS line FROM customer),
       |s1 AS (SELECT c_custkey, line,
       |  regexp_replace(line, '$EmailRe', '[EMAIL]', 'g') AS t1 FROM base),
       |s2 AS (SELECT *, regexp_replace(t1, '$Ipv4Re', '[IP]', 'g') AS t2 FROM s1)
       |SELECT c_custkey,
       |  regexp_replace(t2, '$PhoneRe', '[PHONE]', 'g') AS masked,
       |  CAST(len(regexp_extract_all(line, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t1, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(t2, '$PhoneRe')) AS BIGINT) AS n_phones
       |FROM s2 ORDER BY c_custkey""".stripMargin
  }
}
