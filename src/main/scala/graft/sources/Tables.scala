package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet under `dir`. At 100 TB these would be
  * partitioned/bucketed datasets; the loaders keep the access pattern
  * declarative (`spark.read.parquet`) so Catalyst pushes filters and
  * prunes columns into the scan regardless of physical layout.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** See [[Tables.normalizeEventTs]] — `ts` lands as the session
    * TIMESTAMP at microsecond values whichever physical type the
    * generator wrote.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeEventTs(t("events"))
  }
}

object Tables {
  /** `events.ts` has shipped in two physical forms across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects outright, so it is read as an epoch-nanos long
    * under `spark.sql.legacy.parquet.nanosAsLong` and truncated to
    * microseconds (integral `div`, NOT `/`: float division of a
    * ~1.7e18 long loses precision beyond double's 53-bit mantissa) —
    * and plain microsecond TIMESTAMP_NTZ. Both normalize to the
    * session TIMESTAMP carrying identical microsecond values (the
    * session time zone is pinned UTC everywhere, so the NTZ→LTZ cast
    * is value-preserving), which is exactly the column DuckDB's
    * microsecond TIMESTAMP surfaces on the oracle side — so every
    * consumer sees one type and the oracle SQL is generation-agnostic.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
}
