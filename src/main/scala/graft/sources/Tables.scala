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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read nanos as long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to
    * microseconds — exactly what DuckDB does when it surfaces the column
    * as its microsecond TIMESTAMP, so both engines see identical values.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    // integral `div`, NOT `/`: float division of an epoch-nanos long
    // (~1.7e18) loses precision beyond double's 53-bit mantissa.
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
