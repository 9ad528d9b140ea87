package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.WordCount
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator (one entry per line of
  * SURVEY §2's inventory plus the scale extensions); `oracleSql` carries
  * the DuckDB-equivalent SQL for the driver's hash-compare at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's one capability — word count — over the documents
    * table: scan → tokenize → normalize → partial agg → shuffle → final
    * agg, in a single declarative plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    WordCount.count(docs.select(col("text").as("value")))
  }

  private val modules: Seq[QueryModule] = Seq(
    WordCountQueries, Relational, TextAnalysis, Sketches, Dedup, Similarity,
    Multimodal, StreamingQueries)

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}

/** A named group of oracle-checked queries. */
trait QueryModule {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
