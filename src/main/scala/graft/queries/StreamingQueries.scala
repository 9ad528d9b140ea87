package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.EventStream
import graft.QueryModule

/** Batch≡stream equivalence under the driver's DuckDB oracle: each query
  * runs a [[graft.streaming.EventStream]] pipeline TO COMPLETION over the
  * same parquet its batch twin reads, and is checked against the batch
  * twin's oracle SQL (`st_word_count` ↔ `wc_word_count`, `st_hourly` ↔
  * `q15_events_hourly`). This pins the incremental engine's final state
  * to the batch semantics — the one component VERDICT r2 listed as
  * tested-but-unoracled.
  *
  * Harness shape: file-stream source → stateful aggregation → Complete
  * output into a memory sink, then the sink table (a batch DataFrame) is
  * returned for the driver's hash-compare. The memory sink collects the
  * AGGREGATED result (≤ distinct-keys rows) to the driver — an oracle
  * harness, not the scale path; production writes Update/Append deltas to
  * a real sink (kafka/parquet) with watermark-bounded state
  * (`EventStream` Scaladoc).
  */
object StreamingQueries extends QueryModule {

  /** Start `agg` in Complete mode into a memory sink, drain all available
    * input, stop, and return the sink table. Complete mode keeps the full
    * aggregate state, so the final table equals the batch aggregate — the
    * watermark still runs but evicts nothing the comparison needs.
    */
  private def runToCompletion(s: SparkSession, agg: DataFrame, sink: String): DataFrame = {
    val q = agg.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink)
  }

  /** Streaming twin of `wc_word_count`: the reference pipeline
    * (tokenize → normalize → filter → count) run incrementally over the
    * documents parquet as a file-stream source.
    */
  def stWordCount(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/documents.parquet"
    // file-stream sources require an explicit schema; take it from the
    // batch reader's footer inference so the two paths can never skew.
    // The char-class glob below ([d]) is because the testdata "table" is
    // a single FILE: FileStreamSource requires a directory or a glob,
    // and a glob makes it use the parent dir as basePath.
    val schema = s.read.parquet(path).schema
    val lines = s.readStream.schema(schema).parquet(s"$dir/[d]ocuments.parquet")
      .select(col("text").as("value"))
    runToCompletion(s, EventStream.wordCount(lines).withColumnRenamed("count", "cnt"),
      "st_word_count_sink")
      .orderBy("word")
  }

  /** Streaming twin of `q15_events_hourly`: watermarked event-time
    * tumbling windows over the events parquet (same TIMESTAMP(NANOS) →
    * micros handling as [[graft.sources.Tables.events]]), formatted to
    * the batch query's output columns after the run.
    */
  def stHourly(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    // [e] glob: single-file table, same reason as stWordCount
    val ev = s.readStream.schema(schema).parquet(s"$dir/[e]vents.parquet")
      // integral `div`, NOT `/` — see Tables.events
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    runToCompletion(s, EventStream.hourlyCounts(ev), "st_hourly_sink")
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"),
        round(col("sum_value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_word_count" -> (stWordCount _),
    "st_hourly" -> (stHourly _),
  )

  // The batch twins' oracles verbatim: equivalence is the whole point.
  val oracles: Map[String, String] = Map(
    "st_word_count" -> WordCountQueries.oracles("wc_word_count"),
    "st_hourly" -> Relational.oracles("q15_events_hourly"),
  )
}
