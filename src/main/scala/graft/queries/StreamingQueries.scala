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

  /** The STATEFUL path (flatMapGroupsWithState event-time sessionization)
    * under the oracle — the one streaming component st_word_count /
    * st_hourly (plain stateful aggregations) don't reach. Unlike those
    * twins this cannot reuse the batch oracle verbatim: event-time
    * timeout semantics mean each user's FINAL session stays open unless
    * the terminal watermark (= max event time, lateness 0) passes its
    * last_event + gap, so the oracle replicates exactly that — sessions
    * closed by a gap-break are always emitted; final sessions only when
    * (end_us + gap) ms < max_ts ms (Spark fires event-time timeouts on
    * strict watermark excess, in milliseconds).
    */
  def stSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    // [e] glob: single-file table, same reason as stWordCount
    val ev = s.readStream.schema(schema).parquet(s"$dir/[e]vents.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("user_id"), col("ts")).as[graft.streaming.UserEvent]
    val q = EventStream.sessionize(s, ev, gapMinutes = 30).toDF()
      .writeStream.format("memory").queryName("st_sessionize_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    s.table("st_sessionize_sink")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .orderBy("user_id")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_word_count" -> (stWordCount _),
    "st_hourly" -> (stHourly _),
    "st_sessionize" -> (stSessionize _),
  )

  // st_word_count / st_hourly: the batch twins' oracles verbatim —
  // equivalence is the whole point. st_sessionize: its own oracle (the
  // streaming result legitimately differs from batch q16 by the
  // still-open final sessions; see the method Scaladoc).
  val oracles: Map[String, String] = Map(
    "st_word_count" -> WordCountQueries.oracles("wc_word_count"),
    "st_hourly" -> Relational.oracles("q15_events_hourly"),
    "st_sessionize" ->
      """WITH l AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), b AS (
        |  SELECT user_id, us,
        |    CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM l
        |), sg AS (
        |  SELECT user_id, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b
        |), sess AS (
        |  SELECT user_id, sid, max(us) AS end_us, count(*) AS n
        |  FROM sg GROUP BY user_id, sid
        |), sess2 AS (
        |  SELECT user_id, sid, end_us, n,
        |    max(sid) OVER (PARTITION BY user_id) AS max_sid
        |  FROM sess
        |), mx AS (SELECT max(epoch_us(ts)) AS mxus FROM events)
        |SELECT user_id, count(*) AS n_sessions, CAST(sum(n) AS BIGINT) AS n_events
        |FROM sess2, mx
        |WHERE sid < max_sid OR (end_us + 1800000000) // 1000 < mxus // 1000
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
  )
}
