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
  * Two harness shapes, both under the gate:
  *   - Complete → memory sink (`st_word_count`, `st_hourly`): the full
  *     aggregate is the state, collected to the driver — the simplest
  *     oracle harness (≤ distinct-keys rows).
  *   - The PRODUCTION shapes (`st_hourly_append`, `st_wc_update`):
  *     Append mode to a parquet FILE sink with the watermark actually
  *     evicting window state, and Update mode whose per-batch deltas a
  *     `foreachBatch` upserts to a parquet delta log — then the sink is
  *     READ BACK and reconciled against the batch oracle. State is
  *     watermark-bounded (append) / per-key (update); nothing aggregate-
  *     sized ever sits on the driver.
  */
object StreamingQueries extends QueryModule {

  /** Fresh local directory for a stream's sink/checkpoint — recreated
    * empty every run so re-runs never resume a stale checkpoint.
    */
  private def freshDir(name: String): String = {
    val base = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_stream", name)
    if (java.nio.file.Files.exists(base)) {
      val walk = java.nio.file.Files.walk(base)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally walk.close()
    }
    java.nio.file.Files.createDirectories(base)
    base.toString
  }

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

  /** Streaming twin of `q35_sliding_window`: overlapping event-time
    * windows (1 h / 15 min slide) run incrementally to completion —
    * batch≡stream equivalence for the multi-assignment window shape,
    * checked against the batch query's oracle verbatim.
    */
  def stSliding(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // [e] glob: single-file table, same reason as stWordCount
    val ev = s.readStream.schema(schema).parquet(s"$dir/[e]vents.parquet")
      // integral `div`, NOT `/` — see Tables.events
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    runToCompletion(s, EventStream.slidingCounts(ev), "st_sliding_sink")
      .select(date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n_events"))
      .orderBy("w_start", "event_type")
  }

  /** STREAM-STREAM inner join — the last streaming join shape
    * ([[stEnrich]] is stream-static): errors and clicks arrive as two
    * independent streams (two branches over the same file source) and
    * join on user within a ±5 min event-time band — the streaming twin
    * of `q29_range_join`, checked against its oracle verbatim. The
    * time-range condition is what lets Spark bound each side's join
    * state to the band plus the watermark delay; the raw matched pairs
    * go append-mode to a parquet sink and are aggregated on read-back
    * (same pattern as [[stHourlyAppend]] — no aggregate state stacked
    * on join state). As with [[stDedup]], the harness delay exceeds the
    * dataset's span so no first-arrival is ever late-dropped by a
    * file-ordering race (declared: state eviction idles here; the join
    * operator and its two-sided state store are what this pins).
    */
  def stJoin(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // [e] glob: single-file table, same reason as stWordCount
    def src(): DataFrame = s.readStream.schema(schema)
      .parquet(s"$dir/[e]vents.parquet")
      // integral `div`, NOT `/` — see Tables.events
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val clicks = src().where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "3650 days")
    val errors = src().where(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("e_ts"))
      .withWatermark("e_ts", "3650 days")
    val joined = errors.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("e_ts") - expr("INTERVAL 5 MINUTES") &&
        col("c_ts") <= col("e_ts") + expr("INTERVAL 5 MINUTES"))
    val out = freshDir("st_join/out")
    val chk = freshDir("st_join/chk")
    val q = joined.select("error_id", "user_id").writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(out)
      .groupBy("error_id", "user_id")
      .agg(count(lit(1)).as("n_nearby_clicks"))
      .orderBy("error_id")
  }

  /** The bounded-state PRODUCTION shape of st_hourly: Append mode to a
    * parquet FILE sink. A window row is written exactly once — when the
    * watermark (max event time − 30 min lateness) passes its end — and
    * its state is evicted at the same moment, so state never exceeds the
    * windows inside the lateness horizon and no aggregate ever sits on
    * the driver. The sink directory is then read back as the result.
    *
    * The oracle replays exactly what Append emits: every (hour,
    * event_type) group EXCEPT those the terminal watermark never passed
    * — window_end ms ≤ max_ts ms − 1 800 000 keeps a window open
    * (eviction fires when `end − 1 < watermark` in milliseconds; the
    * watermark advances after the data batch and the final no-data
    * micro-batch flushes everything it passed).
    */
  def stHourlyAppend(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // [e] glob: single-file table, same reason as stWordCount
    val ev = s.readStream.schema(schema).parquet(s"$dir/[e]vents.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val out = freshDir("st_hourly_append/out")
    val chk = freshDir("st_hourly_append/chk")
    val q = EventStream.hourlyCounts(ev).writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(out)
      .select(date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"),
        round(col("sum_value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")
  }

  /** The incremental-delta PRODUCTION shape of st_word_count: the corpus
    * split into 8 files streamed one per trigger (a genuinely
    * multi-batch run), Update mode emitting only the words whose counts
    * CHANGED each batch, and a `foreachBatch` appending those deltas —
    * stamped with the batch id — to a parquet delta log (the upsert
    * pattern for sinks without native update). The log is read back and
    * reconciled: each word's latest delta is its final count, which must
    * hash-equal the batch word count. Per-trigger output is
    * O(changed keys), driver holds nothing.
    */
  def stWcUpdate(s: SparkSession, dir: String): DataFrame = {
    val srcDir = freshDir("st_wc_update/src")
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("text").as("value"))
      .repartition(8)
      .write.mode("overwrite").parquet(srcDir)
    val deltaDir = freshDir("st_wc_update/delta")
    val chk = freshDir("st_wc_update/chk")
    val lines = s.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "value", org.apache.spark.sql.types.StringType))))
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = EventStream.wordCount(lines).writeStream
      .outputMode("update")
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(deltaDir)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("word").orderBy(col("batch_id").desc)
    s.read.parquet(deltaDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("word"), col("count").as("cnt"))
      .orderBy("word")
  }

  /** Stream-static ENRICHMENT join — the remaining streaming join shape
    * ([[stHourlyAppend]] covers windowed state, [[stSessionize]] custom
    * state): each arriving event is joined to the static customer
    * dimension (broadcast — the dim never streams, so each micro-batch
    * pays a map-side hash probe, no stream-stream state), then
    * aggregated per market segment. Checked against the batch join's
    * oracle (same SQL as the skew-join twin q27): enrichment must be
    * result-invisible to how the rows arrived.
    */
  def stEnrich(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // [e] glob: single-file table, same reason as stWordCount
    val ev = s.readStream.schema(schema).parquet(s"$dir/[e]vents.parquet")
      .select(col("user_id"), col("value"))
    val cust = broadcast(s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment")))
    val agg = ev.join(cust, "user_id")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
    runToCompletion(s, agg, "st_enrich_sink")
      .orderBy("c_mktsegment")
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

  /** Streaming EXACT DEDUP — `dropDuplicatesWithinWatermark` on the
    * event key over a deliberately DOUBLED source: the events table is
    * staged twice across 8 files, one file per trigger, so every event
    * arrives a second time in a later micro-batch and the dedup state
    * must swallow it. The deduped append sink is read back and
    * aggregated; the oracle is the batch aggregate over the ORIGINAL
    * (single-copy) table — if even one duplicate leaks through, every
    * count doubles and the hash fails.
    *
    * State is one (key, expiry) entry per key inside the watermark
    * horizon — at 100 TB/day the delay bounds state to the horizon's
    * key-arrival volume, the reason this beats an unbounded
    * `dropDuplicates`. The harness sets the delay longer than the
    * dataset's time span so no first-arrival can ever be declared late
    * by a file-ordering race (declared determinism compromise: eviction
    * idles here; the operator, its state store, and the append path are
    * what this query pins).
    */
  def stDedup(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = freshDir("st_dedup/src")
    val ev = s.read.parquet(s"$dir/events.parquet")
      // integral `div`, NOT `/` — see Tables.events
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    ev.repartition(4).write.mode("append").parquet(srcDir)
    ev.repartition(4).write.mode("append").parquet(srcDir)
    val chk = freshDir("st_dedup/chk")
    val out = freshDir("st_dedup/out")
    val schema = s.read.parquet(srcDir).schema
    val deduped = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
      .withWatermark("ts", "3650 days")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(out)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .orderBy("event_type")
  }

  /** NATIVE streaming session windows — the q38 twin on the streaming
    * engine: `session_window(ts, gap)` inside a watermarked streaming
    * aggregate, Append mode to a parquet file sink. The session-window
    * state store MERGES overlapping candidate sessions as events
    * arrive, and the watermark (delay 0 → terminal watermark = max
    * event time) both closes sessions for emission and evicts their
    * state — the bounded-state production shape for sessionization
    * without custom state code ([[stSessionize]] pins the
    * flatMapGroupsWithState alternative).
    *
    * The oracle replays q38's exact boundary semantics (break when
    * next − prev ≥ gap) and then keeps only the sessions Append
    * actually emits: those whose end (last event + gap, in ms) the
    * terminal watermark passed — each user's still-open final session
    * stays in state, exactly like st_sessionize's oracle.
    */
  def stSessionWindow(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    // [e] glob: single-file table, same reason as stWordCount
    val ev = s.readStream.schema(schema).parquet(s"$dir/[e]vents.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "0 seconds")
    val agg = ev
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val out = freshDir("st_session_window/out")
    val chk = freshDir("st_session_window/chk")
    val q = agg.writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.read.parquet(out)
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
        col("n_events"))
      .orderBy("user_id", "s_start")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_session_window" -> (stSessionWindow _),
    "st_dedup" -> (stDedup _),
    "st_word_count" -> (stWordCount _),
    "st_hourly" -> (stHourly _),
    "st_sliding" -> (stSliding _),
    "st_join" -> (stJoin _),
    "st_hourly_append" -> (stHourlyAppend _),
    "st_wc_update" -> (stWcUpdate _),
    "st_enrich" -> (stEnrich _),
    "st_sessionize" -> (stSessionize _),
  )

  // st_word_count / st_hourly: the batch twins' oracles verbatim —
  // equivalence is the whole point. st_sessionize: its own oracle (the
  // streaming result legitimately differs from batch q16 by the
  // still-open final sessions; see the method Scaladoc).
  val oracles: Map[String, String] = Map(
    // the batch aggregate over the SINGLE-copy table: any duplicate
    // leaking past the dedup doubles a count and fails the hash
    "st_dedup" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "st_word_count" -> WordCountQueries.oracles("wc_word_count"),
    "st_hourly" -> Relational.oracles("q15_events_hourly"),
    // the batch sliding-window oracle verbatim: batch≡stream for the
    // overlapping-window shape
    "st_sliding" -> Relational.oracles("q35_sliding_window"),
    // the batch range-join oracle verbatim: the stream-stream banded
    // join must reproduce the batch pairs exactly
    "st_join" -> Relational.oracles("q29_range_join"),
    // the reconciled delta log must equal the batch word count exactly
    "st_wc_update" -> WordCountQueries.oracles("wc_word_count"),
    // the batch join's oracle verbatim (q27's plain join): streaming
    // enrichment must be result-invisible
    "st_enrich" -> Relational.oracles("q27_skew_join"),
    // q15 restricted to the windows Append actually emits: those whose
    // end the terminal watermark (max ts − 30 min, in ms) passed
    "st_hourly_append" ->
      """WITH wm AS (
        |  SELECT epoch_us(max(ts)) // 1000 - 1800000 AS wm_ms FROM events
        |), h AS (
        |  SELECT date_trunc('hour', ts) AS hour_ts, event_type,
        |    count(*) AS n_events, round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY hour_ts, event_type
        |)
        |SELECT strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  n_events, sum_value
        |FROM h, wm
        |WHERE epoch_us(hour_ts) // 1000 + 3600000 - 1 < wm_ms
        |ORDER BY hour, event_type""".stripMargin,
    // q38's session derivation (break on next − prev ≥ gap, the native
    // merge boundary), restricted to sessions whose end (last + gap,
    // ms) the terminal watermark (max ts, ms) passed — what Append emits
    "st_session_window" ->
      """WITH l AS (
        |  SELECT user_id, ts, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events
        |), b AS (
        |  SELECT user_id, ts, us,
        |    CASE WHEN prev IS NULL OR us - prev >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM l
        |), sg AS (
        |  SELECT user_id, ts, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b
        |), sess AS (
        |  SELECT user_id, min(ts) AS s_start, max(us) AS last_us, count(*) AS n_events
        |  FROM sg GROUP BY user_id, sid
        |), mx AS (SELECT max(epoch_us(ts)) AS mxus FROM events)
        |SELECT user_id, strftime(s_start, '%Y-%m-%d %H:%M:%S') AS s_start, n_events
        |FROM sess, mx
        |WHERE (last_us + 1800000000) // 1000 < mxus // 1000
        |ORDER BY user_id, s_start""".stripMargin,
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
