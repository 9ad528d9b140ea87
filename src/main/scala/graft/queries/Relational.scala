package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryModule
import graft.core.{Bucketing, Skew}
import graft.sources.Tables

/** Relational operator coverage over the TPC-H-ish testdata.
  *
  * The reference has exactly one relational operator (a grouped count —
  * SURVEY §2.5) and §2.8-2.13 enumerate the categories it lacks. This
  * module provides those categories as first-class, oracle-checked
  * queries: filter/project with pushdown, inner/semi/anti/outer joins,
  * window functions (ranking + running frames), sort/limit/top-k,
  * set operations, rollup/grouping sets, distinct aggregation, scalar
  * subqueries, and event-time bucketing/sessionization.
  *
  * Determinism conventions (the driver hash-compares against DuckDB):
  *   - every query ends in a TOTAL order (unique key in the sort);
  *   - money sums are rounded to 2 decimals, or summed exactly as cents
  *     (`round(x*100)::bigint`) where order-of-addition must not matter
  *     (running windows);
  *   - DuckDB `sum(int)` returns HUGEINT and `year()` BIGINT → the
  *     oracle SQL casts to match Spark's types;
  *   - timestamps are emitted as formatted strings (UTC session).
  *
  * Scale notes are on each query. General posture: filters reach the
  * parquet scan (PushedFilters), dimension joins are `broadcast()`,
  * fact-fact joins shuffle on join keys once, aggregates are
  * partial+final (map-side combined) automatically.
  */
object Relational extends QueryModule {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Per-run UNIQUE scratch root for the layout queries (q30/q34/q36/
    * q42/q43): their oracles never read these paths (they replay over
    * the original tables), so uniqueness is free — and two concurrent
    * harness runs on one host must never overwrite each other's staged
    * layouts or cross-read a partially written one.
    */
  private lazy val scratchRoot: String =
    graft.core.TempDirs.create("graft_scratch_")

  private def scratchDir(name: String): String =
    java.nio.file.Paths.get(scratchRoot, name).toString

  /** TPC-H Q1-style pricing summary. One scan + one shuffle on the two
    * low-cardinality group keys; partial aggregation collapses 60k rows
    * (or 100 TB of rows) to #groups × #map-tasks before the exchange.
    */
  def q01AggPricing(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Filter + projection: both must reach the parquet scan. `.explain`
    * shows PushedFilters on l_shipdate/l_discount/l_quantity and a
    * 4-column ReadSchema — at 100 TB this is the difference between
    * scanning 4 columns of a date-pruned subset and the whole table.
    */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .where(col("l_shipdate") >= lit("2001-06-01").cast("timestamp") &&
        col("l_discount") > 0.08 && col("l_quantity") < 5)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** TPC-H Q3-style: 3-way join + agg + top-k. Customer (small) is
    * broadcast; orders⋈lineitem shuffles on the shared key o_orderkey.
    * Top-10 is TakeOrderedAndProject — no global sort of the aggregate.
    */
  def q03JoinTopK(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val c = t.customer.where(col("c_mktsegment") === "BUILDING")
    t.lineitem
      .join(t.orders.where(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .where(col("l_shipdate") > lit("1998-03-01").cast("timestamp"))
      .groupBy("o_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Semi join (EXISTS): orders having a heavy lineitem. Planned as a
    * LeftSemi shuffled hash join on l_orderkey; only the key column of
    * the right side is shuffled, and each order is emitted once without
    * materializing the match multiplicity.
    */
  def q04SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.orders
      .join(t.lineitem.where(col("l_quantity") >= 49), col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  /** Anti join (NOT EXISTS): customers with no orders. */
  def q05AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Outer join + dimension chain: region ⋈ nation ⟕ customer, customer
    * count per nation (zero-customer nations kept). Both dims broadcast.
    */
  def q06OuterAgg(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    broadcast(t.region)
      .join(broadcast(t.nation), col("r_regionkey") === col("n_regionkey"))
      .join(t.customer, col("n_nationkey") === col("c_nationkey"), "left_outer")
      .groupBy("r_name", "n_name")
      .agg(count(col("c_custkey")).as("n_customers"))
      .orderBy("r_name", "n_name")
  }

  /** Ranking window: top-2 orders per customer by price. One shuffle on
    * the partition key; at scale rank-truncation (WindowGroupLimit)
    * pushes the top-k below the sort so each partition keeps 2 rows.
    */
  def q07WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir).orders
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** Running-total window (ROWS frame). Sums exact cents so the result
    * is order-of-addition independent — a float running sum would differ
    * bitwise between engines (DuckDB uses segment trees).
    */
  def q08WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir).orders
      .where(col("o_custkey") < 100)
      .withColumn("running_cents", sum(cents(col("o_totalprice"))).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("running_cents"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Set op INTERSECT: nations that have both customers and suppliers. */
  def q09Intersect(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val cn = t.nation.join(t.customer, col("n_nationkey") === col("c_nationkey")).select("n_name")
    val sn = t.nation.join(t.supplier, col("n_nationkey") === col("s_nationkey")).select("n_name")
    cn.intersect(sn).orderBy("n_name")
  }

  /** Set op EXCEPT: nations with customers but no suppliers. */
  def q10Except(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val cn = t.nation.join(t.customer, col("n_nationkey") === col("c_nationkey")).select("n_name")
    val sn = t.nation.join(t.supplier, col("n_nationkey") === col("s_nationkey")).select("n_name")
    cn.except(sn).orderBy("n_name")
  }

  /** ROLLUP (grouping sets): order counts by (year, priority), (year),
    * (). Single shuffle; Expand feeds one aggregate.
    */
  def q11Rollup(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .rollup(year(col("o_orderdate")).as("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("total_cents"))
      .orderBy(col("o_year").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Explicit GROUPING SETS — the multi-granularity aggregate shape
    * (detail, by-priority, grand total) that is NOT a rollup prefix
    * chain, so neither [[q11Rollup]] nor cube covers it. Plans as ONE
    * Expand + a single hash aggregate: each input row is replicated
    * once per set before the exchange, so at 100 TB this is one scan
    * and one shuffle where three separate aggregates unioned would be
    * three of each. `grouping_id()` disambiguates a genuine NULL key
    * from a rolled-up one (leftmost grouping column = MSB, matching
    * SQL-standard GROUPING()).
    */
  def q31GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
          Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("total_cents"))
      .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** FULL OUTER join — the remaining outer-join shape ([[q06OuterAgg]]
    * covers left outer): per-customer order counts from the early and
    * late halves of the date range, full-outer joined so customers
    * active in only one half surface with the other side null. Full
    * outer cannot build a one-sided hash table the usual way, so Spark
    * plans SortMergeJoin — both sides shuffle on the key once, which
    * is the honest minimum; at 100 TB the two aggregates have already
    * collapsed each side to one row per key, so the join input is
    * key-cardinality, not fact-cardinality.
    */
  def q45FullOuter(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir).orders
    val split = lit("1998-04-01").cast("timestamp")
    val early = o.where(col("o_orderdate") < split)
      .groupBy(col("o_custkey").as("ck1")).agg(count(lit(1)).as("n_early"))
    val late = o.where(col("o_orderdate") >= split)
      .groupBy(col("o_custkey").as("ck2")).agg(count(lit(1)).as("n_late"))
    early.join(late, col("ck1") === col("ck2"), "full_outer")
      .select(coalesce(col("ck1"), col("ck2")).as("custkey"),
        coalesce(col("n_early"), lit(0L)).as("n_early"),
        coalesce(col("n_late"), lit(0L)).as("n_late"))
      .orderBy("custkey")
  }

  /** Explicit CROSS JOIN — the deliberate cartesian, valid ONLY when
    * one side is tiny and the product is the point (here region ×
    * nation = 125 rows: a dimension grid). Spark requires the explicit
    * `crossJoin` call precisely so the accidental version can't
    * type-check its way into a plan; at 100 TB a cross join against
    * anything fact-sized is the canonical scale-killer (every other
    * query here plan-asserts its absence).
    */
  def q46CrossJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.region.select("r_name").crossJoin(t.nation.select("n_name"))
      .orderBy("r_name", "n_name")
  }

  /** LIMIT with OFFSET over a total order — deterministic pagination.
    * Spark plans GlobalLimit(offset+limit) over per-partition
    * TakeOrdered partials: each partition contributes at most
    * offset+limit rows, so the driver-side cost is bounded by the page
    * horizon, never table size. Deep pagination (huge offsets) is
    * still anti-scale — the skipped prefix is computed and discarded;
    * keyset pagination (WHERE key > last_seen ORDER BY key LIMIT n)
    * is the 100 TB shape.
    */
  def q47LimitOffset(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_cents"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
      .offset(40).limit(20)

  /** The keyset cursor [[q59KeysetPage]] resumes from: the (price, key)
    * of the last row the previous page returned. Literals, exactly as
    * a pagination client would send them back.
    */
  private[graft] val KeysetLastPrice = 100000.0
  private[graft] val KeysetLastKey = 0L

  /** KEYSET pagination — the deep-page shape [[q47LimitOffset]]'s
    * Scaladoc names as the 100 TB replacement for OFFSET: instead of
    * computing and discarding the skipped prefix, the client sends
    * back the last row's ordering key and the next page is
    * `WHERE (price, key) < cursor ORDER BY price DESC, key LIMIT n` —
    * cost is one pushed-filter scan + a TakeOrdered, independent of
    * how deep the page is. The row-value comparison is spelled as the
    * OR-form on the RAW column (price < last OR (price = last AND key >
    * last_key)) so it pushes to the parquet scan as a plain Or filter
    * (a predicate on round(price*100) would not) — PlanShapeSpec
    * asserts both the TakeOrderedAndProject and the pushed filter.
    * Cents rendering happens after the cut, per the repo float rule.
    */
  def q59KeysetPage(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .where(col("o_totalprice") < KeysetLastPrice ||
        (col("o_totalprice") === KeysetLastPrice &&
          col("o_orderkey") > KeysetLastKey))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"),
        cents(col("o_totalprice")).as("price_cents"))

  /** MAP-typed column surface — semi-structured props parsed ONCE into
    * a `map<string,bigint>` and then queried with map operators
    * (map_keys, element_at, map_contains_key) instead of re-running
    * string extraction per field. At 100 TB the parse-once pattern is
    * the difference between one JSON scan and one per field; the map
    * lives only inside the row (pure projection, no shuffle before the
    * output sort). Output flattens to scalars because map columns
    * don't hash-compare across engines.
    */
  def q50MapFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .select(col("event_id"),
        from_json(col("props"), lit("map<string,bigint>")).as("m"))
      .select(col("event_id"),
        size(map_keys(col("m"))).as("n_keys"),
        element_at(col("m"), "k").as("k_val"),
        map_contains_key(col("m"), "missing").as("has_missing"),
        array_join(sort_array(map_keys(col("m"))), ",").as("keys"))
      .orderBy("event_id")

  /** Gap-filled daily series — the time-series scaffold shape: a
    * generated calendar (sequence + explode between the observed
    * bounds) LEFT-joined to the daily aggregate so zero-order days
    * appear explicitly. The scaffold is ~rows-per-day regardless of
    * fact size — generated, never scanned — and the aggregate has
    * already collapsed the fact table to one row per day, so the join
    * is calendar-sized on both sides. At 100 TB the only real cost is
    * the daily aggregate's single exchange; gap-filling is free.
    */
  def q48GapFill(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir).orders
    val daily = o.groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val days = o.agg(
        min(date_trunc("day", col("o_orderdate"))).as("d0"),
        max(date_trunc("day", col("o_orderdate"))).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    days.join(daily, Seq("day"), "left_outer")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("day")
  }

  /** Value-RANGE window frame — the frame mode [[q08WindowRunning]]'s
    * running (UNBOUNDED..CURRENT) and q39's ROW-offset frames don't
    * cover: each row's frame is every peer whose price lies within
    * $1,000 BELOW its own (RANGE 100000 PRECEDING in cents). The
    * frame bound is data-dependent, so the window sorts on the frame
    * value itself; ties are whole-peer-group inclusive, making the
    * count deterministic without a tiebreak. Same single
    * partition-key exchange as every window — the frame mode changes
    * the in-partition scan, not the shuffle.
    */
  def q49RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("price_cents")).rangeBetween(-100000, 0)
    Tables(s, dir).lineitem
      .where(pmod(col("l_partkey"), lit(200)) === 0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        cents(col("l_extendedprice")).as("price_cents"))
      .withColumn("n_within_1k", count(lit(1)).over(w))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** CUBE over (returnflag, linestatus) — completes the grouping trio
    * with [[q11Rollup]] and [[q31GroupingSets]]: all 2ⁿ subset
    * aggregates from ONE scan + one Expand (×4 here) + one exchange.
    * Same `grouping_id()` disambiguation as q31. At 100 TB cube only
    * low-cardinality dims: the Expand multiplies the shuffle input by
    * 2ⁿ, so a 3-dim cube triples-plus the exchange — acceptable for
    * enum-like keys, ruinous for high-cardinality ones (use targeted
    * grouping sets instead).
    */
  def q44Cube(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_items"),
        sum(cents(col("l_extendedprice"))).as("price_cents"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Navigation + distribution window functions — the surface
    * [[q07WindowRank]] (ranking) and [[q08WindowRunning]] (running
    * frames) leave uncovered: lag/lead (adjacent-row navigation),
    * first_value/nth_value (frame navigation), percent_rank/cume_dist
    * (relative distribution). One partition pass per window spec: the
    * time-ordered spec `w` and the price-ordered spec `wp` each sort
    * the customer's rows once; both share the single
    * Exchange(o_custkey) since the partition key matches — at 100 TB
    * the cost is one shuffle plus two in-partition sorts, and the
    * per-customer row counts (not table size) bound the sort buffers.
    * Unique tie-break (o_orderkey) in both ORDER BYs keeps every
    * navigation value engine-deterministic.
    */
  def q39WindowFuncs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wp = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables(s, dir).orders
      .where(pmod(col("o_custkey"), lit(50)) === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("price_cents"),
        cents(lag("o_totalprice", 1).over(w)).as("prev_cents"),
        cents(lead("o_totalprice", 1).over(w)).as("next_cents"),
        date_format(first(col("o_orderdate")).over(w), "yyyy-MM-dd")
          .as("first_date"),
        cents(nth_value(col("o_totalprice"), 2).over(w)).as("second_cents"),
        round(percent_rank().over(wp), 6).as("pct_rank"),
        round(cume_dist().over(wp), 6).as("cume"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** INTERSECT ALL / EXCEPT ALL — multiset semantics the DISTINCT set
    * ops ([[q09Intersect]]/[[q10Except]]) can't express: multiplicity
    * survives (a custkey with 3 urgent and 2 high orders intersects
    * with count 2, excepts with count 1). Spark plans both as a
    * count-and-replicate aggregate — one exchange on the compared
    * columns, no join blow-up — then the per-key recount collapses the
    * replicated rows again. Scale shape: two scans of the same table
    * with disjoint pushed filters + two key-hashed exchanges.
    */
  def q40SetopsAll(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir).orders
    def keys(p: String) =
      o.where(col("o_orderpriority") === p).select("o_custkey")
    val urgent = keys("1-URGENT")
    val high = keys("2-HIGH")
    val both = urgent.intersectAll(high).groupBy("o_custkey")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    val only = urgent.exceptAll(high).groupBy("o_custkey")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    both.unionByName(only).orderBy("op", "o_custkey")
  }

  /** Exact COUNT(DISTINCT) per group — plans as a two-phase distinct
    * aggregate (Expand + two exchanges). At 100 TB prefer
    * approx_count_distinct (HLL) — see TextAnalysis for the approx path.
    */
  def q12CountDistinct(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** Conditional aggregation (CASE inside SUM) after a fact-fact join. */
  def q13CaseAgg(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
        sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L)).as("n_kept"))
      .orderBy("o_orderpriority")
  }

  /** Scalar subquery: customers above global average balance. The
    * average is a 1-row broadcast, not a cross join.
    */
  def q14ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val avgBal = t.customer.agg(avg("c_acctbal").as("a"))
    t.customer
      .join(broadcast(avgBal))
      .where(col("c_acctbal") > col("a") * 1.5)
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Event-time bucketing: hourly tumbling counts per event type — the
    * batch shape of the streaming windowed aggregation
    * (graft.streaming.EventStream runs the same plan incrementally).
    */
  def q15EventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .orderBy("hour", "event_type")

  /** Sessionization via gap detection: a session break is a >30 min gap
    * per user. Integer microsecond arithmetic → engine-exact. One
    * shuffle on user_id; at scale this is the standard lag+cumsum
    * sessionizer (no state store needed in batch).
    */
  def q16Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables(s, dir).events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("brk",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id")
      .agg(sum("brk").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Native `session_window` — Spark's built-in merging session
    * aggregate, vs [[q16Sessionize]]'s composed lag/sum form. One
    * deliberate boundary difference, replayed by the oracle: the
    * built-in MERGES while `next − prev < gap` (a gap of exactly
    * 30 min breaks the session), whereas q16's composed form breaks
    * only on `> gap` — the off-by-an-instant that makes pinning both
    * forms worthwhile. Plans as one user-keyed exchange + sort +
    * session-merge aggregate; emitted per session (start = first event
    * time) rather than per user.
    */
  def q38SessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("s_start"),
        col("n_events"))
      .orderBy("user_id", "s_start")

  /** Global top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject —
    * per-partition heaps, no full sort, no single-node shuffle.
    */
  def q17TopKGlobal(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  /** TPC-H Q14-flavored: promo revenue share by brand. part is a
    * dimension → broadcast; lineitem shuffles once for the group-by.
    */
  def q18PartPromo(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        round(sum(when(col("p_type").startsWith("PROMO"),
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)), 2)
          .as("promo_revenue"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("total_revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** NTILE window: orders quartiled by price within each priority.
    * Deterministic because the window order is total (price, key).
    */
  def q19Ntile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(s, dir).orders
      .where(col("o_custkey") < 200)
      .withColumn("quartile", ntile(4).over(w))
      .select("o_orderpriority", "quartile", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "quartile", "o_orderkey")
  }

  /** String predicates reaching the scan (LIKE prefix → StartsWith
    * pushed to parquet) + regexp extraction + agg.
    */
  def q20StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).part
      .where(col("p_type").like("SMALL%") && col("p_name").rlike("[aeiou]{2}"))
      .select(col("p_brand"),
        upper(substring(col("p_type"), 1, 5)).as("type_prefix"),
        length(col("p_name")).as("name_len"))
      .groupBy("p_brand", "type_prefix")
      .agg(count(lit(1)).as("n_parts"), sum(col("name_len").cast("long")).as("sum_name_len"))
      .orderBy("p_brand", "type_prefix")

  /** UNION ALL + dedup-by-priority: customers and suppliers as one
    * "party" dimension (the multi-source ingestion shape).
    */
  def q21UnionAll(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val c = t.customer.select(col("c_custkey").as("party_key"),
      lit("customer").as("party_type"), col("c_acctbal").as("acctbal"))
    val sup = t.supplier.select(col("s_suppkey").as("party_key"),
      lit("supplier").as("party_type"), col("s_acctbal").as("acctbal"))
    c.unionAll(sup)
      .groupBy("party_type")
      .agg(count(lit(1)).as("n_parties"),
        round(sum("acctbal"), 2).as("sum_acctbal"))
      .orderBy("party_type")
  }

  /** PIVOT: order counts by year × priority (wide shape). Spark plans
    * pivot as a single groupBy with one conditional aggregate per pivot
    * value — exactly one shuffle on the row key; the oracle replays it
    * with explicit FILTER aggregates.
    */
  def q22Pivot(s: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables(s, dir).orders
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(prios.zipWithIndex.map { case (p, i) => p -> s"prio_$i" }.toMap)
      .orderBy("o_year")
  }

  /** Correlated subquery (TPC-H Q17 shape) through the engine's SQL
    * surface: lineitems under 20% of their part's average quantity.
    * Catalyst decorrelates the per-part scalar subquery into an
    * aggregate + join — no per-row re-execution; the same plan a
    * hand-written window/join rewrite would give.
    */
  def q23Correlated(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem.createOrReplaceTempView("lineitem")
    t.part.createOrReplaceTempView("part")
    s.sql(
      """SELECT p_brand,
        |  CAST(count(*) AS BIGINT) AS n_small,
        |  round(sum(l_extendedprice), 2) AS small_revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin)
  }

  /** Date/time functions: shipping-delay stats per order year —
    * datediff + year/quarter extraction, integer-exact.
    */
  def q24DateFuncs(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(
        year(col("o_orderdate")).as("o_year"),
        quarter(col("o_orderdate")).as("o_quarter"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).as("delay_days"))
      .groupBy("o_year", "o_quarter")
      .agg(count(lit(1)).as("n_items"),
        round(avg("delay_days"), 4).as("avg_delay"),
        max("delay_days").as("max_delay"))
      .orderBy("o_year", "o_quarter")
  }

  /** Semi-structured: parse the JSON `props` column with an explicit
    * schema (from_json — codegen'd Jackson parse, no inference pass) and
    * aggregate on the extracted field. At 100 TB the explicit schema is
    * what keeps this a single streaming scan: schema inference would
    * read the data twice, and string get_json_object per field would
    * re-parse the document per extraction.
    */
  def q25Json(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables(s, dir).events
      .select(col("event_type"), from_json(col("props"), schema).getField("k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k").cast("long")).as("sum_k"),
        max("k").as("max_k"))
      .orderBy("event_type")
  }

  /** NOT IN three-valued-logic pin, through the SQL TEXT entry point
    * (`spark.sql` over temp views — the one API surface the DataFrame
    * queries don't exercise). `NOT IN (subquery)` is NOT an anti-join:
    * one NULL in the subquery makes the predicate UNKNOWN for every
    * row, so the poisoned count is 0 while the clean count stays the
    * genuine non-member count. Spark plans the clean branch as
    * NullAwareAntiJoin; both engines must implement the same standard
    * semantics or this hash-mismatches. (Use NOT EXISTS / left_anti in
    * production — q05 — precisely because of this trap.)
    */
  def q37NotInNulls(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).customer.createOrReplaceTempView("g37_customer")
    Tables(s, dir).orders.createOrReplaceTempView("g37_orders")
    // the clean subquery is restricted to EVEN custkeys so its count is
    // provably non-zero (odd-keyed customers pass) — otherwise a broken
    // 3VL implementation returning the anti-join count would be
    // indistinguishable from the correct 0 on a corpus where every
    // customer has an order
    s.sql("""
      SELECT
        (SELECT count(*) FROM g37_customer
          WHERE c_custkey NOT IN
            (SELECT o_custkey FROM g37_orders WHERE o_custkey % 2 = 0)) AS n_clean,
        (SELECT count(*) FROM g37_customer
          WHERE c_custkey NOT IN
            (SELECT o_custkey FROM g37_orders WHERE o_custkey % 2 = 0
             UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_poisoned
    """)
  }

  /** LATERAL join — the correlated-subquery-in-FROM operator: for each
    * sampled customer, the subquery computes THEIR top-2 orders by
    * price (per-row ORDER BY + LIMIT, which a plain join cannot
    * express and [[q07WindowRank]] expresses only globally). Catalyst
    * decorrelates the lateral into a ranked window under the hood —
    * one customer-keyed exchange, no per-row re-execution — so the
    * 100 TB cost equals the window form while the query text stays
    * per-row declarative. Through the SQL text entry point like q37:
    * LATERAL has no DataFrame-API equivalent.
    */
  def q51Lateral(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).customer.createOrReplaceTempView("g51_customer")
    Tables(s, dir).orders.createOrReplaceTempView("g51_orders")
    s.sql("""
      SELECT c.c_custkey, o.o_orderkey, o.price_cents
      FROM g51_customer c, LATERAL (
        SELECT o_orderkey,
          CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM g51_orders WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      WHERE c.c_custkey % 100 = 0
      ORDER BY c.c_custkey, price_cents DESC, o_orderkey
    """)
  }

  /** Hive-style PARTITIONED layout + partition pruning — with
    * [[q30BucketedJoin]]'s bucketing, the other half of how a 100 TB
    * table is physically organized: events are written
    * `partitionBy(event_type)`, and a query filtering on the partition
    * column must touch ONLY that directory — the filter becomes a
    * PartitionFilter resolved against file listings, zero data bytes
    * read from the other partitions (PlanShapeSpec asserts the pruned
    * scan on this exact query). The oracle runs the same filter over
    * the unpartitioned table: layout must be result-invisible.
    * Partition columns must be low-cardinality (a high-cardinality
    * partitionBy shatters the table into millions of small files —
    * that is what bucketing is for).
    */
  def q36PartitionPruning(s: SparkSession, dir: String): DataFrame = {
    val base = scratchDir("q36_part")
    Tables(s, dir).events
      .select(col("ts"), col("user_id"), col("value"), col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(base)
    s.read.parquet(base)
      .where(col("event_type") === "click")
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("eday"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .orderBy("eday")
  }

  /** SLIDING event-time windows (1 h length, 15 min slide) — the
    * overlapping-window shape [[q15EventsHourly]]'s tumbling windows
    * don't cover: every event lands in exactly 4 windows. Spark plans
    * the multi-assignment as an Expand (×4 rows) BEFORE the one
    * aggregate exchange — the honest cost of overlap; at 100 TB
    * prefer the widest slide the product tolerates, since input
    * amplification is length/slide. Both engines' window grids align
    * (epoch and 2000-01-01 are both on the 15-minute lattice), so
    * starts are engine-exact.
    */
  def q35SlidingWindow(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n_events"))
      .orderBy("w_start", "event_type")

  /** JSONL round-trip — the interchange format LLM corpora actually
    * ship in. The documents table is written as JSON-lines and read
    * back with an EXPLICIT schema (inference would cost a second pass
    * over 100 TB), then fingerprinted; the oracle hashes the ORIGINAL
    * parquet text, so any escaping or encoding loss in the sink/source
    * pair fails the gate. JSONL reads split by line, so the format
    * parallelizes like parquet minus column pruning — fine for
    * ingest/egress, wrong for analytics, which is exactly the boundary
    * this query documents.
    */
  def q34JsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = scratchDir("q34_jsonl")
    Tables(s, dir).documents.select("doc_id", "lang", "text")
      .write.mode("overwrite").json(path)
    s.read.schema("doc_id BIGINT, lang STRING, text STRING").json(path)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** ORC round-trip — the third columnar format of the ingest/egress
    * surface (parquet everywhere, JSONL in [[q34JsonlRoundtrip]], CSV
    * in [[q43CsvRoundtrip]]). Lineitem is written ORC and read back,
    * then aggregated; the oracle runs the same aggregate over the
    * ORIGINAL parquet, so any type or value drift in the format pair
    * (timestamp micros, doubles, strings) fails the gate. ORC keeps
    * the parquet scan virtues — splittable stripes, column pruning,
    * predicate pushdown via stripe stats — so at 100 TB it
    * parallelizes identically; the choice between them is ecosystem,
    * not performance.
    */
  def q42OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val base = scratchDir("q42_orc")
    Tables(s, dir).lineitem
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate",
        "l_quantity", "l_extendedprice")
      .write.mode("overwrite").orc(base)
    s.read.orc(base)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 2).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("price_cents"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd HH:mm:ss")
          .as("last_ship"))
      .orderBy("l_returnflag")
  }

  /** CSV round-trip with EXPLICIT schema and microsecond timestamp
    * format — the lossy-by-default interchange format done losslessly.
    * The traps this query pins: (a) Spark's default CSV timestampFormat
    * drops sub-millisecond digits, so `ts` must round-trip through an
    * explicit `SSSSSS` pattern (events carry true microseconds);
    * (b) `props` holds JSON with embedded quotes — writer quoting +
    * escape must invert exactly (the summed char length would drift on
    * any mangling); (c) schema-on-read, never inference (a second full
    * pass at 100 TB). CSV splits by line like JSONL: fine for
    * interchange, no column pruning — analytics stays columnar.
    */
  def q43CsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val base = scratchDir("q43_csv")
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    Tables(s, dir).events
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite")
      .option("header", "true").option("timestampFormat", fmt).csv(base)
    s.read
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("header", "true").option("timestampFormat", fmt).csv(base)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"),
        date_format(max(col("ts")), fmt).as("last_ts"),
        sum(length(col("props"))).as("props_bytes"))
      .orderBy("event_type")
  }

  /** Avro round-trip through [[graft.sources.AvroIO]] — the row-major
    * interchange format of the ingest surface (parquet/ORC columnar,
    * JSONL/CSV textual, Avro the schema'd row format CDC streams and
    * Kafka topics actually ship). The events table — the hardest type
    * mix: microsecond timestamps, doubles, JSON-bearing strings —
    * writes as container files and reads back via the sync-marker-
    * splittable `AvroKeyInputFormat` path, then aggregates; the oracle
    * runs the same aggregate over the ORIGINAL parquet, so any value,
    * type, or precision drift in the format pair fails the gate.
    * `id_sum` pins the long column exactly; `last_ts` renders full
    * micros (Avro's `timestamp-micros` logical type makes the CSV
    * trap from [[q43CsvRoundtrip]] structural rather than
    * format-string-dependent).
    */
  def q63AvroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val base = scratchDir("q63_avro")
    val fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val src = Tables(s, dir).events
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    graft.sources.AvroIO.write(src, base)
    graft.sources.AvroIO.read(s, base, src.schema)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("event_id")).as("id_sum"),
        sum(cents(col("value"))).as("value_cents"),
        date_format(max(col("ts")), fmt).as("last_ts"),
        sum(length(col("props"))).as("props_bytes"))
      .orderBy("event_type")
  }

  /** Avro SCHEMA EVOLUTION on read — the row-format twin of
    * [[q58SchemaEvolution]]'s parquet mergeSchema: generation v1 (even
    * doc ids) was written BEFORE `lang` existed, generation v2 (odd
    * ids) carries it; one read of BOTH generations under the v2 READER
    * schema must surface every row, null-filling v1's missing column —
    * not via Spark-side schema union (parquet's mechanism) but via
    * AVRO'S OWN resolution rules: the reader schema's `lang` is a
    * union(null, string) with a null DEFAULT, which the per-file
    * datum reader applies when the writer schema lacks the field
    * ([[graft.sources.AvroIO.avroSchemaFor]]). The oracle re-derives
    * the answer from the source documents table, so a dropped v1 row,
    * a missing null-fill, or cross-generation value bleed hash-fails.
    */
  def q65AvroEvolution(s: SparkSession, dir: String): DataFrame = {
    val base = scratchDir("q65_avro_evo")
    val docs = Tables(s, dir).documents
    val v1 = docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), octet_length(col("text")).as("text_len"))
    val v2 = docs.where(col("doc_id") % 2 === 1)
      .select(col("doc_id"), octet_length(col("text")).as("text_len"),
        col("lang"))
    graft.sources.AvroIO.write(v1, s"$base/v1")
    graft.sources.AvroIO.write(v2, s"$base/v2")
    graft.sources.AvroIO.read(s, s"$base/{v1,v2}", v2.schema)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("text_len").cast("long")).as("bytes"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(asc_nulls_first("lang"))
  }

  /** Avro COMPLEX TYPES through [[graft.sources.AvroIO]] — the
    * engine's own embeddings table (`array<float>`) riding its own row
    * format, plus a string-keyed `map` and a nested `struct` built
    * alongside it, round-tripped and unpacked. Two independent pins on
    * the array payload: `norm` is computed BEFORE the write and
    * carried through the nested record, `norm_rt` is recomputed from
    * the ROUND-TRIPPED floats after the read — a single bit of drift
    * anywhere in the float array's Avro encoding makes `norm_rt`
    * diverge from the oracle's one derivation over the original
    * parquet. Map access (`element_at`) and struct field extraction
    * pin the composite plumbing; at 100 TB this is the CDC-stream
    * shape for feature payloads (embedding + typed metadata per row).
    */
  def q66AvroComplex(s: SparkSession, dir: String): DataFrame = {
    val base = scratchDir("q66_avro_complex")
    def nrm = round(sqrt(Similarity.dotBuiltin(col("embedding"),
      col("embedding"))), 6)
    val src = Tables(s, dir).embeddings
      .select(col("vec_id"), col("embedding"),
        map(lit("dim"), size(col("embedding")).cast("long"),
          lit("vid2"), col("vec_id") * 2).as("props"),
        struct(size(col("embedding")).as("n_dims"), nrm.as("norm"))
          .as("meta"))
    graft.sources.AvroIO.write(src, base)
    graft.sources.AvroIO.read(s, base, src.schema)
      .select(col("vec_id"),
        element_at(col("props"), "dim").as("dim"),
        element_at(col("props"), "vid2").as("vid2"),
        col("meta.n_dims").as("n_dims"),
        col("meta.norm").as("norm"),
        nrm.as("norm_rt"))
      .orderBy("vec_id")
  }

  /** UNPIVOT/melt — the inverse of [[q22Pivot]] and the feeder of every
    * long-format pipeline (metric stores, per-measure quality tables,
    * chart data): four lineitem measures melt into (measure, value)
    * rows via the native `unpivot` operator, then aggregate per
    * measure. The melt plans as an Expand — ×4 rows inside the scan
    * stage, ZERO shuffle until the 4-group aggregate, and partial
    * aggregation collapses the expansion map-side, so at 100 TB the
    * exchange carries #measures × #tasks rows, not 4n. Values are
    * summed as cents (order-independent exact) with min/max pinning
    * the range per measure.
    */
  def q64Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .select("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy("measure")
      .agg(count(lit(1)).as("n_rows"),
        sum(cents(col("value"))).as("value_cents"),
        round(min(col("value")), 2).as("min_value"),
        round(max(col("value")), 2).as("max_value"))
      .orderBy("measure")

  /** Higher-order array functions over the embedding column —
    * filter/size, aggregate (left fold), and zip_with, all evaluated
    * INSIDE the row with zero explode: the lambda runs in codegen over
    * the array buffer, so a 100 TB embedding table pays one scan and
    * no shuffle until the output sort. (The explode alternative
    * multiplies the row count by the 64-dim width before
    * re-aggregating — two orders of magnitude more exchange volume for
    * the same answer.) Float elements are cast to double INSIDE the
    * fold so both engines run the identical IEEE operation sequence;
    * left-fold order is part of the contract (both fold left-to-right,
    * making the rounded sums engine-exact).
    */
  def q41HigherOrder(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).embeddings.select(
      col("vec_id"),
      expr("size(filter(embedding, x -> x > cast(0 as float)))").as("n_pos"),
      round(expr("cast(array_max(embedding) as double)"), 6).as("max_val"),
      round(expr("aggregate(filter(embedding, x -> x > cast(0 as float)), " +
        "0d, (acc, x) -> acc + cast(x as double))"), 4).as("pos_mass"),
      round(expr("aggregate(zip_with(embedding, reverse(embedding), " +
        "(a, b) -> cast(a as double) * cast(b as double)), " +
        "0d, (acc, x) -> acc + x)"), 4).as("dot_rev"))
      .orderBy("vec_id")

  /** Exact percentiles per group — median and p95 of lineitem quantity,
    * plus the extremes. Spark's `percentile` and DuckDB's
    * `quantile_cont` share the SQL-standard definition (linear
    * interpolation at rank (n−1)·p), and l_quantity is integral, so the
    * interpolated values are engine-exact doubles before the 6-digit
    * round. Exact percentile sorts each group's values in the aggregate
    * buffer — fine for bounded groups like these 3 flags; for
    * high-cardinality groups at 100 TB use approx_percentile (KLL/GK
    * sketch, mergeable partials) and accept rank error instead of a
    * per-group sort.
    */
  def q33Percentiles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).lineitem
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        min(col("l_quantity")).as("q_min"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("q_median"),
        round(expr("percentile(l_quantity, 0.95)"), 6).as("q_p95"),
        max(col("l_quantity")).as("q_max"))
      .orderBy("l_returnflag")

  /** Payload masking — the PII-redaction shape over semi-structured
    * event payloads: every digit run in `props` is replaced by a
    * `<NUM>` token, with the per-row hit count kept for audit. Pure
    * per-row regex work, no shuffle except the output sort, and the
    * scan reads only (event_id, props) — at 100 TB this is the
    * column-pruned, codegen'd pass a compliance pipeline runs before
    * data leaves the quarantine zone. (The corpus carries PII-like
    * content only in numeric payload values; the same
    * `regexp_replace` chain extends to email/phone character classes.)
    */
  def q32MaskProps(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).events
      .select(col("event_id"),
        regexp_count(col("props"), lit("[0-9]+")).as("n_masked"),
        regexp_replace(col("props"), "[0-9]+", "<NUM>").as("masked"))
      .orderBy("event_id")

  /** Array aggregation: the distinct order-years per customer, sorted
    * (sort_array makes collect_set deterministic — raw collect order
    * varies with partitioning) and emitted as a ','-joined string so the
    * driver's pandas hash compare can factorize the column (a raw
    * array<int> column is unhashable there).
    */
  def q26ArrayAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .where(col("o_custkey") < 100)
      .groupBy("o_custkey")
      .agg(array_join(sort_array(collect_set(year(col("o_orderdate")))), ",")
          .as("order_years"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  /** Skew-mitigated fact⋈dim join under the oracle: every events key is
    * hot (150 distinct user_ids over the whole table — the worst case
    * where per-key volume grows linearly with data), and the join runs
    * through [[graft.core.Skew.saltedInnerJoin]] so the shuffle key is
    * (user_id, __salt): each hot key spreads over 8 reduce partitions.
    * Result is row-identical to the plain join (the oracle computes the
    * plain join), summed as exact cents so order-of-addition is moot.
    * ScaleUtilsSpec asserts `__salt` is in the exchange's partitioning.
    */
  def q27SkewJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val ev = t.events.select(col("user_id"), col("value"))
    val cust = t.customer.select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    Skew.saltedInnerJoin(ev, cust, "user_id", numSalts = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))
      .orderBy("c_mktsegment")
  }

  /** As-of join — an operator Spark has no native form of: each click
    * is matched to the user's most recent purchase at-or-before it.
    *
    * The naive formulation is a range self-join
    * (`c.user_id = p.user_id AND p.ts <= c.ts`, then keep the max) —
    * Spark plans that as a broadcast/shuffle join with a non-equi
    * residual whose matched set is O(clicks × prior-purchases) per
    * user: quadratic in a user's history, the classic range-join
    * blowup. The scalable form used here composes existing operators
    * (preference (a) from the build guidance): UNION the two event
    * roles, sort once per user by (time, role, id), and carry the last
    * purchase forward with `last(..., ignoreNulls)` over a running
    * window — ONE shuffle on user_id, linear scan per user, no pair
    * explosion. Skew bound: a hot user costs its own history length,
    * not its square.
    *
    * Tie semantics (replayed bit-for-bit by the oracle): a purchase AT
    * the click instant matches (role sorts purchases first at equal
    * ts); among same-instant purchases the greatest event_id wins
    * (event_id is the final sort key, `last` takes the latest).
    */
  def q28AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val tagged = Tables(s, dir).events
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("value"),
        when(col("event_type") === "purchase", 0).otherwise(1).as("kind"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("purchase_id",
        last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("p_us",
        last(when(col("kind") === 0, col("us")), ignoreNulls = true).over(w))
      .withColumn("p_val",
        last(when(col("kind") === 0, col("value")), ignoreNulls = true).over(w))
      .where(col("kind") === 1)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("purchase_id"),
        (col("us") - col("p_us")).as("us_since_purchase"),
        round(col("p_val"), 2).as("purchase_value"))
      .orderBy("click_id")
  }

  /** Range (band) join — the other interval operator Spark has no
    * native form of: for each error event, count the same user's clicks
    * within ±5 minutes.
    *
    * Spark plans the naive `|t_c − t_e| ≤ W` predicate as an equi-join
    * on user_id with a residual range filter — correct, but every
    * (error, click) pair of a user is generated before the filter: a
    * hot user's history squared. The scalable form buckets time into
    * W-length epochs and equi-joins on (user_id, epoch), each error
    * probing its own epoch ± 1 (any pair within W spans at most
    * adjacent epochs, so the 3 probes find EXACTLY the exact-join's
    * pairs — the filter then trims corner cases; same multi-probe
    * discipline as the IVF path). Join volume is Σ bucket×probe sizes,
    * not per-user history². The DuckDB oracle runs the plain range
    * join, pinning the bucketed rewrite to exact semantics.
    */
  def q29RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val W = 300000000L // 5 minutes in microseconds = the epoch length
    val ev = Tables(s, dir).events
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), expr(s"us div $W").as("epoch"), col("us").as("c_us"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"), col("us").as("e_us"),
        explode(array(expr(s"us div $W - 1"), expr(s"us div $W"),
          expr(s"us div $W + 1"))).as("epoch"))
    errors.join(clicks, Seq("user_id", "epoch"))
      .where(abs(col("c_us") - col("e_us")) <= W)
      .groupBy("error_id", "user_id")
      .agg(count(lit(1)).as("n_nearby_clicks"))
      .orderBy("error_id")
  }

  /** Bucketed co-located join — the pay-once-shuffle-never-again layout
    * for a fact table joined on the same key by every downstream query.
    * Orders and lineitem are written bucketed (×8) and sorted on their
    * orderkey via [[graft.core.Bucketing.writeBucketed]]; the join then
    * reads matching buckets directly — NO Exchange under the
    * SortMergeJoin (PlanShapeSpec asserts it on this exact query). At
    * 100 TB the bucketed write is one shuffle amortized over every
    * subsequent orderkey join; the only exchanges left here are the
    * post-join aggregate's. The DuckDB oracle runs the plain join —
    * bucketing must be invisible to the result.
    *
    * The bucket files land in a temp dir (external tables), not the
    * session warehouse — the gate session's default warehouse is the
    * process cwd, which may be the repo checkout.
    */
  def q30BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val base = scratchDir("q30_buckets")
    Bucketing.writeBucketed(t.orders.select("o_orderkey", "o_orderpriority"),
      "q30_orders_b", "o_orderkey", 8, Some(s"$base/orders"))
    Bucketing.writeBucketed(
      t.lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
      "q30_lineitem_b", "l_orderkey", 8, Some(s"$base/lineitem"))
    Bucketing.bucketedEquiJoin(s, "q30_orders_b", "q30_lineitem_b",
        "o_orderkey", "l_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("disc_price"))
      .orderBy("o_orderpriority")
  }

  /** Slowly-changing-dimension TYPE-2 history build — the warehouse
    * merge every dimension pipeline runs: collapse each customer's
    * order-status timeline into versioned validity intervals
    * [valid_from, valid_to), open-ended on the current version.
    *
    * Shape: change detection is a lag() over (custkey | orderdate,
    * orderkey), run-numbering a running sum over the same window, the
    * interval rollup a (custkey, version, status) aggregate, and
    * valid_to a lead() back over versions. Every stage is clustered by
    * custkey, and Spark recognizes the subset rule (hash(custkey)
    * satisfies clustering on (custkey, version, status)) — the WHOLE
    * query runs on ONE exchange (plan-asserted in PlanShapeSpec), the
    * shape that survives a 100 TB fact history: one shuffle of the
    * filtered orders, then in-partition windows and aggregates only.
    * The custkey filter is pushed to the parquet scan.
    */
  def q52Scd2(s: SparkSession, dir: String): DataFrame =
    scd2Core(s, dir)
      .select(col("custkey"), col("version"), col("status"),
        date_format(col("vf"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("vt"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        col("n_orders"),
        col("vt").isNull.as("is_current"))
      .orderBy("custkey", "version")

  /** The SCD2 history with RAW timestamp interval bounds —
    * [[q52Scd2]]'s body minus the display formatting, so
    * [[q56PitJoin]] can range-probe the intervals.
    */
  private[graft] def scd2Core(s: SparkSession, dir: String): DataFrame = {
    val byTime = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    val o = Tables(s, dir).orders
      .where(col("o_custkey") % 10 === 0)
      .select(col("o_custkey"), col("o_orderstatus"), col("o_orderdate"),
        col("o_orderkey"))
      .withColumn("prev", lag("o_orderstatus", 1).over(byTime))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("o_orderstatus"), 1)
          .otherwise(0))
      .withColumn("version", sum("chg").over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = o.groupBy(col("o_custkey"), col("version"),
        col("o_orderstatus").as("status"))
      .agg(min("o_orderdate").as("vf"), count(lit(1)).as("n_orders"))
    val byVersion = Window.partitionBy("o_custkey").orderBy("version")
    runs
      .withColumn("vt", lead("vf", 1).over(byVersion))
      .select(col("o_custkey").as("custkey"),
        col("version").cast("int").as("version"), col("status"),
        col("vf"), col("vt"), col("n_orders"))
  }

  /** POINT-IN-TIME join against the SCD2 history — the feature-store
    * training-data correctness operator: every fact row must see the
    * dimension version that was valid AT ITS OWN EVENT TIME, never a
    * later one (joining current-state attributes onto historical facts
    * is the classic label-leakage bug). Each filtered order probes the
    * [[scd2Core]] intervals: version valid at d ⇔ vf ≤ d < vt (open
    * end; NULL vt = current). Intervals tile each customer's timeline,
    * so every order matches EXACTLY one version — row preservation is
    * the PIT invariant (PlanShapeSpec asserts it).
    *
    * Scale shape: the probe is a custkey-EQUI join with the interval
    * test as a residual filter — dimension history per key is bounded
    * (versions, not facts), so this is the standard bounded-history
    * PIT plan: one key-partitioned shuffle of each side, no range-join
    * explosion, no window over facts. Output: the (dim-status-at-time,
    * order-own-status) audit matrix — off-diagonal mass would mean the
    * probe read the wrong version.
    */
  def q56PitJoin(s: SparkSession, dir: String): DataFrame = {
    val hist = scd2Core(s, dir)
      .select(col("custkey"), col("status").as("dim_status"),
        col("vf"), col("vt"))
    val o = Tables(s, dir).orders
      .where(col("o_custkey") % 10 === 0)
      .select(col("o_custkey").as("custkey"), col("o_orderdate"),
        col("o_orderstatus"))
    o.join(hist, Seq("custkey"))
      .where(col("vf") <= col("o_orderdate") &&
        (col("vt").isNull || col("o_orderdate") < col("vt")))
      .groupBy("dim_status", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("custkey")).as("n_custs"))
      .orderBy("dim_status", "o_orderstatus")
  }

  /** Column profiling — the data-quality scan a pipeline runs before
    * training ingest: per profiled column, row/null/distinct counts and
    * a typed min/max rendering, unpivoted to one row per column.
    *
    * Shape (round-12 optimization, guide §2.3/§2.4): one two-level
    * aggregation PER COLUMN, unioned. The previous single-pass form —
    * one aggregate with six COUNT(DISTINCT)s — planned a 7-way Expand
    * of the full fact scan AND fell back to SortAggregate (the
    * min/max(l_returnflag) string buffers disqualify HashAggregate),
    * so the whole 7×-fanned corpus was sorted on a 7-part key: 6.6 s
    * of the query's 9.8 s at gate scale, and at 100 TB a full-corpus
    * sort of 7× the input bytes. Per column, groupBy(value) is a
    * codegen HashAggregate whose partials collapse map-side (the
    * exchange carries one row per DISTINCT value, not per input row),
    * and every metric falls out of the grouped (value, cnt) frame:
    * rows = Σcnt, nulls = Σcnt|null, distinct = count(value),
    * min/max over the group keys. Each branch scans ONE parquet
    * column (column pruning per branch), so six narrow scans replace
    * one 7×-expanded wide sort. Values are unchanged — the DuckDB
    * oracle (itself a per-column UNION ALL) re-verified hash-equal.
    * Doubles render as exact cents and timestamps as formatted UTC —
    * the repo-wide oracle rule that float-to-string is never hashed.
    * At 100 TB the distinct counts swap to approx_count_distinct
    * (ApproxAggSpec pins the sketch); nothing else changes shape.
    */
  def q53Profile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir).lineitem
    // (name, value column, min/max renderer)
    val cols: Seq[(String, Column, Column => Column)] = Seq(
      ("l_orderkey", col("l_orderkey"), c => c.cast("string")),
      ("l_linenumber", col("l_linenumber"), c => c.cast("string")),
      ("l_quantity", col("l_quantity"), c => cents(c).cast("string")),
      ("l_extendedprice", col("l_extendedprice"), c => cents(c).cast("string")),
      ("l_returnflag", col("l_returnflag"), c => c),
      ("l_shipdate", col("l_shipdate"),
        c => date_format(c, "yyyy-MM-dd HH:mm:ss")),
    )
    val branches = cols.map { case (n, c, r) =>
      li.select(c.as("v"))
        .groupBy("v").agg(count(lit(1)).as("cnt"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          sum(when(col("v").isNull, col("cnt")).otherwise(lit(0L))).as("n_nulls"),
          count(col("v")).as("n_distinct"),
          r(min(col("v"))).as("min_repr"),
          r(max(col("v"))).as("max_repr"))
        .select(lit(n).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_repr"), col("max_repr"))
    }
    branches.reduce(_.unionByName(_)).orderBy("col_name")
  }

  /** The profile scan a 100 TB user would ACTUALLY run — [[q53Profile]]
    * with every exact COUNT(DISTINCT) swapped for
    * approx_count_distinct, which removes the 6-way Expand fan-out
    * (the heaviest relational plan at gate scale) in favor of
    * constant-size mergeable HLL++ partials in the SAME single
    * aggregate as the other metrics.
    *
    * Gate surface: the exact columns (rows / nulls / min / max) hash
    * against the oracle as in q53; the sketch ESTIMATE itself is
    * engine-specific so it is NOT hashed — instead `approx_sane` keeps
    * the sketch in the gated plan (1 ≤ estimate ≤ n_rows, each engine
    * against its own estimate — Catalyst cannot prune or constant-fold
    * it) and the tight accuracy bound lives in ApproxAggSpec, which
    * checks this query's estimates within 3·rsd of the exact q53
    * distincts and layout-invariant under repartitioning.
    */
  def q53ProfileApprox(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir).lineitem
    val cols: Seq[(String, Column, Column => Column)] = Seq(
      ("l_orderkey", col("l_orderkey"), c => c.cast("string")),
      ("l_linenumber", col("l_linenumber"), c => c.cast("string")),
      ("l_quantity", col("l_quantity"), c => cents(c).cast("string")),
      ("l_extendedprice", col("l_extendedprice"), c => cents(c).cast("string")),
      ("l_returnflag", col("l_returnflag"), c => c),
      ("l_shipdate", col("l_shipdate"),
        c => date_format(c, "yyyy-MM-dd HH:mm:ss")),
    )
    val aggs = cols.flatMap { case (n, c, r) => Seq(
      count(lit(1)).as(s"${n}__rows"),
      (count(lit(1)) - count(c)).as(s"${n}__nulls"),
      approx_count_distinct(c).as(s"${n}__approx"),
      r(min(c)).as(s"${n}__min"),
      r(max(c)).as(s"${n}__max"))
    }
    val stackArgs = cols.map { case (n, _, _) =>
      s"'$n', ${n}__rows, ${n}__nulls, ${n}__approx, ${n}__min, ${n}__max"
    }.mkString(", ")
    li.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nulls, n_approx, min_repr, max_repr)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        // a sketch may legitimately overshoot the true distinct count
        // (and therefore n_rows) by its error band — the envelope
        // allows 20% + slack; exceeding THAT means a broken sketch
        (col("n_approx") >= least(lit(1L), col("n_rows")) &&
          col("n_approx") <= col("n_rows") + col("n_rows") / 5 + lit(10L))
          .as("approx_sane"),
        col("min_repr"), col("max_repr"))
      .orderBy("col_name")
  }

  /** Bits per dimension for [[q54Zorder]]'s Morton interleave — 16+16
    * → a 32-bit z-value. Gate keys fit 16 bits raw; at corpus scale
    * the inputs are per-column RANKS (dense_rank or a histogram-bucket
    * id), which is the standard production mapping (Delta/Iceberg
    * OPTIMIZE ZORDER) and changes nothing downstream of the interleave.
    */
  private[graft] val ZBits = 16

  /** The interleave as expression TEXT shared by both engines: bit i of
    * the first key lands at z-bit 2i, of the second at 2i+1. Identical
    * strings feed Spark's expr() and the DuckDB oracle, so the
    * arithmetic cannot drift.
    */
  private[graft] def zExprSql(a: String, b: String): String =
    zExprSqlBits(ZBits, a, b)

  /** [[zExprSql]] at an explicit per-dimension bit width — the sampled
    * histogram variant interleaves [[ZHistBits]]-bit bucket ids, the
    * raw/rank variants the full [[ZBits]].
    */
  private[graft] def zExprSqlBits(bits: Int, a: String, b: String): String =
    (0 until bits).flatMap(i => Seq(
      s"((($a >> $i) & 1) << ${2 * i})",
      s"((($b >> $i) & 1) << ${2 * i + 1})")).mkString(" | ")

  /** Z-ORDER (Morton) clustering manifest — the multi-dimensional
    * layout primitive (Morton 1966; Delta/Iceberg `OPTIMIZE ZORDER`):
    * interleaving the bits of two keys gives a 1-D sort order whose
    * contiguous ranges are 2-D quadrants, so range-partitioning the
    * corpus by z and writing files in z-ranges makes per-file min/max
    * stats prunable on EITHER predicate column — the 100 TB data-
    * skipping story for scans filtered sometimes by part, sometimes by
    * supplier. This query emits the per-z-range manifest a writer
    * would produce: for each of the 16 top-nibble z-buckets, the row
    * count and both dims' min/max — the bounded spans (vs. the full
    * key domain a hash layout would show) ARE the skipping guarantee,
    * and the oracle hash-pins the interleave arithmetic bit-for-bit.
    *
    * Plan: one scan (two columns pushed down), per-row integer bit
    * ops, one 16-group aggregate. Nothing else.
    */
  def q54Zorder(s: SparkSession, dir: String): DataFrame = {
    // In-plan guard for the documented [[ZBits]] precondition: a key
    // ≥ 2^16 would silently alias z-values IDENTICALLY in both engines
    // (the oracle shares the interleave text, so the gate cannot catch
    // it) — fail the row instead of producing an aliased manifest. A
    // per-row integer compare, branch never taken at gate scale; at
    // corpus scale the inputs are dense ranks and the guard is the
    // contract that the ranking step actually ran.
    val bound = 1L << ZBits
    def guarded(c: Column): Column =
      when(c >= 0 && c < bound, c).otherwise(raise_error(concat(
        lit(s"z-order key out of ${ZBits}-bit range (dense-rank first): "),
        c.cast("string"))).cast("long"))
    val li = Tables(s, dir).lineitem
      .select(guarded(col("l_partkey")).as("l_partkey"),
        guarded(col("l_suppkey")).as("l_suppkey"))
      .withColumn("z", expr(zExprSql("l_partkey", "l_suppkey")).cast("long"))
      .withColumn("zbucket", shiftright(col("z"), 2 * ZBits - 4).cast("int"))
    li.groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min("z").as("z_min"), max("z").as("z_max"),
        min("l_partkey").as("part_min"), max("l_partkey").as("part_max"),
        min("l_suppkey").as("supp_min"), max("l_suppkey").as("supp_max"))
      .orderBy("zbucket")
  }

  /** Z-ORDER over DENSE RANKS — the production mapping [[q54Zorder]]'s
    * guard and Scaladoc point at, now implemented instead of merely
    * documented: each key column is ranked over its DISTINCT value
    * table (dimension-sized — |distinct| rows, NOT the fact table;
    * the one global window runs there, and at true corpus scale the
    * rank table becomes range-sampled histogram boundaries, same shape)
    * and the Morton interleave runs on the 0-based ranks, which are
    * inside the [[ZBits]] domain BY CONSTRUCTION for any key domain
    * up to 2^16 distinct values — the rank step is exactly what makes
    * the q54 guard's branch provably dead. Ranks join back onto the
    * fact scan on the key (broadcastable at dimension size; key-
    * partitioned at scale). The manifest reports per-z-bucket spans of
    * the RAW keys — the file-skipping guarantee is on the columns
    * users filter by, not on the ranks.
    *
    * This variant is the EXACT CONTROL: its rank window runs over each
    * key's full distinct table, which is corpus-sized for a
    * high-cardinality key. The corpus-scale layer is implemented (and
    * gated) as [[q54ZorderSampled]] — range-sampled histogram
    * boundaries, every window constant-size in n.
    */
  def q54ZorderRank(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir).lineitem.select(col("l_partkey"), col("l_suppkey"))
    def ranks(key: String, rk: String): DataFrame = {
      val w = Window.orderBy(col(key))
      li.select(col(key)).distinct()
        .select(col(key), (dense_rank().over(w) - 1).cast("long").as(rk))
    }
    val bound = 1L << ZBits
    def guarded(c: Column): Column =
      when(c >= 0 && c < bound, c).otherwise(raise_error(concat(
        lit(s"rank out of ${ZBits}-bit range (histogram-bucket first): "),
        c.cast("string"))).cast("long"))
    li.join(broadcast(ranks("l_partkey", "pr")), Seq("l_partkey"))
      .join(broadcast(ranks("l_suppkey", "sr")), Seq("l_suppkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        guarded(col("pr")).as("pr"), guarded(col("sr")).as("sr"))
      .withColumn("z", expr(zExprSql("pr", "sr")).cast("long"))
      .withColumn("zbucket", shiftright(col("z"), 2 * ZBits - 4).cast("int"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min("z").as("z_min"), max("z").as("z_max"),
        min("l_partkey").as("part_min"), max("l_partkey").as("part_max"),
        min("l_suppkey").as("supp_min"), max("l_suppkey").as("supp_max"))
      .orderBy("zbucket")
  }

  /** Deterministic-sample size for [[q54ZorderSampled]]'s boundary
    * estimation — CONSTANT in n (the whole point: every window in the
    * sampled path runs over at most this many rows, however large the
    * fact table), and 16 sample points per histogram bucket at
    * [[ZHistBuckets]] = 64, the classic range-partitioner margin.
    */
  private[graft] val ZSampleSize = 1024

  /** Histogram buckets per dimension (and the matching id bit width)
    * for the sampled Z-order: 64 × 64 = 4 096 z-cells, top nibble →
    * the same 16-bucket manifest as the exact variants.
    */
  private[graft] val ZHistBuckets = 64
  private[graft] val ZHistBits = 6

  /** Z-ORDER over RANGE-SAMPLED HISTOGRAM BOUNDARIES — the corpus-
    * scale layer [[q54ZorderRank]]'s Scaladoc names: dense_rank is
    * exact but runs a window over each key's full DISTINCT table,
    * which is corpus-sized for a high-cardinality key (l_orderkey-
    * like). Production Z-order writers (Delta/Iceberg OPTIMIZE,
    * Spark's own RangePartitioner) instead estimate per-dimension
    * range boundaries from a SAMPLE and bucket rows by boundary
    * lookup:
    *
    *   - sample: the [[ZSampleSize]] smallest md5 coins over the
    *     fact table's unique key (TakeOrdered — one scan + per-
    *     partition top-S, no global sort, partition-independent);
    *   - boundaries: within the sample, each dimension's values are
    *     ranked and cut into [[ZHistBuckets]] equal-frequency
    *     buckets; bucket minima, DEDUPLICATED and re-ranked, become
    *     the half-open range table [lo_i, lo_i+1) — ≤ 64 rows per
    *     dimension, broadcast;
    *   - bucket id: one broadcast range join per dimension (the
    *     BroadcastNestedLoopJoin is n × ≤64 comparisons — the SQL
    *     replayable form of the binary search a partitioner does);
    *     ids are < 2^[[ZHistBits]] BY CONSTRUCTION, interleave via
    *     the shared [[zExprSqlBits]] text, top nibble → the same
    *     16-bucket manifest as q54/q54_rank over the RAW key spans.
    *
    * Every window here runs over the 1024-row sample or the ≤64-row
    * boundary table — sample-sized regardless of n, which is exactly
    * the scaling argument the rank variant's global window lacks (the
    * rank form stays in-tree as the exact control). Equal-frequency
    * (not equal-width) buckets make the z-cells population-balanced
    * under ANY key distribution — skewed keys get narrow ranges, the
    * property that keeps file sizes level at 100 TB.
    */
  def q54ZorderSampled(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir).lineitem
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    val coin = md5(concat(lit("graft-zsample|"),
      col("l_orderkey").cast("string"), lit("|"),
      col("l_linenumber").cast("string")))
    val sample = li
      .orderBy(coin, col("l_orderkey"), col("l_linenumber"))
      .limit(ZSampleSize)
    // equal-frequency boundary table for one dimension: rank the
    // sample, cut into buckets by integer division (exact in both
    // engines), take bucket minima, dedup, re-rank, half-open ranges
    def bounds(key: String): DataFrame = {
      val wOrd = Window.orderBy(col(key), col("l_orderkey"), col("l_linenumber"))
      val wAll = Window.partitionBy()
      val cut = sample
        .select(col(key).as("v"),
          (row_number().over(wOrd) - 1).cast("long").as("rn0"),
          count(lit(1)).over(wAll).as("cnt"))
        .select(col("v"), expr(s"(rn0 * $ZHistBuckets) div cnt").as("b"))
        .groupBy("b").agg(min("v").as("lo"))
        .select("lo").distinct()
      val wB = Window.orderBy(col("lo"))
      cut.select(col("lo"),
        (row_number().over(wB) - 1).cast("long").as("bid"),
        lead(col("lo"), 1).over(wB).as("hi"))
    }
    def bucketed(fact: DataFrame, key: String, b: DataFrame,
        bidName: String): DataFrame = {
      val bb = broadcast(b
        .select(col("lo"), col("bid").as(bidName), col("hi")))
      fact.join(bb,
          (col(bidName) === 0 || col(key) >= col("lo")) &&
            (col("hi").isNull || col(key) < col("hi")))
        .drop("lo", "hi")
    }
    val withBids = bucketed(
      bucketed(li.select(col("l_partkey"), col("l_suppkey")),
        "l_partkey", bounds("l_partkey"), "pbid"),
      "l_suppkey", bounds("l_suppkey"), "sbid")
    withBids
      .withColumn("z", expr(zExprSqlBits(ZHistBits, "pbid", "sbid")).cast("long"))
      .withColumn("zbucket", shiftright(col("z"), 2 * ZHistBits - 4).cast("int"))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min("z").as("z_min"), max("z").as("z_max"),
        min("l_partkey").as("part_min"), max("l_partkey").as("part_max"),
        min("l_suppkey").as("supp_min"), max("l_suppkey").as("supp_max"))
      .orderBy("zbucket")
  }

  /** MERGE INTO (upsert + delete) — the lakehouse CDC-apply: a change
    * batch of updates, deletes, and inserts merged against the orders
    * snapshot in ONE full-outer join on the key (both sides hash-
    * partition on o_orderkey once; at 100 TB the target side is
    * bucketed/clustered on the key and the join co-locates — the merge
    * never rewrites more than the touched partitions). The change
    * batch is derived deterministically from the snapshot itself
    * (delete keys ≡ 3 mod 11; update keys ≡ 0 mod 7 get +1.00 price
    * and status 'U'; insert keys are %13 source rows re-keyed above
    * the key space) with delete-beats-update precedence, so the oracle
    * replays the batch exactly. Output is the audit manifest per
    * (action, resulting status): row count and result-side cents — a
    * wrong action routing, a lost insert, or an un-dropped delete all
    * hash-fail.
    */
  def q55MergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val changes = o
      .withColumn("op",
        when(col("o_orderkey") % 11 === 3, "D")
          .when(col("o_orderkey") % 7 === 0, "U"))
      .where(col("op").isNotNull)
      .select(col("o_orderkey").as("c_orderkey"), col("op"),
        (col("o_totalprice") + lit(1.0)).as("c_totalprice"),
        lit("U").as("c_status"))
      .unionAll(o.where(col("o_orderkey") % 13 === 0)
        .select((col("o_orderkey") + lit(1000000000L)).as("c_orderkey"),
          lit("I").as("op"), lit(1.23).as("c_totalprice"),
          lit("N").as("c_status")))
    val merged = o.join(changes, col("o_orderkey") === col("c_orderkey"),
        "full_outer")
      .withColumn("action",
        when(col("op") === "D", "delete")
          .when(col("op") === "U", "update")
          .when(col("op") === "I", "insert")
          .otherwise("keep"))
      .withColumn("status",
        when(col("action") === "keep", col("o_orderstatus"))
          .when(col("action") === "delete", col("o_orderstatus"))
          .otherwise(col("c_status")))
      .withColumn("price",
        when(col("action") === "keep", col("o_totalprice"))
          .when(col("action") === "delete", col("o_totalprice"))
          .otherwise(col("c_totalprice")))
    merged.groupBy("action", "status")
      .agg(count(lit(1)).as("n_rows"), sum(cents(col("price"))).as("cents"))
      .orderBy("action", "status")
  }

  /** MERGE against a BUCKETED target — [[q55MergeUpsert]]'s Scaladoc
    * claims "at 100 TB the target is bucketed on the key and the join
    * co-locates"; this query proves it. The orders snapshot is staged
    * once as a bucketed+sorted table on o_orderkey; the update/delete
    * change batch derives from THAT table (filter + alias-preserving
    * projection, so its scan reports the same bucket partitioning),
    * and the full-outer merge join runs with ZERO Exchange beneath it
    * (PlanShapeSpec asserts it — the write's one shuffle is amortized
    * over every downstream merge). Inserts by definition match nothing,
    * so they bypass the join entirely as an appended audit arm — the
    * production CDC posture (inserts append; the join only reconciles
    * existing keys). The audit output is IDENTICAL to q55's, so the
    * oracle is shared verbatim: bucketing must be result-invisible.
    */
  def q60MergeBucketed(s: SparkSession, dir: String): DataFrame = {
    val base = scratchDir("q60_buckets")
    graft.core.Bucketing.writeBucketed(
      Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice")),
      "q60_orders_b", "o_orderkey", 8, Some(s"$base/orders"))
    val o = s.table("q60_orders_b")
    // updates + deletes keep their keys — the change side stays
    // co-partitioned with the target; delete beats update, as in q55
    val changes = s.table("q60_orders_b")
      .withColumn("op",
        when(col("o_orderkey") % 11 === 3, "D")
          .when(col("o_orderkey") % 7 === 0, "U"))
      .where(col("op").isNotNull)
      .select(col("o_orderkey").as("c_orderkey"), col("op"),
        (col("o_totalprice") + lit(1.0)).as("c_totalprice"),
        lit("U").as("c_status"))
    val merged = o.hint("merge")
      .join(changes, col("o_orderkey") === col("c_orderkey"), "full_outer")
      .withColumn("action",
        when(col("op") === "D", "delete")
          .when(col("op") === "U", "update")
          .otherwise("keep"))
      .withColumn("status",
        when(col("action") === "update", col("c_status"))
          .otherwise(col("o_orderstatus")))
      .withColumn("price",
        when(col("action") === "update", col("c_totalprice"))
          .otherwise(col("o_totalprice")))
      .groupBy("action", "status")
      .agg(count(lit(1)).as("n_rows"), sum(cents(col("price"))).as("cents"))
    val inserts = s.table("q60_orders_b")
      .where(col("o_orderkey") % 13 === 0)
      .groupBy(lit("insert").as("action"), lit("N").as("status"))
      .agg(count(lit(1)).as("n_rows"), sum(cents(lit(1.23))).as("cents"))
    merged.unionByName(inserts).orderBy("action", "status")
  }

  /** Key-range bound for [[q61MergeBroadcast]]'s change batch: the
    * bottom slice of the key domain — the backfill/hot-tenant shape a
    * real CDC cycle produces (changes concentrate, they don't spread
    * mod-uniformly like q55's fixture).
    */
  private[graft] val MergeHotKeyBound = 2000L

  /** MERGE with a CONCENTRATED (skewed) change batch, applied WITHOUT
    * touching the target with a key shuffle or a full-outer join — the
    * small-batch CDC posture q55/q60 deliberately don't cover:
    *
    *   - Skew, precisely: the merge key is UNIQUE on both sides, so
    *     under hash partitioning no single key can make a hot task —
    *     the real cost of a skewed SMALL batch is elsewhere, in
    *     full-outer-joining (or re-shuffling) 100 TB of target against
    *     a batch that touches 0.1 % of keys. Salting is the answer
    *     when BOTH sides are big (the salted-join machinery
    *     ScaleUtilsSpec pins); when the hot side is the SMALL side,
    *     the answer is to broadcast it and never partition the target
    *     by key at all — broadcast joins are skew-immune by
    *     construction (every task probes the same whole-batch map).
    *   - The decomposition: reconcile arm = target INNER
    *     broadcast-join changes (update/delete rows only — batch-
    *     sized); passthrough arm = target broadcast LEFT-ANTI changes
    *     (the keeps — a scan-shaped filter, no partitioning); inserts
    *     append as in q60. Result-identical to the full-outer
    *     formulation — the oracle replays THAT form (FULL OUTER over
    *     the same range-derived batch), so the decomposition's
    *     equality is hash-checked, not claimed.
    *
    * PlanShapeSpec asserts the posture: both arms are
    * BroadcastHashJoins, zero SortMergeJoin, zero Exchange under
    * either join (only the final audit aggregate shuffles).
    */
  def q61MergeBroadcast(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    // the concentrated batch: every change key in [0, MergeHotKeyBound)
    val changes = o.where(col("o_orderkey") < MergeHotKeyBound)
      .select(col("o_orderkey").as("c_orderkey"),
        when(col("o_orderkey") % 3 === 0, "D").otherwise("U").as("op"),
        (col("o_totalprice") + lit(1.0)).as("c_totalprice"),
        lit("U").as("c_status"))
    val reconciled = o
      .join(broadcast(changes), col("o_orderkey") === col("c_orderkey"))
      .withColumn("action",
        when(col("op") === "D", "delete").otherwise("update"))
      .withColumn("status",
        when(col("action") === "update", col("c_status"))
          .otherwise(col("o_orderstatus")))
      .withColumn("price",
        when(col("action") === "update", col("c_totalprice"))
          .otherwise(col("o_totalprice")))
      .select(col("action"), col("status"), col("price"))
    val keeps = o
      .join(broadcast(changes.select(col("c_orderkey"))),
        col("o_orderkey") === col("c_orderkey"), "left_anti")
      .select(lit("keep").as("action"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("price"))
    val inserts = o.where(col("o_orderkey") % 13 === 0)
      .select(lit("insert").as("action"), lit("N").as("status"),
        lit(1.23).as("price"))
    reconciled.unionByName(keeps).unionByName(inserts)
      .groupBy("action", "status")
      .agg(count(lit(1)).as("n_rows"), sum(cents(col("price"))).as("cents"))
      .orderBy("action", "status")
  }

  /** MERGE fed by a MULTI-VERSION hot-key change stream — the CDC
    * reality [[q55MergeUpsert]]/[[q60MergeBucketed]]/
    * [[q61MergeBroadcast]] idealize away: their batches carry exactly
    * one change per key, but a real stream delivers MANY versions per
    * key per cycle, and hot keys update every cycle (the r8 verdict's
    * skew scenario). A merge needs exactly-one-row-per-key, so the
    * batch must be COMPACTED to the latest change first — and the
    * compaction is where version skew lives and dies:
    *
    *   - latest-per-key = a struct-max aggregate with the sequence
    *     number as the leading field (the [[graft.queries.KmeansIvf]]
    *     argmin device, flipped to argmax). PARTIAL (map-side)
    *     aggregation collapses each task's versions of a hot key to
    *     ONE buffer row before the exchange, so the shuffle carries at
    *     most (#tasks × #touched keys) rows no matter how many
    *     versions the hot key produced — the combiner mechanism that
    *     makes word count's "the" harmless makes CDC's hot tenant
    *     harmless. A window row_number() formulation would instead
    *     ship EVERY version to the key's one partition and sort it
    *     there: that plan's hot task is exactly the skew this one
    *     cannot have.
    *   - the fixture makes the skew real: change keys concentrate in
    *     [0, [[MergeHotKeyBound]]) (q61's shape), ordinary keys carry
    *     1–5 versions, and every key ≡ 0 (mod 500) carries 200 —
    *     two orders of magnitude hotter than the median.
    *   - the compacted batch is batch-sized by construction, so the
    *     merge itself is ONE left-outer broadcast join (update/delete
    *     keys reconcile, unmatched target rows keep) — the target is
    *     never key-partitioned, completing the q61 posture.
    *
    * The audit output adds `win_seq_sum` (the sum of winning sequence
    * numbers) to the action/status manifest: compacting to the WRONG
    * version — first instead of last, or a hot-key version lost in the
    * partial/final merge — drifts win_seq_sum and the priced cents
    * together, so "latest wins" is hash-checked, not assumed.
    * PlanShapeSpec asserts the mechanism: a partial_max on the version
    * aggregate, exactly one key-partitioned exchange (the compaction's
    * own), broadcast merge join, zero SortMergeJoin.
    */
  def q62MergeCompacted(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir).orders
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    // the raw stream: nv versions per touched key, hot keys at 200
    val raw = o.where(col("o_orderkey") < MergeHotKeyBound)
      .withColumn("nv",
        when(col("o_orderkey") % 500 === 0, lit(200))
          .otherwise((col("o_orderkey") % 5 + 1).cast("int")))
      .select(col("o_orderkey").as("c_orderkey"), col("nv"),
        explode(sequence(lit(1), col("nv"))).as("seq"),
        col("o_totalprice"))
    // one row per version: price moves with seq (exact integer adds on
    // doubles), the key's final disposition rides its LAST version
    val versions = raw.select(
      col("c_orderkey"), col("seq").cast("long").as("seq"),
      when(col("seq") === col("nv") && col("c_orderkey") % 11 === 3, "D")
        .otherwise("U").as("op"),
      (col("o_totalprice") + col("seq")).as("c_totalprice"),
      lit("U").as("c_status"))
    val compacted = versions
      .groupBy("c_orderkey")
      .agg(max(struct(col("seq"), col("op"), col("c_totalprice"),
        col("c_status"))).as("w"))
      .select(col("c_orderkey"), col("w.seq").as("win_seq"),
        col("w.op").as("op"), col("w.c_totalprice").as("c_totalprice"),
        col("w.c_status").as("c_status"))
    o.join(broadcast(compacted), col("o_orderkey") === col("c_orderkey"),
        "left_outer")
      .withColumn("action",
        when(col("op") === "D", "delete")
          .when(col("op") === "U", "update")
          .otherwise("keep"))
      .withColumn("status",
        when(col("action") === "update", col("c_status"))
          .otherwise(col("o_orderstatus")))
      .withColumn("price",
        when(col("action") === "update", col("c_totalprice"))
          .otherwise(col("o_totalprice")))
      .groupBy("action", "status")
      .agg(count(lit(1)).as("n_rows"), sum(cents(col("price"))).as("cents"),
        sum(coalesce(col("win_seq"), lit(0L))).as("win_seq_sum"))
      .orderBy("action", "status")
  }

  /** Target compacted-file size for [[q57CompactionPlan]] — small so
    * the sf0.01 fixture produces multiple groups per partition; a
    * production run passes its table's target (128–1024 MB).
    */
  private[graft] val CompactionTargetBytes = 16384L

  /** Where [[q57CompactionPlan]] stages its partitioned layout —
    * deliberately NOT under [[scratchRoot]]/TempDirs: the oracle's
    * read_blob lists this directory AFTER the JVM exits (the same
    * persistence contract as the ANN model dirs).
    */
  private[graft] lazy val CompactionStageDir = java.nio.file.Files
    .createTempDirectory("graft_q57_part_").toString

  /** Small-files COMPACTION PLANNING — the lakehouse maintenance
    * operator (OPTIMIZE/rewriteDataFiles): a partitioned write shatters
    * the table into per-task files; the planner lists the layout and
    * assigns files to target-size rewrite groups. Grouping is the
    * [[TextAnalysis.taSeqPack]] formulation of greedy first-fit —
    * group = floor(cumulative-bytes-before / target) within each
    * partition, a per-partition running sum + integer division, never
    * anything global (at 100 TB the listing itself is the big input;
    * it shuffles once on the partition key and each partition's plan
    * is an in-partition window). File listing rides the `binaryFile`
    * source (path + length only — content is never read, the column
    * is pruned). The oracle lists the SAME staged directory via
    * read_blob and replays the pack arithmetic — a missed file, a
    * wrong size, or a drifted group boundary hash-fails.
    */
  def q57CompactionPlan(s: SparkSession, dir: String): DataFrame = {
    // The stage path is a driver-created LOCAL temp dir — a shared
    // filesystem only in local mode (executor writer tasks resolve
    // file:/tmp per-node on a real cluster and the listing would be
    // silently partial). Production passes a DFS URI (s3://, hdfs://)
    // as the stage root; the write/list code is already FS-API-clean.
    require(s.sparkContext.isLocal,
      "q57_compaction_plan stages its layout in a driver-local temp " +
        "dir; on a cluster, point the stage root at a shared DFS path")
    val base = CompactionStageDir
    // repartition(8) deliberately SHATTERS the layout (8 writer tasks
    // x 5 partition values -> ~40 small files) so the plan has real
    // packing work — the small-files problem this operator exists for
    Tables(s, dir).events
      .select(col("ts"), col("user_id"), col("value"), col("event_type"))
      .repartition(8)
      .write.mode("overwrite").partitionBy("event_type").parquet(base)
    val files = s.read.format("binaryFile").load(s"$base/*/*.parquet")
      .select(col("path"), col("length"))
      .withColumn("part", regexp_extract(col("path"), "event_type=([^/]+)/", 1))
      .withColumn("fname", element_at(split(col("path"), "/"), -1))
    val w = Window.partitionBy("part").orderBy("fname")
    files
      .withColumn("cum_before", coalesce(
        sum("length").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("grp", expr(s"cum_before div $CompactionTargetBytes"))
      .groupBy("part", "grp")
      .agg(count(lit(1)).as("n_files"), sum("length").as("bytes"))
      .orderBy("part", "grp")
  }

  /** Where [[q58SchemaEvolution]] stages its two-generation layout —
    * outside TempDirs for the same oracle-persistence reason as
    * [[CompactionStageDir]].
    */
  private[graft] lazy val EvolutionStageDir = java.nio.file.Files
    .createTempDirectory("graft_q58_evo_").toString

  /** SCHEMA EVOLUTION on read — the ingestion reality every long-lived
    * 100 TB table faces: early batches were written before a column
    * existed. Batch v1 (even doc ids) ships (doc_id, text_len); batch
    * v2 (odd ids) adds `lang`. One `mergeSchema=true` read over the
    * partitioned layout must surface EVERY row under the union schema,
    * null-filling the pre-evolution rows — the oracle re-derives the
    * same answer from the source-of-truth documents table, so a merge
    * that dropped v1 rows, failed to null-fill, or leaked v2's column
    * into v1 hash-fails. (mergeSchema costs a footer read per file at
    * planning time — the production posture is to evolve the schema in
    * the catalog instead; this query pins the read-side semantics that
    * make that migration safe.)
    */
  def q58SchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    // same local-FS staging honesty guard as q57_compaction_plan
    require(s.sparkContext.isLocal,
      "q58_schema_evolution stages its two-generation layout in a " +
        "driver-local temp dir; on a cluster, use a shared DFS path")
    val base = EvolutionStageDir
    val docs = Tables(s, dir).documents
    docs.where(col("doc_id") % 2 === 0)
      .select(col("doc_id"), length(col("text")).as("text_len"))
      .write.mode("overwrite").parquet(s"$base/batch=v1")
    docs.where(col("doc_id") % 2 =!= 0)
      .select(col("doc_id"), length(col("text")).as("text_len"), col("lang"))
      .write.mode("overwrite").parquet(s"$base/batch=v2")
    s.read.option("mergeSchema", "true").parquet(base)
      .groupBy(col("batch"),
        coalesce(col("lang"), lit("<pre-evolution>")).as("lang_c"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("text_len").cast("long")).as("total_len"),
        count(col("lang")).as("n_with_lang"))
      .orderBy("batch", "lang_c")
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_zorder" -> (q54Zorder _),
    "q54_zorder_rank" -> (q54ZorderRank _),
    "q54_zorder_sampled" -> (q54ZorderSampled _),
    "q61_merge_broadcast" -> (q61MergeBroadcast _),
    "q62_merge_compacted" -> (q62MergeCompacted _),
    "q63_avro_roundtrip" -> (q63AvroRoundtrip _),
    "q64_unpivot" -> (q64Unpivot _),
    "q65_avro_evolution" -> (q65AvroEvolution _),
    "q66_avro_complex" -> (q66AvroComplex _),
    "q56_pit_join" -> (q56PitJoin _),
    "q57_compaction_plan" -> (q57CompactionPlan _),
    "q58_schema_evolution" -> (q58SchemaEvolution _),
    "q55_merge_upsert" -> (q55MergeUpsert _),
    "q52_scd2" -> (q52Scd2 _),
    "q53_profile" -> (q53Profile _),
    "q53_profile_approx" -> (q53ProfileApprox _),
    "q59_keyset_page" -> (q59KeysetPage _),
    "q60_merge_bucketed" -> (q60MergeBucketed _),
    "q30_bucketed_join" -> (q30BucketedJoin _),
    "q29_range_join" -> (q29RangeJoin _),
    "q28_asof_join" -> (q28AsofJoin _),
    "q27_skew_join" -> (q27SkewJoin _),
    "q26_array_agg" -> (q26ArrayAgg _),
    "q25_json" -> (q25Json _),
    "q23_correlated" -> (q23Correlated _),
    "q24_date_funcs" -> (q24DateFuncs _),
    "q18_part_promo" -> (q18PartPromo _),
    "q19_ntile" -> (q19Ntile _),
    "q20_string_funcs" -> (q20StringFuncs _),
    "q21_union_all" -> (q21UnionAll _),
    "q22_pivot" -> (q22Pivot _),
    "q01_agg_pricing" -> (q01AggPricing _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_join_topk" -> (q03JoinTopK _),
    "q04_semi_join" -> (q04SemiJoin _),
    "q05_anti_join" -> (q05AntiJoin _),
    "q06_outer_agg" -> (q06OuterAgg _),
    "q07_window_rank" -> (q07WindowRank _),
    "q08_window_running" -> (q08WindowRunning _),
    "q09_intersect" -> (q09Intersect _),
    "q10_except" -> (q10Except _),
    "q11_rollup" -> (q11Rollup _),
    "q31_grouping_sets" -> (q31GroupingSets _),
    "q32_mask_props" -> (q32MaskProps _),
    "q33_percentiles" -> (q33Percentiles _),
    "q34_jsonl_roundtrip" -> (q34JsonlRoundtrip _),
    "q35_sliding_window" -> (q35SlidingWindow _),
    "q36_partition_pruning" -> (q36PartitionPruning _),
    "q37_not_in_nulls" -> (q37NotInNulls _),
    "q38_session_window" -> (q38SessionWindow _),
    "q39_window_funcs" -> (q39WindowFuncs _),
    "q40_setops_all" -> (q40SetopsAll _),
    "q41_higher_order" -> (q41HigherOrder _),
    "q42_orc_roundtrip" -> (q42OrcRoundtrip _),
    "q43_csv_roundtrip" -> (q43CsvRoundtrip _),
    "q44_cube" -> (q44Cube _),
    "q45_full_outer" -> (q45FullOuter _),
    "q48_gap_fill" -> (q48GapFill _),
    "q49_range_frame" -> (q49RangeFrame _),
    "q50_map_funcs" -> (q50MapFuncs _),
    "q51_lateral" -> (q51Lateral _),
    "q46_cross_join" -> (q46CrossJoin _),
    "q47_limit_offset" -> (q47LimitOffset _),
    "q12_count_distinct" -> (q12CountDistinct _),
    "q13_case_agg" -> (q13CaseAgg _),
    "q14_scalar_subquery" -> (q14ScalarSubquery _),
    "q15_events_hourly" -> (q15EventsHourly _),
    "q16_sessionize" -> (q16Sessionize _),
    "q17_topk_global" -> (q17TopKGlobal _),
  )

  /** The MERGE audit replay — shared verbatim by [[q55MergeUpsert]]
    * and [[q60MergeBucketed]]: the physical layout of the target
    * (plain vs bucketed) must be invisible in the audit manifest.
    */
  private val mergeAuditOracle: String =
    """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |changes AS (
        |  SELECT o_orderkey AS c_orderkey,
        |    CASE WHEN o_orderkey % 11 = 3 THEN 'D'
        |         WHEN o_orderkey % 7 = 0 THEN 'U' END AS op,
        |    o_totalprice + 1.0 AS c_totalprice, 'U' AS c_status
        |  FROM o WHERE o_orderkey % 11 = 3 OR o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000 AS c_orderkey, 'I' AS op,
        |    1.23 AS c_totalprice, 'N' AS c_status
        |  FROM o WHERE o_orderkey % 13 = 0),
        |merged AS (
        |  SELECT CASE WHEN op = 'D' THEN 'delete'
        |              WHEN op = 'U' THEN 'update'
        |              WHEN op = 'I' THEN 'insert'
        |              ELSE 'keep' END AS action,
        |    CASE WHEN op IS NULL OR op = 'D' THEN o.o_orderstatus
        |         ELSE c_status END AS status,
        |    CASE WHEN op IS NULL OR op = 'D' THEN o.o_totalprice
        |         ELSE c_totalprice END AS price
        |  FROM o FULL OUTER JOIN changes ON o.o_orderkey = changes.c_orderkey)
        |SELECT action, status, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM merged GROUP BY action, status ORDER BY action, status""".stripMargin

  val oracles: Map[String, String] = Map(
    // the identical lag→running-sum→rollup→lead chain; IS DISTINCT FROM
    // the q52 version CTEs with raw timestamps, then the interval
    // probe: custkey equi-join + vf <= d < vt residual; every order
    // matches exactly one version (intervals tile the timeline)
    "q56_pit_join" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        |  FROM orders WHERE o_custkey % 10 = 0),
        |m AS (
        |  SELECT *, CASE WHEN lag(o_orderstatus) OVER w IS DISTINCT FROM
        |      o_orderstatus THEN 1 ELSE 0 END AS chg
        |  FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |v AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) AS version
        |  FROM m),
        |g AS (
        |  SELECT o_custkey AS custkey, version, o_orderstatus AS status,
        |    min(o_orderdate) AS vf
        |  FROM v GROUP BY o_custkey, version, o_orderstatus),
        |h AS (
        |  SELECT custkey, status AS dim_status, vf,
        |    lead(vf) OVER (PARTITION BY custkey ORDER BY version) AS vt
        |  FROM g)
        |SELECT h.dim_status, o.o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_custs
        |FROM o JOIN h ON o.o_custkey = h.custkey
        |  AND h.vf <= o.o_orderdate
        |  AND (h.vt IS NULL OR o.o_orderdate < h.vt)
        |GROUP BY h.dim_status, o.o_orderstatus
        |ORDER BY h.dim_status, o.o_orderstatus""".stripMargin,
    // re-derived from the source-of-truth documents table: v1 = even
    // ids (no lang), v2 = odd ids (lang present); the engine side must
    // reproduce this through the merged-schema read-back
    "q58_schema_evolution" ->
      """WITH u AS (
        |  SELECT doc_id, length(text) AS text_len, NULL AS lang, 'v1' AS batch
        |  FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id, length(text) AS text_len, lang, 'v2' AS batch
        |  FROM documents WHERE doc_id % 2 <> 0)
        |SELECT batch, coalesce(lang, '<pre-evolution>') AS lang_c,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(text_len) AS BIGINT) AS total_len,
        |  CAST(count(lang) AS BIGINT) AS n_with_lang
        |FROM u GROUP BY batch, lang_c
        |ORDER BY batch, lang_c""".stripMargin,
    // read_blob over the staged layout (sizes only), then the same
    // per-partition filename-ordered running sum and integer division
    "q57_compaction_plan" -> {
      val base = CompactionStageDir
      s"""WITH f AS (
         |  SELECT regexp_extract(filename, 'event_type=([^/]+)/', 1) AS part,
         |    regexp_extract(filename, '([^/]+)$$', 1) AS fname,
         |    CAST(size AS BIGINT) AS length
         |  FROM read_blob('$base/*/*.parquet')),
         |c AS (
         |  SELECT part, length,
         |    coalesce(sum(length) OVER (PARTITION BY part ORDER BY fname
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM f)
         |SELECT part, CAST(cum_before // $CompactionTargetBytes AS BIGINT) AS grp,
         |  CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(length) AS BIGINT) AS bytes
         |FROM c GROUP BY part, grp ORDER BY part, grp""".stripMargin
    },
    // the interleave expression text is SHARED with the Spark side
    // (zExprSql), so the bit arithmetic cannot drift between engines
    "q54_zorder" ->
      s"""WITH z0 AS (
         |  SELECT l_partkey, l_suppkey,
         |    CAST(${zExprSql("l_partkey", "l_suppkey")} AS BIGINT) AS z
         |  FROM lineitem),
         |zb AS (SELECT *, CAST(z >> ${2 * ZBits - 4} AS INTEGER) AS zbucket FROM z0)
         |SELECT zbucket, CAST(count(*) AS BIGINT) AS n_rows,
         |  min(z) AS z_min, max(z) AS z_max,
         |  min(l_partkey) AS part_min, max(l_partkey) AS part_max,
         |  min(l_suppkey) AS supp_min, max(l_suppkey) AS supp_max
         |FROM zb GROUP BY zbucket ORDER BY zbucket""".stripMargin,
    // rank-based twin: dense_rank over each key's DISTINCT table,
    // interleave the 0-based ranks (same shared expression text),
    // manifest spans on the RAW keys
    "q54_zorder_rank" ->
      s"""WITH pk AS (
         |  SELECT l_partkey, CAST(dense_rank() OVER (ORDER BY l_partkey) - 1
         |    AS BIGINT) AS pr
         |  FROM (SELECT DISTINCT l_partkey FROM lineitem)),
         |sk AS (
         |  SELECT l_suppkey, CAST(dense_rank() OVER (ORDER BY l_suppkey) - 1
         |    AS BIGINT) AS sr
         |  FROM (SELECT DISTINCT l_suppkey FROM lineitem)),
         |z0 AS (
         |  SELECT l.l_partkey, l.l_suppkey,
         |    CAST(${zExprSql("pr", "sr")} AS BIGINT) AS z
         |  FROM lineitem l
         |  JOIN pk ON l.l_partkey = pk.l_partkey
         |  JOIN sk ON l.l_suppkey = sk.l_suppkey),
         |zb AS (SELECT *, CAST(z >> ${2 * ZBits - 4} AS INTEGER) AS zbucket FROM z0)
         |SELECT zbucket, CAST(count(*) AS BIGINT) AS n_rows,
         |  min(z) AS z_min, max(z) AS z_max,
         |  min(l_partkey) AS part_min, max(l_partkey) AS part_max,
         |  min(l_suppkey) AS supp_min, max(l_suppkey) AS supp_max
         |FROM zb GROUP BY zbucket ORDER BY zbucket""".stripMargin,
    // sampled-boundary twin: the identical deterministic sample (md5
    // coin TopS), equal-frequency bucket minima deduped into half-open
    // ranges, range-join bucket ids, 6-bit interleave (shared text) —
    // a drifted boundary, a mis-bucketed row, or a wrong dedup all
    // hash-fail on the raw-key spans
    "q54_zorder_sampled" ->
      s"""WITH smp AS (
         |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
         |  FROM lineitem
         |  ORDER BY md5('graft-zsample|' || CAST(l_orderkey AS VARCHAR)
         |    || '|' || CAST(l_linenumber AS VARCHAR)), l_orderkey, l_linenumber
         |  LIMIT $ZSampleSize),
         |pr AS (
         |  SELECT l_partkey AS v,
         |    row_number() OVER (ORDER BY l_partkey, l_orderkey, l_linenumber)
         |      - 1 AS rn0,
         |    count(*) OVER () AS cnt
         |  FROM smp),
         |pcut AS (SELECT DISTINCT lo FROM (
         |  SELECT (rn0 * $ZHistBuckets) // cnt AS b, min(v) AS lo
         |  FROM pr GROUP BY 1)),
         |pb AS (
         |  SELECT lo, row_number() OVER (ORDER BY lo) - 1 AS pbid,
         |    lead(lo) OVER (ORDER BY lo) AS hi
         |  FROM pcut),
         |sr AS (
         |  SELECT l_suppkey AS v,
         |    row_number() OVER (ORDER BY l_suppkey, l_orderkey, l_linenumber)
         |      - 1 AS rn0,
         |    count(*) OVER () AS cnt
         |  FROM smp),
         |scut AS (SELECT DISTINCT lo FROM (
         |  SELECT (rn0 * $ZHistBuckets) // cnt AS b, min(v) AS lo
         |  FROM sr GROUP BY 1)),
         |sb AS (
         |  SELECT lo, row_number() OVER (ORDER BY lo) - 1 AS sbid,
         |    lead(lo) OVER (ORDER BY lo) AS hi
         |  FROM scut),
         |f AS (
         |  SELECT l.l_partkey, l.l_suppkey, p.pbid, s.sbid
         |  FROM lineitem l
         |  JOIN pb p ON (p.pbid = 0 OR l.l_partkey >= p.lo)
         |    AND (p.hi IS NULL OR l.l_partkey < p.hi)
         |  JOIN sb s ON (s.sbid = 0 OR l.l_suppkey >= s.lo)
         |    AND (s.hi IS NULL OR l.l_suppkey < s.hi)),
         |z0 AS (
         |  SELECT l_partkey, l_suppkey,
         |    CAST(${zExprSqlBits(ZHistBits, "pbid", "sbid")} AS BIGINT) AS z
         |  FROM f),
         |zb AS (SELECT *, CAST(z >> ${2 * ZHistBits - 4} AS INTEGER) AS zbucket
         |  FROM z0)
         |SELECT zbucket, CAST(count(*) AS BIGINT) AS n_rows,
         |  min(z) AS z_min, max(z) AS z_max,
         |  min(l_partkey) AS part_min, max(l_partkey) AS part_max,
         |  min(l_suppkey) AS supp_min, max(l_suppkey) AS supp_max
         |FROM zb GROUP BY zbucket ORDER BY zbucket""".stripMargin,
    // delete-beats-update precedence in the same CASE order as the
    // engine; insert keys re-keyed above the key space; manifest =
    // per-(action, resulting status) counts + result-side cents
    "q55_merge_upsert" -> mergeAuditOracle,
    // bucketing must be result-invisible: the bucketed MERGE replays
    // the IDENTICAL audit manifest
    "q60_merge_bucketed" -> mergeAuditOracle,
    // the broadcast decomposition must equal the FULL OUTER form over
    // the same concentrated batch — the oracle replays the latter
    "q61_merge_broadcast" ->
      s"""WITH o AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         |changes AS (
         |  SELECT o_orderkey AS c_orderkey,
         |    CASE WHEN o_orderkey % 3 = 0 THEN 'D' ELSE 'U' END AS op,
         |    o_totalprice + 1.0 AS c_totalprice, 'U' AS c_status
         |  FROM o WHERE o_orderkey < $MergeHotKeyBound),
         |merged AS (
         |  SELECT CASE WHEN op = 'D' THEN 'delete'
         |              WHEN op = 'U' THEN 'update'
         |              ELSE 'keep' END AS action,
         |    CASE WHEN op IS NULL OR op = 'D' THEN o.o_orderstatus
         |         ELSE c_status END AS status,
         |    CASE WHEN op IS NULL OR op = 'D' THEN o.o_totalprice
         |         ELSE c_totalprice END AS price
         |  FROM o FULL OUTER JOIN changes ON o.o_orderkey = changes.c_orderkey
         |  UNION ALL
         |  SELECT 'insert', 'N', 1.23 FROM o WHERE o_orderkey % 13 = 0)
         |SELECT action, status, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) AS cents
         |FROM merged GROUP BY action, status ORDER BY action, status""".stripMargin,
    // regenerates the identical multi-version stream, compacts with
    // arg_max over the sequence number (the struct-max's semantics),
    // and replays the left-outer merge — a wrong compaction winner
    // drifts win_seq_sum and cents together
    "q62_merge_compacted" ->
      s"""WITH o AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         |raw AS (
         |  SELECT o_orderkey AS c_orderkey,
         |    CASE WHEN o_orderkey % 500 = 0 THEN 200
         |         ELSE 1 + o_orderkey % 5 END AS nv,
         |    o_totalprice
         |  FROM o WHERE o_orderkey < $MergeHotKeyBound),
         |v AS (
         |  SELECT c_orderkey, CAST(u.seq AS BIGINT) AS seq,
         |    CASE WHEN u.seq = nv AND c_orderkey % 11 = 3 THEN 'D'
         |         ELSE 'U' END AS op,
         |    o_totalprice + u.seq AS c_totalprice, 'U' AS c_status
         |  FROM raw, LATERAL unnest(range(1, nv + 1)) AS u(seq)),
         |latest AS (
         |  SELECT c_orderkey, max(seq) AS win_seq,
         |    arg_max(op, seq) AS op,
         |    arg_max(c_totalprice, seq) AS c_totalprice,
         |    arg_max(c_status, seq) AS c_status
         |  FROM v GROUP BY c_orderkey),
         |merged AS (
         |  SELECT CASE WHEN l.op = 'D' THEN 'delete'
         |              WHEN l.op = 'U' THEN 'update'
         |              ELSE 'keep' END AS action,
         |    CASE WHEN l.op = 'U' THEN l.c_status
         |         ELSE o.o_orderstatus END AS status,
         |    CASE WHEN l.op = 'U' THEN l.c_totalprice
         |         ELSE o.o_totalprice END AS price,
         |    coalesce(l.win_seq, 0) AS win_seq
         |  FROM o LEFT JOIN latest l ON o.o_orderkey = l.c_orderkey)
         |SELECT action, status, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT) AS cents,
         |  CAST(sum(win_seq) AS BIGINT) AS win_seq_sum
         |FROM merged GROUP BY action, status ORDER BY action, status""".stripMargin,

    // covers the first-row NULL the Spark side spells with isNull
    "q52_scd2" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        |  FROM orders WHERE o_custkey % 10 = 0),
        |m AS (
        |  SELECT *, CASE WHEN lag(o_orderstatus) OVER w IS DISTINCT FROM
        |      o_orderstatus THEN 1 ELSE 0 END AS chg
        |  FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |v AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) AS version
        |  FROM m),
        |g AS (
        |  SELECT o_custkey, version, o_orderstatus AS status,
        |    min(o_orderdate) AS vf, count(*) AS n_orders
        |  FROM v GROUP BY o_custkey, version, o_orderstatus),
        |f AS (
        |  SELECT o_custkey AS custkey, CAST(version AS INT) AS version, status,
        |    strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |    strftime(lead(vf) OVER (PARTITION BY o_custkey ORDER BY version),
        |      '%Y-%m-%d %H:%M:%S') AS valid_to,
        |    CAST(n_orders AS BIGINT) AS n_orders
        |  FROM g)
        |SELECT custkey, version, status, valid_from, valid_to, n_orders,
        |  (valid_to IS NULL) AS is_current
        |FROM f ORDER BY custkey, version""".stripMargin,
    // one UNION ALL arm per profiled column, each re-deriving the same
    // typed min/max rendering (cents for doubles, strftime for
    // timestamps) the Spark side stacks from its single-pass aggregate
    "q53_profile" -> {
      val arms = Seq(
        ("l_orderkey", "CAST(min(l_orderkey) AS VARCHAR)",
          "CAST(max(l_orderkey) AS VARCHAR)"),
        ("l_linenumber", "CAST(min(l_linenumber) AS VARCHAR)",
          "CAST(max(l_linenumber) AS VARCHAR)"),
        ("l_quantity", "CAST(CAST(round(min(l_quantity) * 100) AS BIGINT) AS VARCHAR)",
          "CAST(CAST(round(max(l_quantity) * 100) AS BIGINT) AS VARCHAR)"),
        ("l_extendedprice", "CAST(CAST(round(min(l_extendedprice) * 100) AS BIGINT) AS VARCHAR)",
          "CAST(CAST(round(max(l_extendedprice) * 100) AS BIGINT) AS VARCHAR)"),
        ("l_returnflag", "min(l_returnflag)", "max(l_returnflag)"),
        ("l_shipdate", "strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S')",
          "strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')"),
      ).map { case (n, mn, mx) =>
        s"""SELECT '$n' AS col_name, count(*) AS n_rows,
           |  count(*) - count($n) AS n_nulls,
           |  count(DISTINCT $n) AS n_distinct, $mn AS min_repr, $mx AS max_repr
           |FROM lineitem""".stripMargin
      }
      arms.mkString("SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows, " +
        "CAST(n_nulls AS BIGINT) AS n_nulls, " +
        "CAST(n_distinct AS BIGINT) AS n_distinct, min_repr, max_repr FROM (\n",
        "\nUNION ALL\n", "\n) ORDER BY col_name")
    },
    // exact columns replayed as in q53; DuckDB's approx_count_distinct
    // sanity-envelopes against ITS OWN counts, mirroring the Spark side
    // (the tight cross-engine accuracy bound lives in ApproxAggSpec)
    "q53_profile_approx" -> {
      val arms = Seq(
        ("l_orderkey", "CAST(min(l_orderkey) AS VARCHAR)",
          "CAST(max(l_orderkey) AS VARCHAR)"),
        ("l_linenumber", "CAST(min(l_linenumber) AS VARCHAR)",
          "CAST(max(l_linenumber) AS VARCHAR)"),
        ("l_quantity", "CAST(CAST(round(min(l_quantity) * 100) AS BIGINT) AS VARCHAR)",
          "CAST(CAST(round(max(l_quantity) * 100) AS BIGINT) AS VARCHAR)"),
        ("l_extendedprice", "CAST(CAST(round(min(l_extendedprice) * 100) AS BIGINT) AS VARCHAR)",
          "CAST(CAST(round(max(l_extendedprice) * 100) AS BIGINT) AS VARCHAR)"),
        ("l_returnflag", "min(l_returnflag)", "max(l_returnflag)"),
        ("l_shipdate", "strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S')",
          "strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')"),
      ).map { case (n, mn, mx) =>
        s"""SELECT '$n' AS col_name, count(*) AS n_rows,
           |  count(*) - count($n) AS n_nulls,
           |  (approx_count_distinct($n) BETWEEN least(1, count(*))
           |     AND count(*) + count(*) // 5 + 10) AS approx_sane,
           |  $mn AS min_repr, $mx AS max_repr
           |FROM lineitem""".stripMargin
      }
      arms.mkString("SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows, " +
        "CAST(n_nulls AS BIGINT) AS n_nulls, " +
        "approx_sane, min_repr, max_repr FROM (\n",
        "\nUNION ALL\n", "\n) ORDER BY col_name")
    },
    // the keyset cursor predicate replayed verbatim on the raw price
    "q59_keyset_page" ->
      s"""SELECT o_orderkey, o_custkey,
         | CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
         |FROM orders
         |WHERE o_totalprice < $KeysetLastPrice
         |   OR (o_totalprice = $KeysetLastPrice AND o_orderkey > $KeysetLastKey)
         |ORDER BY o_totalprice DESC, o_orderkey
         |LIMIT 20""".stripMargin,
    // the PLAIN join — the bucketed layout must be result-invisible
    "q30_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS disc_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q27_skew_join" ->
      """SELECT c_mktsegment, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // the PLAIN range join — the bucketed multi-probe rewrite must
    // reproduce it exactly
    "q29_range_join" ->
      """SELECT e.event_id AS error_id, e.user_id, count(*) AS n_nearby_clicks
        |FROM events e JOIN events c
        |  ON e.user_id = c.user_id
        | AND e.event_type = 'error' AND c.event_type = 'click'
        | AND abs(epoch_us(c.ts) - epoch_us(e.ts)) <= 300000000
        |GROUP BY 1, 2 ORDER BY error_id""".stripMargin,
    // replays the union+window as-of form and its tie-breaks exactly
    // (purchase-before-click at equal ts; greatest event_id among ties)
    "q28_asof_join" ->
      """WITH t AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us, value,
        |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |), m AS (
        |  SELECT event_id, user_id, us, kind,
        |    last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, kind, event_id
        |            ROWS UNBOUNDED PRECEDING) AS purchase_id,
        |    last_value(CASE WHEN kind = 0 THEN us END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, kind, event_id
        |            ROWS UNBOUNDED PRECEDING) AS p_us,
        |    last_value(CASE WHEN kind = 0 THEN value END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY us, kind, event_id
        |            ROWS UNBOUNDED PRECEDING) AS p_val
        |  FROM t
        |)
        |SELECT event_id AS click_id, user_id, purchase_id,
        |  us - p_us AS us_since_purchase, round(p_val, 2) AS purchase_value
        |FROM m WHERE kind = 1 ORDER BY click_id""".stripMargin,
    "q26_array_agg" ->
      """SELECT o_custkey,
        | array_to_string(list_sort(list_distinct(list(CAST(year(o_orderdate) AS INTEGER)))), ',') AS order_years,
        | count(*) AS n_orders
        |FROM orders WHERE o_custkey < 100
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q25_json" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        | CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // standard three-valued logic: a NULL in the NOT IN subquery must
    // zero the poisoned count in BOTH engines
    "q37_not_in_nulls" ->
      """SELECT
        | (SELECT count(*) FROM customer
        |   WHERE c_custkey NOT IN
        |     (SELECT o_custkey FROM orders WHERE o_custkey % 2 = 0)) AS n_clean,
        | (SELECT count(*) FROM customer
        |   WHERE c_custkey NOT IN
        |     (SELECT o_custkey FROM orders WHERE o_custkey % 2 = 0
        |      UNION ALL SELECT CAST(NULL AS BIGINT))) AS n_poisoned""".stripMargin,
    // the UNPARTITIONED table with the same filter: the partitioned
    // layout must be result-invisible
    "q36_partition_pruning" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS eday,
        | count(*) AS n_clicks,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events WHERE event_type = 'click'
        |GROUP BY eday ORDER BY eday""".stripMargin,
    // each event belongs to the 4 windows starting at its 15-min bucket
    // minus {0,15,30,45} min; time_bucket's 2000-01-01 origin sits on
    // the same 15-minute lattice as Spark's epoch-aligned grid
    "q35_sliding_window" ->
      """WITH e AS (
        |  SELECT event_type, time_bucket(INTERVAL '15 minutes', ts) AS f15
        |  FROM events
        |), w AS (
        |  SELECT event_type, f15 - to_minutes(o.off) AS ws
        |  FROM e, (SELECT unnest([0, 15, 30, 45]) AS off) o
        |)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
        |  count(*) AS n_events
        |FROM w GROUP BY ws, event_type ORDER BY w_start, event_type""".stripMargin,
    // hashes the ORIGINAL parquet text: the JSONL round-trip must be
    // byte-lossless to match
    "q34_jsonl_roundtrip" ->
      """SELECT doc_id, lang, md5(text) AS text_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // quantile_cont = Spark's exact percentile: both interpolate at
    // rank (n-1)*p per the SQL standard
    "q33_percentiles" ->
      """SELECT l_returnflag, count(*) AS n_items,
        | min(l_quantity) AS q_min,
        | round(quantile_cont(l_quantity, 0.5), 6) AS q_median,
        | round(quantile_cont(l_quantity, 0.95), 6) AS q_p95,
        | max(l_quantity) AS q_max
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // 'g' flag: DuckDB replaces first match only by default; Spark's
    // regexp_replace always replaces all
    "q32_mask_props" ->
      """SELECT event_id,
        | CAST(len(regexp_extract_all(props, '[0-9]+')) AS INTEGER) AS n_masked,
        | regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS masked
        |FROM events ORDER BY event_id""".stripMargin,
    "q23_correlated" ->
      """SELECT p_brand, count(*) AS n_small,
        | round(sum(l_extendedprice), 2) AS small_revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity)
        |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q24_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | CAST(quarter(o_orderdate) AS INTEGER) AS o_quarter,
        | count(*) AS n_items,
        | round(avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))), 4) AS avg_delay,
        | CAST(max(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS INTEGER) AS max_delay
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_year, o_quarter ORDER BY o_year, o_quarter""".stripMargin,
    "q18_part_promo" ->
      """SELECT p_brand,
        | round(sum(CASE WHEN p_type LIKE 'PROMO%'
        |   THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS promo_revenue,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q19_ntile" ->
      """SELECT o_orderpriority, CAST(ntile(4) OVER (
        |   PARTITION BY o_orderpriority
        |   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS quartile,
        | o_orderkey, o_totalprice
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_orderpriority, quartile, o_orderkey""".stripMargin,
    "q20_string_funcs" ->
      """SELECT p_brand, upper(substr(p_type, 1, 5)) AS type_prefix,
        | count(*) AS n_parts,
        | CAST(sum(length(p_name)) AS BIGINT) AS sum_name_len
        |FROM part
        |WHERE p_type LIKE 'SMALL%' AND regexp_matches(p_name, '[aeiou]{2}')
        |GROUP BY p_brand, type_prefix
        |ORDER BY p_brand, type_prefix""".stripMargin,
    "q21_union_all" ->
      """WITH parties AS (
        |  SELECT c_custkey AS party_key, 'customer' AS party_type, c_acctbal AS acctbal
        |  FROM customer
        |  UNION ALL
        |  SELECT s_suppkey, 'supplier', s_acctbal FROM supplier)
        |SELECT party_type, count(*) AS n_parties,
        | round(sum(acctbal), 2) AS sum_acctbal
        |FROM parties GROUP BY party_type ORDER BY party_type""".stripMargin,
    "q22_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | count(*) FILTER (o_orderpriority = '1-URGENT') AS prio_0,
        | count(*) FILTER (o_orderpriority = '2-HIGH') AS prio_1,
        | count(*) FILTER (o_orderpriority = '3-MEDIUM') AS prio_2,
        | count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS prio_3,
        | count(*) FILTER (o_orderpriority = '5-LOW') AS prio_4
        |FROM orders GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 6) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2001-06-01' AND l_discount > 0.08 AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_topk" ->
      """SELECT o_orderkey,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-03-01'
        |GROUP BY o_orderkey
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q06_outer_agg" ->
      """SELECT r_name, n_name, count(c_custkey) AS n_customers
        |FROM region
        |JOIN nation ON r_regionkey = n_regionkey
        |LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q07_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 2
        |ORDER BY o_custkey, rn""".stripMargin,
    "q08_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q09_intersect" ->
      """SELECT n_name FROM nation JOIN customer ON n_nationkey = c_nationkey
        |INTERSECT
        |SELECT n_name FROM nation JOIN supplier ON n_nationkey = s_nationkey
        |ORDER BY n_name""".stripMargin,
    "q10_except" ->
      """SELECT n_name FROM nation JOIN customer ON n_nationkey = c_nationkey
        |EXCEPT
        |SELECT n_name FROM nation JOIN supplier ON n_nationkey = s_nationkey
        |ORDER BY n_name""".stripMargin,
    "q11_rollup" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
        | count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY ROLLUP (o_year, o_orderpriority)
        |ORDER BY o_year ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q12_count_distinct" ->
      """SELECT o_orderpriority,
        | count(DISTINCT o_custkey) AS n_customers, count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // GROUPING() bit order: leftmost argument = MSB, same as Spark's
    // grouping_id()
    "q45_full_outer" ->
      """WITH early AS (
        |  SELECT o_custkey AS ck1, count(*) AS n_early FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-04-01' GROUP BY 1),
        |late AS (
        |  SELECT o_custkey AS ck2, count(*) AS n_late FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-04-01' GROUP BY 1)
        |SELECT coalesce(ck1, ck2) AS custkey,
        |  coalesce(n_early, 0) AS n_early,
        |  coalesce(n_late, 0) AS n_late
        |FROM early FULL OUTER JOIN late ON ck1 = ck2
        |ORDER BY custkey""".stripMargin,
    "q46_cross_join" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q48_gap_fill" ->
      """WITH bounds AS (
        |  SELECT min(date_trunc('day', o_orderdate)) AS d0,
        |         max(date_trunc('day', o_orderdate)) AS d1
        |  FROM orders),
        |cal AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |  FROM bounds),
        |daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day, count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT strftime(cal.day, '%Y-%m-%d') AS day,
        |  coalesce(daily.n, 0) AS n_orders
        |FROM cal LEFT JOIN daily ON cal.day = daily.day
        |ORDER BY day""".stripMargin,
    "q51_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.price_cents
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey % 100 = 0
        |ORDER BY c.c_custkey, price_cents DESC, o_orderkey""".stripMargin,
    // has_missing checks KEY EXISTENCE on both engines
    // (map_contains_key ↔ list_contains(json_keys)), never value-
    // nullness, so a literal "missing": null key cannot diverge.
    // n_keys/k_val rely on a documented corpus invariant: every props
    // value is an integral number (a non-bigint value would null the
    // whole Spark-side map — from_json is all-or-nothing per row —
    // while DuckDB's per-key json_keys/json_extract would not).
    "q50_map_funcs" ->
      """SELECT event_id,
        | CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
        | CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
        | CAST(list_contains(json_keys(props), 'missing') AS BOOLEAN) AS has_missing,
        | array_to_string(list_sort(json_keys(props)), ',') AS keys
        |FROM events ORDER BY event_id""".stripMargin,
    "q49_range_frame" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        | CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
        | count(*) OVER (PARTITION BY l_returnflag
        |   ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT)
        |   RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW) AS n_within_1k
        |FROM lineitem WHERE l_partkey % 200 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q47_limit_offset" ->
      """SELECT o_orderkey, o_custkey,
        | CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders
        |ORDER BY price_cents DESC, o_orderkey
        |LIMIT 20 OFFSET 40""".stripMargin,
    // the oracle reads the ORIGINAL parquet — the ORC format pair must
    // be value-invisible
    "q42_orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n_items,
        | round(sum(l_quantity), 2) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
        | strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS last_ship
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // re-derived from the source-of-truth documents table: v1 (even
    // ids) must appear with lang NULL, v2 (odd ids) with its lang
    "q65_avro_evolution" ->
      """SELECT CASE WHEN doc_id % 2 = 0 THEN NULL ELSE lang END AS lang,
        | count(*) AS n_docs,
        | CAST(sum(strlen(text)) AS BIGINT) AS bytes,
        | CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents
        |GROUP BY 1 ORDER BY lang NULLS FIRST""".stripMargin,
    "q64_unpivot" ->
      """SELECT measure, count(*) AS n_rows,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
        | round(min(value), 2) AS min_value,
        | round(max(value), 2) AS max_value
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity,
        |        l_extendedprice, l_discount, l_tax FROM lineitem)
        |  UNPIVOT (value FOR measure IN
        |    (l_quantity, l_extendedprice, l_discount, l_tax))
        |GROUP BY measure ORDER BY measure""".stripMargin,
    // oracle from the ORIGINAL parquet: the Avro composite round-trip
    // (array<float> + map + nested struct) must be lossless — norm was
    // computed pre-write and carried through the nested record,
    // norm_rt recomputed from the round-tripped floats; both must
    // equal this one derivation (same double fold as the engine's
    // dotBuiltin)
    "q66_avro_complex" ->
      """SELECT vec_id,
        | CAST(len(embedding) AS BIGINT) AS dim,
        | vec_id * 2 AS vid2,
        | CAST(len(embedding) AS INTEGER) AS n_dims,
        | round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |   list_transform(range(1, len(embedding) + 1),
        |     i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)),
        |   (x, y) -> x + y)), 6) AS norm,
        | round(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
        |   list_transform(range(1, len(embedding) + 1),
        |     i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)),
        |   (x, y) -> x + y)), 6) AS norm_rt
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // same: oracle from parquet, Avro pair must be lossless incl. the
    // long ids and micros
    "q63_avro_roundtrip" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(sum(event_id) AS BIGINT) AS id_sum,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
        | CAST(sum(len(props)) AS BIGINT) AS props_bytes
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // same: oracle from parquet, CSV pair must be lossless incl. micros
    "q43_csv_roundtrip" ->
      """SELECT event_type, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
        | strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
        | CAST(sum(len(props)) AS BIGINT) AS props_bytes
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q41_higher_order" ->
      """SELECT vec_id,
        | CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
        | round(list_max(CAST(embedding AS DOUBLE[])), 6) AS max_val,
        | round(list_sum(list_filter(CAST(embedding AS DOUBLE[]), x -> x > 0)), 4) AS pos_mass,
        | round(list_sum(list_transform(generate_series(1, len(embedding)),
        |   i -> CAST(embedding[i] AS DOUBLE) * embedding[len(embedding) + 1 - i])), 4) AS dot_rev
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q44_cube" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
        | count(*) AS n_items,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q39_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        | CAST(round(lag(o_totalprice, 1) OVER w * 100) AS BIGINT) AS prev_cents,
        | CAST(round(lead(o_totalprice, 1) OVER w * 100) AS BIGINT) AS next_cents,
        | strftime(first_value(o_orderdate) OVER w, '%Y-%m-%d') AS first_date,
        | CAST(round(nth_value(o_totalprice, 2) OVER w * 100) AS BIGINT) AS second_cents,
        | round(percent_rank() OVER wp, 6) AS pct_rank,
        | round(cume_dist() OVER wp, 6) AS cume
        |FROM orders WHERE o_custkey % 50 = 0
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wp AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q40_setops_all" ->
      """SELECT o_custkey, count(*) AS n, 'intersect_all' AS op
        |FROM ((SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |      INTERSECT ALL
        |      (SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')) t
        |GROUP BY o_custkey
        |UNION ALL
        |SELECT o_custkey, count(*) AS n, 'except_all' AS op
        |FROM ((SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |      EXCEPT ALL
        |      (SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')) t2
        |GROUP BY o_custkey
        |ORDER BY op, o_custkey""".stripMargin,
    "q31_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
        | count(*) AS n_orders,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q13_case_agg" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
        | CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q14_scalar_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer) * 1.5
        |ORDER BY c_custkey""".stripMargin,
    "q15_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        | event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin,
    "q16_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events)
        |SELECT user_id,
        | CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q17_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
    // session_window semantics: merge while next - prev < gap, so the
    // break condition is >= gap (q16's composed form breaks on > gap)
    "q38_session_window" ->
      """WITH l AS (
        |  SELECT user_id, ts, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |b AS (
        |  SELECT user_id, ts, us,
        |    CASE WHEN prev IS NULL OR us - prev >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM l),
        |sg AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM b)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS s_start,
        |  count(*) AS n_events
        |FROM sg GROUP BY user_id, sid
        |ORDER BY user_id, s_start""".stripMargin,
  )
}
