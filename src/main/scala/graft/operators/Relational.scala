package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Standard relational staples over the TPC-H-ish testdata, demonstrating the
  * general engine surface (scan → filter → join → agg → window → top-k).
  *
  * Money math policy: doubles are converted per-row to integer cents
  * (`round(x*100)::bigint` — exact, engine-portable) before aggregation, so
  * sums are order-independent exact integers and hash-compare cleanly against
  * DuckDB. Floating-point accumulation would differ in the last ulp between
  * engines/partitionings.
  *
  * Scale notes: fact-fact joins (lineitem⋈orders) shuffle on the join key and
  * benefit from AQE; true dimension tables (region/nation) are explicitly
  * broadcast; filters and column pruning are expressed so they reach the
  * parquet scan (verified via .explain in BenchSpec).
  */
object Relational {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("long")

  /** TPC-H Q1-flavored pricing summary: one-pass scan + hash agg.
    * Map-side partial aggregation; 6-row output.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("sum_disc_e4"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-flavored: segment filter → 3-way join → agg → top-10.
    * customer is filtered before the join (predicate pushdown to parquet);
    * AQE picks broadcast for the filtered side at small SF, shuffle join at
    * scale. Total order (revenue desc, orderkey) makes LIMIT deterministic.
    */
  def q3TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-flavored: revenue by nation where customer and supplier share
    * the nation (local supplier). nation is broadcast (true dimension);
    * customer/supplier co-shuffle with the facts.
    */
  def q5NationRevenue(spark: SparkSession, dir: String): DataFrame = {
    val n = broadcast(Tables.load(spark, dir, "nation"))
    val c = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val s = Tables.load(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, li("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(n, s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("revenue_e4"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** TPC-H Q7 volume shipping: revenue flowing between two fixed nations
    * (either direction), by supplier nation × customer nation × ship
    * year. The classic multi-join with a disjunctive nation predicate;
    * both nation lookups broadcast, the pair filter applies before the
    * aggregation so only cross-border rows reach the year rollup, and
    * money stays integer-e4. First consumer of `l_shipdate` on the query
    * surface.
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val (na, nb) = ("NATION_1", "NATION_2")
    // The disjunctive pair predicate implies supp_nation ∈ {na, nb} AND
    // cust_nation ∈ {na, nb} — a conjunctive filter the optimizer cannot
    // derive (it would need constraint inference across a disjunction of
    // conjunctions over two relations), applied here to the nation lookup
    // BEFORE the dimension joins (the standard TPC-H Q7 plan): supplier
    // and customer shrink to the two nations' members (2/|nation| of the
    // rows), so the inner joins drop ~92% of lineitem/orders rows before
    // the fact-fact shuffle instead of after every join. The pair
    // disjunction still applies below — only the row set it filters is
    // pre-pruned; inner joins commute with the implied filter, so the
    // result is identical.
    val n = Tables.load(spark, dir, "nation").select("n_nationkey", "n_name")
      .where(col("n_name").isin(na, nb))
    val s = Tables.load(spark, dir, "supplier")
      .select("s_suppkey", "s_nationkey")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_nationkey")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey")
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate")
    // Join order: the two filtered dimensions attach FIRST (AQE sees their
    // post-filter sizes and broadcasts them), so both fact relations are
    // pruned to the two nations' rows before the single fact-fact
    // orderkey shuffle — lineitem and orders each cross the network once,
    // at ~2/|nation| of their volume.
    val oc = o.join(c, col("o_custkey") === col("c_custkey"))
    li.join(s, col("l_suppkey") === col("s_suppkey"))
      .join(oc, col("l_orderkey") === col("o_orderkey"))
      .where((col("supp_nation") === na && col("cust_nation") === nb) ||
        (col("supp_nation") === nb && col("cust_nation") === na))
      .withColumn("l_year", year(col("l_shipdate")).cast("long"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(cents(col("l_extendedprice")) *
        (lit(100L) - cents(col("l_discount")))).as("revenue_e4"),
        count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Semi-join (EXISTS): orders having at least one high-quantity lineitem,
    * counted per priority. left_semi avoids materializing the join fan-out.
    */
  def qSemiHighQty(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val hi = Tables.load(spark, dir, "lineitem")
      .where(col("l_quantity") > 45).select("l_orderkey")
    o.join(hi, o("o_orderkey") === hi("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Anti-join (NOT EXISTS): customers with no high-value (>300k) order,
    * per market segment. The filter is pushed below the anti-join build side.
    */
  def qAntiNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_totalprice") > 300000.0).select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Window function: top-3 orders per customer by totalprice.
    * Single shuffle on o_custkey; rank ties broken by orderkey (total order).
    */
  def qWindowTop3(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("totalprice_cents"),
        row_number().over(w).as("rk"))
      .where(col("rk") <= 3)
      .orderBy("o_custkey", "rk")
  }

  /** Tumbling 5-minute event-time window aggregation over the events stream
    * table — the batch shape of a streaming `groupBy(window(...))`. Bucket
    * arithmetic is integer epoch-ms division (portable).
    */
  def qEventsTumbling(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.select(col("event_type"),
        Tables.epochMsBucket(300000L).as("bucket"),
        cents(col("value")).as("value_cents"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"), sum("value_cents").as("sum_value_cents"))
      .orderBy("event_type", "bucket")
  }

  /** Rollup aggregation with grouping labels coalesced to 'ALL' (no NULLs
    * in output — Spark/DuckDB null ordering differs). Demonstrates
    * grouping-set machinery (partial aggregation per grouping set).
    */
  def qRollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(cents(col("l_extendedprice"))).as("base_cents"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(
        when(col("g_rf") === 1, "ALL").otherwise(col("l_returnflag")).as("returnflag"),
        when(col("g_ls") === 1, "ALL").otherwise(col("l_linestatus")).as("linestatus"),
        col("n"), col("base_cents"))
      .orderBy("returnflag", "linestatus")
  }

  /** lag/lead windowing: each event with its user's previous and next
    * event ids (session-reconstruction primitive). Single shuffle on
    * user_id; '' (not NULL) at sequence edges for portable ordering.
    */
  def qLagEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(Tables.epochMs, col("event_id"))
    ev.select(col("event_id"), col("user_id"),
        coalesce(lag(col("event_id"), 1).over(w), lit(-1L)).as("prev_event_id"),
        coalesce(lead(col("event_id"), 1).over(w), lit(-1L)).as("next_event_id"))
      .orderBy("event_id")
  }

  /** Burst-leading-event dedup (telemetry debounce): within each
    * (user, event_type) timeline, an event is KEPT iff it is ≥ 60 s after
    * its predecessor — i.e. the first event of each activity burst — and
    * repeats inside a burst are dropped, the standard click/telemetry
    * de-noising pass before any funnel or retention metric. (True
    * timeout-debounce relative to the last KEPT event needs a stateful
    * scan; the burst-leader rule is the window-expressible form and the
    * one analytics pipelines actually run.) Per event type: event count,
    * kept count, drop permille. One keyed window, one aggregation.
    */
  def qEventDebounce(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("tms"), col("event_id"))
    Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        Tables.epochMs.as("tms"))
      .withColumn("gap", col("tms") - lag(col("tms"), 1).over(w))
      .withColumn("kept",
        when(col("gap").isNull || col("gap") >= 60000L, 1L).otherwise(0L))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum(col("kept")).as("n_kept"))
      .withColumn("drop_permille",
        expr("(n_events - n_kept) * 1000 div n_events"))
      .orderBy("event_type")
  }

  /** Distinct aggregation: exact distinct users + event count per type. */
  def qDistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  /** Full cube over (returnflag, linestatus) — all four grouping sets in one
    * pass (vs [[qRollupRevenue]]'s hierarchy). Same no-NULL label policy.
    */
  def qCubeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("sum_qty"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .select(
        when(col("g_rf") === 1, "ALL").otherwise(col("l_returnflag")).as("returnflag"),
        when(col("g_ls") === 1, "ALL").otherwise(col("l_linestatus")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")
  }

  /** ntile bucketing: value quartile of each event within its type. The
    * window order is total (value, event_id) so bucket boundaries are
    * deterministic; one shuffle on event_type.
    */
  def qNtileQuartile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    ev.select(col("event_id"), col("event_type"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("event_id")
  }

  /** Fixed-width value histogram: 20 buckets over value∈[0,1), overflow
    * clamped to the last bucket. A pure map + one partial-aggregated groupBy
    * — the O(corpus) shape for distribution profiling at any scale.
    */
  def qValueHistogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.select(least(floor(col("value") * 20).cast("long"), lit(19L)).as("bucket"),
        cents(col("value")).as("value_cents"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("value_cents").as("sum_value_cents"))
      .orderBy("bucket")
  }

  /** RANGE-frame rolling aggregate: each event's 10-minute trailing spend
    * per user. RANGE (not ROWS) semantics — all peer rows at the same
    * timestamp are in-frame regardless of tie order, so the result is
    * deterministic without a total sort order. One shuffle on user_id.
    */
  def qRollingSum(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        Tables.epochMs.as("em"), cents(col("value")).as("v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("em"))
      .rangeBetween(-600000L, 0L)
    ev.select(col("event_id"), col("user_id"), col("em"),
        sum(col("v")).over(w).as("roll_cents"))
      .orderBy("event_id")
  }

  /** Set difference (EXCEPT): users with a high-value purchase (≥ 90) but
    * no high-value click. `Dataset.except` compiles to a hash anti-join on
    * the distinct sets — the same aggregate-then-anti shape you'd
    * hand-write at scale. The value predicate (not bare event types, which
    * every user at this scale has) keeps the difference non-empty, so the
    * oracle contract pins real rows.
    */
  def qExceptUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val bigPurchase = ev.where(col("event_type") === "purchase" && col("value") >= 90)
      .select(col("user_id")).distinct()
    val bigClick = ev.where(col("event_type") === "click" && col("value") >= 90)
      .select(col("user_id")).distinct()
    bigPurchase.except(bigClick).orderBy("user_id")
  }

  /** Changelog compaction (CDC upsert shape): latest event per
    * (user_id, event_type), latest = max ts then max event_id. At scale this
    * is the standard "compact a change stream to a snapshot" job — one
    * shuffle on the key, max_by semantics via window rank; with bucketed
    * layout ([[graft.sources.Bucketing]]) even that shuffle disappears.
    */
  def qLatestSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(Tables.epochMs.desc, col("event_id").desc)
    ev.select(col("user_id"), col("event_type"), col("event_id"),
        Tables.epochMs.as("em"), cents(col("value")).as("value_cents"),
        row_number().over(w).as("rk"))
      .where(col("rk") === 1).drop("rk")
      .orderBy("user_id", "event_type")
  }

  /** Keep-first dedup by key: each user's earliest event of each type —
    * the keep-canonical half of dedup (vs [[qLatestSnapshot]]'s keep-latest).
    */
  def qDedupFirstEvent(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(Tables.epochMs, col("event_id"))
    ev.select(col("user_id"), col("event_type"), col("event_id"),
        Tables.epochMs.as("em"),
        row_number().over(w).as("rk"))
      .where(col("rk") === 1).drop("rk")
      .orderBy("user_id", "event_type")
  }

  /** SCD-2 interval build from the event changelog: per user, collapse
    * consecutive events with an unchanged attribute (event_type) and emit
    * validity intervals `[valid_from_ms, valid_to_ms)` with −1 marking the
    * open (current) interval — the standard changelog→slowly-changing-
    * dimension compaction every warehouse runs over CDC feeds.
    *
    * Two window passes, BOTH partitioned by user_id — Catalyst plans one
    * exchange and reuses the sort, so the whole build is a single shuffle
    * + linear per-user scans regardless of history depth. The change
    * filter runs before the interval window, so the second pass scans the
    * compacted relation (bounded by true attribute changes, not raw event
    * volume).
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("em"), col("event_id"))
    val changed = ev
      .select(col("user_id"), col("event_type"), col("event_id"),
        Tables.epochMs.as("em"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(wOrd))
      .where(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    changed
      .withColumn("valid_to_ms",
        coalesce(lead(col("em"), 1).over(wOrd), lit(-1L)))
      .select(col("user_id"), col("event_type"),
        col("em").as("valid_from_ms"), col("valid_to_ms"),
        (col("valid_to_ms") === -1L).cast("long").as("is_current"))
      .orderBy("user_id", "valid_from_ms")
  }

  /** Zone-map (data-skipping) audit over the events table: per 512-row
    * zone of event ids, the min/max event-time bounds, row count, and the
    * pruning verdict for a fixed predicate `em ≥ t0 + 20 days` — `skip`
    * (zone's max below the cut: the scan never opens it), `full` (min at
    * or above: no per-row filtering needed), `partial` (rows must be
    * tested), plus the actual matching rows as the verdict's ground truth.
    *
    * This is the file/row-group statistics mechanism that makes 100 TB
    * scans affordable (parquet row-group min/max, Iceberg/Delta file
    * stats): the audit quantifies what fraction of zones a time predicate
    * prunes when ingest order correlates with event time. One map to
    * assign zones + one partial-aggregated groupBy; the t0 anchor is a
    * broadcast scalar.
    */
  def qZonemapPrune(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(expr("event_id div 512").as("zone_id"), Tables.epochMs.as("em"))
    val t0 = ev.agg(min(col("em")).as("t0"))
    ev.crossJoin(broadcast(t0))
      .withColumn("cut", col("t0") + lit(20L * 86400000L))
      .groupBy("zone_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("em")).as("min_em"), max(col("em")).as("max_em"),
        sum(when(col("em") >= col("cut"), 1L).otherwise(0L)).as("n_match"),
        max(col("cut")).as("cut"))
      .select(col("zone_id"), col("n_rows"), col("min_em"), col("max_em"),
        col("n_match"),
        when(col("max_em") < col("cut"), "skip")
          .when(col("min_em") >= col("cut"), "full")
          .otherwise("partial").as("verdict"))
      .orderBy("zone_id")
  }

  /** Hopping (sliding) window counts via Spark's native `window()` with a
    * 10-minute width and 5-minute slide — each event lands in exactly two
    * windows. The generator explodes to width/slide rows per event BEFORE
    * the aggregation, so partial aggregation still map-side combines; window
    * starts are epoch-aligned integers on both engines.
    */
  def qEventsHopping(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.select(col("event_type"),
        window(timestamp_millis(Tables.epochMs), "600 seconds", "300 seconds")
          .as("w"))
      .select(col("event_type"),
        (unix_timestamp(col("w.start")) * 1000).as("window_start_ms"))
      .groupBy("event_type", "window_start_ms")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "window_start_ms")
  }

  /** Full-outer join: daily click vs purchase counts aligned on the day
    * bucket — days with only one side survive with zero-filled counts
    * (coalesce keeps the output NULL-free for portable ordering).
    */
  def qFullOuterDaily(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), Tables.epochMsBucket(86400000L).as("day"))
    val clicks = ev.where(col("event_type") === "click")
      .groupBy("day").agg(count(lit(1)).as("n_clicks"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy("day").agg(count(lit(1)).as("n_purchases"))
    clicks.join(purchases, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"))
      .orderBy("day")
  }

  /** Set intersection (INTERSECT): users who both clicked and purchased. */
  def qIntersectUsers(spark: SparkSession, dir: String): DataFrame =
    // ONE scan + ONE user-keyed exchange: conditional flags aggregated per
    // user (map-side combined), intersection = both flags set. The former
    // two-distinct-scans + INTERSECT shape paid two scans and three
    // exchanges — and was the isolated suspect in a reproducible sf1.0
    // box-state drift (r13 verdict: 0.71 → ~1.9 s, code exonerated by A/B;
    // this rewrite retires the pattern rather than chasing the box).
    Tables.load(spark, dir, "events")
      .where(col("event_type").isin("click", "purchase"))
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .where(col("c") === 1L && col("p") === 1L)
      .select("user_id").orderBy("user_id")

  /** dense_rank with ties preserved: top-2 retail-price ranks per brand —
    * unlike row_number, price ties share a rank and ALL tied parts survive,
    * so the cut is value-deterministic without a tie-break column.
    */
  def qDenseRankBrand(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
    p.select(col("p_brand"), col("p_partkey"),
        cents(col("p_retailprice")).as("price_cents"),
        dense_rank().over(w).cast("long").as("rk"))
      .where(col("rk") <= 2)
      .orderBy("p_brand", "rk", "p_partkey")
  }

  /** Hot-key-safe exact distinct count via [[Skew.saltedCountDistinct]]
    * (two-phase: distinct within hash-disjoint salt partitions, then sum).
    * Semantically identical to [[qDistinctUsers]]'s countDistinct — the
    * oracle is the plain GROUP BY, so the salted rewrite is driver-verified.
    */
  def qSkewDistinct(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedCountDistinct(Tables.load(spark, dir, "events"),
        "event_type", col("user_id"), salt = 8)
      .orderBy("event_type")

  /** Exact iceberg / heavy-hitter query: users whose event count exceeds
    * 1.2× the per-user average (a scale-invariant threshold). Two hash
    * aggregations — per-user counts, then one global row broadcast back —
    * never a sort of the full relation; the output is only the tip of the
    * iceberg. Integer cross-multiplication avoids division.
    */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.load(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    val totals = perUser.agg(sum(col("n_events")).as("total"),
      count(lit(1)).as("n_users"))
    perUser.crossJoin(broadcast(totals))
      .where(col("n_events") * col("n_users") * 10 > col("total") * 12)
      .select(col("user_id"), col("n_events"),
        expr("n_events * 1000 div total").as("permille"))
      .orderBy("user_id")
  }

  /** Distribution-position windows: percent_rank and cume_dist of each
    * part's price within its brand. The window order is an integer total
    * order (cents, tie-broken by key) so ranks are unambiguous, and both
    * outputs are single IEEE divisions of those ranks — bit-identical
    * cross-engine.
    */
  def qPercentRank(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .select(col("p_brand"), col("p_partkey"),
        cents(col("p_retailprice")).as("price_cents"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("price_cents"), col("p_partkey"))
    p.select(col("p_brand"), col("p_partkey"), col("price_cents"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("p_brand", "price_cents", "p_partkey")
  }

  /** 2-D skyline (pareto front): parts no other part beats on BOTH cheaper
    * price and larger size (strict dominance). A part survives iff no
    * strictly-cheaper part has size ≥ its own AND no equal-price part has a
    * strictly larger size.
    *
    * The prefix-max over the global price order is computed DISTRIBUTED:
    * coarse price buckets get a per-bucket running max (window partitioned
    * by bucket), and cross-bucket carry-in is a cumulative max over the
    * bucket aggregates — a relation bounded by the price-range/bucket-width
    * ratio, not by row count (same two-level scan as
    * [[graft.operators.Ranking]]; no global single-task window).
    */
  def qSkylineParts(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(spark, dir, "part")
      .select(col("p_partkey"), cents(col("p_retailprice")).as("price_c"),
        col("p_size").cast("long").as("sz"))
      .withColumn("b", expr("price_c div 10000"))
    // within-bucket strict-prefix max over price (RANGE .. 1 PRECEDING)
    val wLocal = Window.partitionBy("b").orderBy("price_c")
      .rangeBetween(Window.unboundedPreceding, -1)
    // cross-bucket carry-in: cumulative max over earlier buckets (tiny)
    val bAgg = p.groupBy("b").agg(max(col("sz")).as("bmax"))
    val wB = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    val carry = bAgg.withColumn("cmax", max(col("bmax")).over(wB)).drop("bmax")
    val wSame = Window.partitionBy("price_c")
    p.join(carry, Seq("b"), "left")
      .withColumn("prevmax",
        greatest(coalesce(max(col("sz")).over(wLocal), lit(-1L)),
          coalesce(col("cmax"), lit(-1L))))
      .withColumn("pmax", max(col("sz")).over(wSame))
      .where(col("prevmax") < col("sz") && col("pmax") === col("sz"))
      .select(col("p_partkey"), col("price_c"), col("sz"))
      .orderBy("price_c", "p_partkey")
  }

  /** Unpivot (melt): daily wide metrics — event count, distinct users,
    * value cents — folded to long form with `stack`, the inverse of
    * `q_pivot_events`. Unpivot is a zero-shuffle projection (each input
    * row fans out map-side), so the plan is the aggregation's plus a
    * generate node.
    */
  def qUnpivotDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(Tables.epochMsBucket(86400000L).as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(cents(col("value"))).as("value_cents"))
      .selectExpr("day",
        "stack(3, 'n_events', n_events, 'n_users', n_users, " +
          "'value_cents', value_cents) AS (metric, val)")
      .orderBy("day", "metric")

  /** TPC-H Q22-flavored: well-funded customers (balance above the global
    * positive-balance average — a scalar subquery) with no URGENT order
    * (filtered anti join), counted per market segment. Combines the two
    * decorrelation patterns in one plan: the scalar aggregate broadcasts
    * as a 1-row relation, the NOT EXISTS stays a BroadcastHashJoin
    * LeftAnti at this scale and a shuffled anti join at 100 TB.
    */
  def qRichIdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        cents(col("c_acctbal")).as("bal_c"))
    val avgBal = c.where(col("bal_c") > 0)
      .agg(expr("sum(bal_c) div count(1)").as("avg_bal_c"))
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    c.crossJoin(broadcast(avgBal))
      .where(col("bal_c") > col("avg_bal_c"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), sum(col("bal_c")).as("total_bal_c"))
      .orderBy("c_mktsegment")
  }

  /** Hour-of-day seasonality: event and value volumes per UTC hour — the
    * capacity-planning readout. Integer hour from epoch-ms; one partial
    * agg, 24-row output.
    */
  def qHourlySeasonality(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select((Tables.epochMsBucket(3600000L) % 24).as("hour"),
        col("event_type"), cents(col("value")).as("vc"))
      .groupBy("hour")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(col("vc")).as("value_cents"))
      .orderBy("hour")

  /** Single-pass data-quality profile of the events table — the
    * ingest-gate report: row/distinct/null/empty counts, value bounds in
    * cents, timestamp bounds in epoch-ms. One scan, one global aggregate
    * (map-side combined); every number integer-exact.
    */
  def qProfileEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("event_id")).as("n_distinct_ids"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        sum(col("props").isNull.cast("long")).as("n_null_props"),
        sum((length(col("props")) === 0).cast("long")).as("n_empty_props"),
        sum((col("value") < 0).cast("long")).as("n_negative_values"),
        min(cents(col("value"))).as("min_value_cents"),
        max(cents(col("value"))).as("max_value_cents"),
        min(Tables.epochMs).as("min_ts_ms"),
        max(Tables.epochMs).as("max_ts_ms"))

  /** JSON property extraction: per-event-type stats of the numeric `k`
    * field inside the `props` JSON column — the get_json_object scalar
    * surface. Pure map + partial agg; the JSON parse is codegen'd and never
    * leaves the scan stage.
    */
  def qPropsK(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .withColumn("avg_k", expr("sum_k div n"))
      .orderBy("event_type")

  /** Top-3 parts per brand by retail price — via the custom
    * [[graft.functions.TopKAgg]] bounded-heap aggregate instead of the
    * window-rank idiom ([[qDenseRankBrand]] is the window twin on the same
    * table). The window plan shuffles and sorts EVERY part row inside its
    * brand partition; this plan partial-aggregates an O(k) heap map-side,
    * so the exchange carries ≤ 3 rows per brand no matter the corpus size
    * — the shape that survives a 100 TB part table. The tag is the
    * zero-padded partkey so string order == numeric order and score ties
    * break deterministically; the driver oracle replays the window form,
    * proving the two idioms equivalent.
    */
  def qTopkParts(spark: SparkSession, dir: String): DataFrame = {
    val top = graft.functions.TopKAgg.topK(
      cents(col("p_retailprice")),
      lpad(col("p_partkey").cast("string"), 10, "0"), 3)
    Tables.load(spark, dir, "part")
      .groupBy(col("p_brand"))
      .agg(top.as("top"))
      .select(col("p_brand"), posexplode(col("top")))
      .select(col("p_brand"), (col("pos") + 1).cast("long").as("rk"),
        col("col.score").as("price_cents"),
        col("col.tag").cast("long").as("p_partkey"))
      .orderBy("p_brand", "rk")
  }
}
