package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps
import graft.sources.Tables

/** Second-wave analytics operators: the staples a training-data /
  * clickstream pipeline needs beyond the reference's own surface — as-of
  * joins, pivots, exact distributed quantiles, share-of-total, n-gram
  * frequency, tf-idf term ranking, hyperplane-LSH similarity, and interval
  * overlap counting.
  *
  * Same engine-portability policy as everywhere else: integer-exact outputs
  * (or single-op doubles), no engine-specific hashes, total ORDER BY.
  */
object Analytics {

  /** As-of join: each purchase event matched to the user's most recent view
    * at-or-before it (ties on timestamp → highest event_id).
    *
    * Implemented with the union+window trick instead of a range join: tag
    * both streams, sort each user's timeline once, and carry the latest view
    * forward with `last(..., ignoreNulls)`. ONE shuffle on user_id, linear
    * scan per user — no per-row binary search, no range-join candidate
    * blowup. This is the canonical scalable as-of shape; a point-in-time
    * feature lookup at 100 TB works the same way.
    */
  def asofLastView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .where(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"),
        Tables.epochMs.as("em"), col("event_type"))
      .withColumn("is_view", (col("event_type") === "view").cast("int"))
    // views sort before purchases at equal timestamps so a same-ms view
    // is visible to the purchase (ASOF semantics: vem <= pem)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("em").asc, col("is_view").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("view_event_id",
        last(when(col("is_view") === 1, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("view_ms",
        last(when(col("is_view") === 1, col("em")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("em").as("purchase_ms"),
        coalesce(col("view_event_id"), lit(-1L)).as("view_event_id"),
        coalesce(col("view_ms"), lit(-1L)).as("view_ms"))
      .orderBy("event_id")
  }

  /** Pivot: event counts per (user bucket × event type) — wide output with
    * one column per type. Spark's `pivot` with explicit values compiles to a
    * single hash aggregation (no per-column scans).
    */
  def pivotEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.select((col("user_id") % 8).as("bucket"), col("event_type"))
      .groupBy("bucket")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("bucket")
  }

  /** The percentile_disc scaffold shared by every exact-quantile operator
    * here (quantityPercentiles, approxQuantile, iqrOutliers, madOutliers,
    * timeToConvert): rows get `rn` = row_number within `group` ordered by
    * `value`, and `n` = the group count via a broadcast join; callers read
    * a percentile off `min(when(rn === <rank expr>, value))`. ONE home for
    * the construction so the rank formulas can't drift between operators.
    */
  private def rankedWithCounts(df: DataFrame, group: String, value: String): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(col(value))
    df.withColumn("rn", row_number().over(w))
      .join(broadcast(df.groupBy(group).agg(count(lit(1)).as("n"))), group)
  }

  /** Exact distributed quantiles (p25/p50/p90 of l_quantity per returnflag)
    * via sort + row_number — the deterministic engine-portable form of
    * `percentile_disc` (value at 1-based rank ⌈p·n⌉, computed with integer
    * ceiling division so both engines agree bit-for-bit).
    *
    * Scale: one shuffle to sort within groups; group counts are a tiny
    * broadcast. For quantiles over a *single* giant group, swap in
    * `approx_percentile` (t-digest) — exact ranks would need a global sort.
    */
  def quantityPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
    rankedWithCounts(li, "l_returnflag", "q")
      .groupBy("l_returnflag")
      .agg(
        min(when(col("rn") === expr("(n + 3) div 4"), col("q"))).as("p25"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("q"))).as("p50"),
        min(when(col("rn") === expr("(9 * n + 9) div 10"), col("q"))).as("p90"),
        max(col("q")).as("qmax"),
        min(col("n")).as("n"))
      .orderBy("l_returnflag")
  }

  /** Share-of-total (TPC-H Q14 flavored): revenue per part type with its
    * permille share of total revenue. `part` is a true dimension →
    * explicit broadcast; the share is an unpartitioned window over the
    * per-p_type aggregate — bounded by the p_type domain (150 values in
    * TPC-H), a dimension cardinality, never event volume.
    */
  def promoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"))
    val p = broadcast(Tables.load(spark, dir, "part").select("p_partkey", "p_type"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_type")
      .agg(sum(col("rev_e4")).as("revenue_e4"), count(lit(1)).as("n_items"))
      .withColumn("share_permille",
        expr("revenue_e4 * 1000 div sum(revenue_e4) OVER ()"))
      .orderBy("p_type")
  }

  /** Funnel analysis: how far each user progresses through
    * view → click → purchase (in event-time order, other events ignored) —
    * subsequence semantics, computed with O(1) state per user via the
    * greedy earliest-first match (optimal for subsequence inclusion):
    * kv = first view, kc = first click after kv, stage 3 ⇔ any purchase
    * after kc. Each milestone is a constant-size conditional min/max
    * aggregate over one user_id partitioning — bounded reducer state at
    * ANY per-user event volume, where a collect-the-journey aggregation
    * would hand a bot account's millions of events to one reducer as a
    * single unbounded in-memory group (the oracle keeps the equivalent
    * string_agg + regex form, fine at oracle scale).
    */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    // ONE pass over events, O(1) aggregation state per user (round 19; the
    // round-18 collect_list(struct(k, t)) gather handed a hot user's whole
    // event history to one aggregation buffer — the exact unbounded-state
    // shape the audit below forbids). The greedy milestones are three
    // CONDITIONAL MIN/MAX aggregates, constant-size each, split across the
    // one user_id partitioning the query needs anyway:
    //   kv = min view key — a user_id-partitioned window aggregate (its
    //        per-row result feeds the click predicate; WindowExec's row
    //        buffer is disk-spillable, its aggregation state is one key);
    //   kc = min click key strictly after kv (null kv ⇒ null-compare ⇒
    //        FALSE predicate ⇒ null kc, exactly the former inner-join
    //        short-circuit) — a groupBy aggregate on the partitioning the
    //        window just established, so no second events shuffle;
    //   stage 3 ⇔ any purchase strictly after kc ⇔ max purchase key > kc
    //        (kc is the MIN click after kv, so any qualifying purchase
    //        exceeds it iff the max one does; null kc/kp compare ⇒ null ⇒
    //        when() falls through). Same integers as the oracle's greedy
    //        v.*c.*p regex over the (epoch_ms, event_id)-ordered journey,
    //        one scan, one events shuffle + the stage rollup.
    val e = Tables.load(spark, dir, "events")
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type").as("t"),
        struct(Tables.epochMs.as("em"), col("event_id").as("eid")).as("k"))
    val byUser = Window.partitionBy("user_id")
    e.withColumn("kv", min(when(col("t") === "view", col("k"))).over(byUser))
      .groupBy("user_id")
      .agg(max(col("kv")).as("kv"),
        min(when(col("t") === "click" && col("k") > col("kv"), col("k")))
          .as("kc"),
        max(when(col("t") === "purchase", col("k"))).as("kp"))
      .select(
        when(col("kp") > col("kc"), 3L)
          .when(col("kc").isNotNull, 2L)
          .when(col("kv").isNotNull, 1L)
          .otherwise(0L).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  /** Statistical moments as EXACT integers: n, Σx, Σy, Σxy, Σx², Σy² over
    * (quantity, whole-dollar price) — everything a correlation/regression
    * needs, but order-independent int64 sums that hash-compare across
    * engines (a float `corr()` differs in the last ulp between engines and
    * partitionings). The caller derives r or β from the moments. Dollars,
    * not cents: y² ≈ 1.2·10¹⁰ at dollar scale (vs 10¹⁴ in cents), so Σy²
    * holds ~7·10⁸ rows per group before int64 wraps — enough for the test
    * scales and typical group cardinalities, NOT for 10¹¹-row groups: at
    * that size production shifts y by the group mean first (one extra
    * pass) or sums into DECIMAL(38,0), both engine-portable.
    */
  def corrMoments(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice")).cast("long").as("y"))
    li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("x").as("sum_x"), sum("y").as("sum_y"),
        sum(col("x") * col("y")).as("sum_xy"),
        sum(col("x") * col("x")).as("sum_x2"),
        sum(col("y") * col("y")).as("sum_y2"))
      .orderBy("l_returnflag")
  }

  /** String similarity via edit distance: Levenshtein between each doc's
    * 32-char prefix and a fixed probe phrase (standard DP, identical in
    * Spark and DuckDB). Map-only — the per-pair form plugs the same
    * function into any candidate join.
    */
  def editDistance(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        levenshtein(substring(col("text"), 1, 32),
          lit("the quick brown fox jumps over")).cast("long").as("edit_dist"))
      .orderBy("doc_id")

  /** RFM segmentation: per-user recency (last-activity ms), frequency
    * (event count), monetary (integer cents), each scored into quintiles.
    * The per-user relation is corpus-scale at 100 TB, so the quintiles come
    * from [[Ranking.withGlobalNtile]] (distributed exact global ntile —
    * range partition + local rank + broadcast offsets), never from a
    * single-task global window.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val perUser = ev.groupBy("user_id")
      .agg(max(Tables.epochMs).as("last_ms"),
        count(lit(1)).as("frequency"),
        sum(round(col("value") * 100).cast("long")).as("monetary_cents"))
    val r = Ranking.withGlobalNtile(perUser, 5, "r_score",
      col("last_ms"), col("user_id"))
    val f = Ranking.withGlobalNtile(r, 5, "f_score",
      col("frequency"), col("user_id"))
    val m = Ranking.withGlobalNtile(f, 5, "m_score",
      col("monetary_cents"), col("user_id"))
    m.select("user_id", "last_ms", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score")
      .orderBy("user_id")
  }

  /** Pareto concentration: the event-count share (permille) of the top-20%
    * highest-spending users — the 80/20 check. Rank by exact integer spend
    * (ties broken by user_id), cut at ⌈n/5⌉, integer-division share.
    */
  def paretoShare(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val perUser = ev.groupBy("user_id")
      .agg(sum(round(col("value") * 100).cast("long")).as("spend_cents"),
        count(lit(1)).as("n_events"))
    // distributed exact global rank (see Ranking) — also yields n for free
    val (ranked, n) = Ranking.withGlobalRowNumber(perUser, "rk",
      col("spend_cents").desc, col("user_id"))
    val cut = (n + 4) / 5
    ranked.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("rk") <= cut, col("n_events")).otherwise(0L))
          .as("top20_events"),
        sum(col("n_events")).as("total_events"),
        sum(when(col("rk") <= cut, col("spend_cents")).otherwise(0L))
          .as("top20_cents"),
        sum(col("spend_cents")).as("total_cents"))
      .select(col("n_users"), col("top20_events"), col("total_events"),
        expr("top20_events * 1000 div total_events").as("event_share_permille"),
        expr("top20_cents * 1000 div total_cents").as("spend_share_permille"))
  }

  /** Approximate-quantile sketch with a CHECKED accuracy contract (the
    * `q_approx_distinct` pattern for the percentile family): per event
    * type, the exact integer-cents median plus a flag asserting Spark's
    * t-digest `approx_percentile` landed within 1% of it. The estimate
    * itself is engine-specific and never emitted; the oracle pins the flag,
    * so sketch accuracy is part of the hash-checked contract.
    *
    * The band is `|approx − exact| · 100 ≤ |exact|` — the absolute value on
    * the right keeps the band's width positive when the exact median is
    * negative (events.value can be negative). An exact median of 0 makes
    * the relative band zero-width, so that case — and ONLY that case —
    * falls back to a 1-cent absolute tolerance (the sketch's rank error at
    * accuracy 10000 is a couple of ranks, i.e. a cent or two around a zero
    * median). Gating the fallback on zero keeps `within_1pct` meaning
    * exactly that for every nonzero median, however small.
    */
  def approxQuantile(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
    // exact median via rank ⌈(n+1)/2⌉ against a joined per-group count
    val exact2 = rankedWithCounts(ev, "event_type", "v").groupBy("event_type")
      .agg(min(when(col("rn") === expr("(n + 1) div 2"), col("v"))).as("p50_exact"),
        min(col("n")).as("n"))
    val approx = ev.groupBy("event_type")
      .agg(expr("approx_percentile(v, 0.5, 10000)").as("p50_approx"))
    exact2.join(approx, "event_type")
      .select(col("event_type"), col("n"), col("p50_exact"),
        // the 1-cent absolute tolerance applies ONLY at an exact-zero
        // median (where the relative band is zero-width); everywhere
        // else the flag means what its name says: within 1% relative
        when(col("p50_exact") === 0,
          abs(col("p50_approx") - col("p50_exact")) <= 1)
          .otherwise(
            abs(col("p50_approx") - col("p50_exact")) * 100 <= abs(col("p50_exact")))
          .cast("long").as("within_1pct"))
      .orderBy("event_type")
  }

  /** Gini coefficient of per-user spend (inequality of the spend
    * distribution, permille): `G = (2·Σ rk·x − (n+1)·Σx) · 1000 ÷ (n·Σx)`
    * over spend ranked ascending. The rank comes from
    * [[Ranking.withGlobalRowNumber]] (distributed exact global rank — no
    * single-task window), everything else is one integer aggregation.
    *
    * Per-user spend is clamped to ≥ 0 (events.value can be negative): the
    * Gini formula assumes a non-negative distribution, and the clamp also
    * guarantees both `div` operands are non-negative — DuckDB's `//` floors
    * while Spark's `div` truncates toward zero, so a negative quotient would
    * round differently in the two engines.
    */
  def giniSpend(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.load(spark, dir, "events")
      .groupBy("user_id")
      .agg(greatest(sum(round(col("value") * 100).cast("long")), lit(0L))
        .as("spend_cents"))
    val (ranked, n) = Ranking.withGlobalRowNumber(perUser, "rk",
      col("spend_cents"), col("user_id"))
    ranked.agg(sum(col("spend_cents")).as("total_cents"),
        sum(col("rk") * col("spend_cents")).as("rank_weighted"))
      .select(lit(n).as("n_users"), col("total_cents"),
        expr(s"(2 * rank_weighted - ${n + 1} * total_cents) * 1000" +
          s" div (${n} * total_cents)").as("gini_permille"))
  }

  /** Event-sequence transition counts (the Markov-chain bigram table):
    * for each user's time-ordered event stream, count (from_type → to_type)
    * transitions corpus-wide. One lag window + one hash aggregation — the
    * sequence-feature extraction shape for behavioral models at any scale.
    */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(Tables.epochMs, col("event_id"))
    ev.select(col("user_id"), col("event_type").as("to_type"),
        lag(col("event_type"), 1).over(w).as("from_type"))
      .where(col("from_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Full cohort retention matrix: users grouped by first-activity day
    * (the cohort), counted per day offset since that first day — the grid
    * behind every retention curve. Two hash aggregations + one equi-join on
    * user_id; the distinct (user, day) relation bounds all work at
    * O(users × active-days).
    */
  def cohortMatrix(spark: SparkSession, dir: String): DataFrame = {
    val active = Tables.load(spark, dir, "events")
      .select(col("user_id"), Tables.epochMsBucket(86400000L).as("day"))
      .distinct()
    val cohorts = active.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    active.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active")) // active is (user, day)-distinct
      .orderBy("cohort_day", "day_offset")
  }

  /** Next-day cohort retention: per activity day, how many distinct users
    * were also active the following day. Two hash aggregations + one
    * equi-join on (user, day+1) — the O(users×days) shape; no per-cohort
    * scans.
    */
  def dayRetention(spark: SparkSession, dir: String): DataFrame = {
    val active = Tables.load(spark, dir, "events")
      .select(col("user_id"), Tables.epochMsBucket(86400000L).as("day"))
      .distinct()
    val returned = active.as("a").join(active.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.day") === col("a.day") + 1L)
      .groupBy(col("a.day").as("day"))
      .agg(count(lit(1)).as("n_retained"))
    active.groupBy("day").agg(count(lit(1)).as("n_active"))
      .join(returned, Seq("day"), "left")
      .select(col("day"), col("n_active"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"))
      .orderBy("day")
  }

  /** IQR outlier counts per event type: values outside
    * [Q1 − 1.5·IQR, Q3 + 1.5·IQR], with exact rank-based quartiles over
    * integer cents (the same engine-portable percentile_disc construction
    * as [[quantityPercentiles]]) and the 1.5 factor as a ×2/÷2 integer
    * computation — no floats anywhere.
    */
  def iqrOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
    val quartiles = rankedWithCounts(ev, "event_type", "v")
      .groupBy("event_type")
      .agg(min(when(col("rn") === expr("(n + 3) div 4"), col("v"))).as("q1"),
        min(when(col("rn") === expr("(3 * n + 3) div 4"), col("v"))).as("q3"))
      // bounds in half-cents so 1.5·IQR stays integer-exact
      .select(col("event_type"),
        (col("q1") * 2 - (col("q3") - col("q1")) * 3).as("lo2"),
        (col("q3") * 2 + (col("q3") - col("q1")) * 3).as("hi2"))
    ev.join(broadcast(quartiles), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") * 2 < col("lo2") || col("v") * 2 > col("hi2"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy("event_type")
  }

  /** Robust outlier detection by median absolute deviation: per event
    * type, the exact integer median (rank ⌈n/2⌉ via the same
    * rank-at-position technique as [[iqrOutliers]]), the MAD, and the
    * count of points beyond 3·MAD. Two rank phases, each one windowed scan
    * partitioned by group; medians broadcast back. All integer cents —
    * hash-exact cross-engine.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
    def medianOf(df: DataFrame, c: String): DataFrame =
      rankedWithCounts(df, "event_type", c)
        .groupBy("event_type")
        .agg(min(when(col("rn") === expr("(n + 1) div 2"), col(c))).as(s"med_$c"))
    val med = medianOf(ev, "v")
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dv", abs(col("v") - col("med_v")))
    val mad = medianOf(dev.select(col("event_type"), col("dv")), "dv")
    dev.join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(min(col("med_v")).as("med"), min(col("med_dv")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("dv") > col("med_dv") * 3, 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("event_type")
  }

  /** A/B experiment readout: users deterministically hash-split into
    * control/treatment (the [[Curation.splitAssign]] mechanism), conversion
    * = more than 13 purchase events, rates in permille, lift vs control.
    * The assignment is a pure map; the readout aggregates to two rows
    * before the lift join, so the comparison never touches fact-scale data.
    */
  def abLift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val assign = ev.select(col("user_id")).distinct()
      .withColumn("grp",
        when(Tables.portableHash(concat(lit("ab:"), col("user_id").cast("string")))
          % 2 === 0, "control").otherwise("treatment"))
    val conv = ev.where(col("event_type") === "purchase")
      .groupBy("user_id").agg(count(lit(1)).as("n_purch"))
      .where(col("n_purch") > 13)
      .select(col("user_id"), lit(1L).as("converted"))
    val per = assign.join(conv, Seq("user_id"), "left")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("converted"), lit(0L))).as("n_converted"))
      .withColumn("conv_permille", expr("n_converted * 1000 div n_users"))
    val ctl = per.where(col("grp") === "control")
      .select(col("conv_permille").as("ctl_pm"))
    per.crossJoin(broadcast(ctl))
      .select(col("grp"), col("n_users"), col("n_converted"),
        col("conv_permille"),
        (col("conv_permille") - col("ctl_pm")).as("lift_permille"))
      .orderBy("grp")
  }

  /** Sequence mining one step beyond [[markovTransitions]]: the top-25
    * event-type trigram paths across user journeys (two lag windows over
    * the same user-keyed sort — Catalyst plans ONE exchange for both),
    * with each path's permille share of all trigrams.
    */
  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("em"), col("event_id"))
    val tri = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        Tables.epochMs.as("em"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .where(col("t2").isNotNull && col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
    val counts = tri.groupBy("path").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col("path"), col("n"),
        expr("n * 1000 div n_total").as("share_permille"))
      .orderBy(col("n").desc, col("path"))
      .limit(25)
  }

  /** Time-to-convert: per user-cohort (user_id mod 8), the exact median
    * milliseconds from a user's FIRST view to their first purchase at or
    * after it. First-touch extraction is one groupBy(user); the median
    * uses the same rank-at-position technique as [[madOutliers]],
    * partitioned by cohort — no global single-task window.
    */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .where(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"), Tables.epochMs.as("em"))
    val firstView = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("em")).as("view_ms"))
    val delta = ev.where(col("event_type") === "purchase")
      .join(firstView, "user_id")
      .where(col("em") >= col("view_ms"))
      .groupBy("user_id")
      .agg(min(expr("em - view_ms")).as("delta_ms"))
      .withColumn("cohort", col("user_id") % 8)
    rankedWithCounts(delta, "cohort", "delta_ms")
      .groupBy("cohort")
      .agg(min(col("n")).as("n_converted"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("delta_ms")))
          .as("median_delta_ms"))
      .orderBy("cohort")
  }

  /** Log₂-bucketed latency histogram over the message relation — the ops
    * staple for long-tailed durations. The bucket is the bit length of
    * `duration+1` (`length(bin(v))` / `length(printf('%b', v))`), which is
    * ⌊log₂⌋+1 computed integer-exactly in both engines — float `log2`
    * would risk ulp disagreement at exact powers of two. Pure map + one
    * partial-aggregated groupBy; corrupt (inverted) intervals are excluded
    * like everywhere else.
    */
  def latencyLog2(spark: SparkSession, dir: String): DataFrame =
    Tables.msgs(spark, dir)
      .where(col("end_at_ms") >= col("start_at_ms"))
      .select((col("end_at_ms") - col("start_at_ms") + 1L).as("v"))
      .select(expr("length(bin(v))").cast("long").as("bucket"), col("v"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("v")).as("min_ms"),
        max(col("v")).as("max_ms"))
      .orderBy("bucket")

  /** Audience overlap: Jaccard similarity (permille) between the user
    * sets of every event-type pair. The per-type distinct relation is
    * computed once; pair intersection is a self-join on user_id (shuffle
    * keyed by user, never all-pairs of users); union sizes come from the
    * inclusion–exclusion identity. Types are a tiny domain, so the final
    * relation is ≤ C(types, 2) rows.
    */
  def typeUserJaccard(spark: SparkSession, dir: String): DataFrame = {
    val tu = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
    val sizes = tu.groupBy("event_type").agg(count(lit(1)).as("n"))
    val inter = tu.as("a").join(tu.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("type_a"), col("n").as("na"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"), col("n").as("nb"))), "type_b")
      .select(col("type_a"), col("type_b"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("union_n"))
      .withColumn("jaccard_permille", expr("inter * 1000 div union_n"))
      .orderBy("type_a", "type_b")
  }

  /** DAU / trailing-7-day WAU / stickiness per day. WAU is exact: the
    * per-day distinct-user relation fans out to the 7 windows it belongs
    * to (a ×7 map-side explode of the already-deduped day relation — tiny)
    * and distinct users are counted per target day. No approximate
    * sketches, no quadratic self-join.
    */
  def dauWau(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.load(spark, dir, "events")
      .select(col("user_id"), Tables.epochMsBucket(86400000L).as("day"))
      .distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(sequence(col("day"), col("day") + 6L)).as("w"))
      .distinct()
      .groupBy(col("w").as("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .withColumn("stickiness_permille", expr("dau * 1000 div wau"))
      .orderBy("day")
  }

  /** Corpus-level n-gram frequency: top-20 word 3-grams by document
    * frequency. Reuses the memoized distinct-shingle relation; one hash agg
    * + a 20-row top-k (ties broken by shingle text → total order).
    */
  def topNgrams(spark: SparkSession, dir: String): DataFrame =
    Dedup.shinglesFor(spark, dir)
      .groupBy("shingle").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("shingle"))
      .limit(20)

  /** Tf-idf-style distinctive term per document: argmax over terms of
    * `tf · 10⁶ ÷ df` (integer-scaled rarity weighting — monotone in
    * tf/df like tf·idf, but engine-portable with no float log). Two hash
    * aggregations + one broadcast-able join on term.
    */
  def tfidfTopTerm(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .withColumn("score", expr("tf * 1000000 div df"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select("doc_id", "term", "tf", "df", "score")
      .orderBy("doc_id")
  }

  /** Deterministic ±1 random-hyperplane matrix (16 planes × 64 dims),
    * md5-derived so the Spark side and the DuckDB oracle inline the exact
    * same literals (see `SparkEntry.oracleSql("q_lsh_cosine")`).
    */
  private[graft] val hyperplaneSigns: Array[Array[Double]] =
    Array.tabulate(64, 64) { (b, d) =>
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hp${b}_$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if ((digest(0) & 1) == 1) 1.0 else -1.0
    }

  /** Corpus-adaptive LSH band plan (bits, extra): all 4 bands hash `bits`
    * sign planes, and the first `extra` (0–3) of them hash one MORE — the
    * smallest (b, j) in capacity order with 2^(b+10) ≥ N·(8−j), pure
    * integer arithmetic so the DuckDB oracle's replay agrees exactly.
    *
    * WHY fractional widths: a uniform bits-per-band schedule quantizes
    * bucket count to powers of two, so expected bucket size SAWTOOTHS by
    * 2× as N grows — and a decade that lands trough→crest (sf1.0's 156 →
    * sf10's 195 under the old 256·2^b ≥ N rule) prices 12.5× the
    * candidates for 10× the data (measured: q_lsh_cosine 7.8 s → 117 s,
    * last-decade slope 1.18). Widening ONE band at a time steps the
    * candidate capacity by 8/7…5/4 instead of 2×, pinning the expected
    * per-vector candidate volume inside [410, 512] at every N — decade
    * slope ≤ log₁₀(10·5/4)/1 ≈ 1.10 worst-case, ~1.0 typical, and the
    * ceiling 512 sits at the OLD schedule's trough, so no scale gets
    * slower. (With bits fixed at 4, bucket size ∝ N made the join fully
    * quadratic — measured 0.65 s → 58.7 s at sf1.0, exponent 1.95.)
    *
    * Stays (4, 0) — byte-identical signatures, bands, and results to the
    * old bits=4 plan — through N ≤ 2048, which covers the sf0.01/sf0.1
    * oracle gate scales; (7, 2) at sf1.0, (10, 3) at sf10. The plane
    * table is pregenerated to 64 rows (the (16, 0) cap), rows 0–15
    * byte-identical to the original 16-row table.
    */
  private[graft] def lshBandPlan(n: Long): (Int, Int) = {
    var b = 4
    var j = 0
    while (b < 16 && (1024L << b) < n * (8 - j)) {
      if (j < 3) j += 1 else { j = 0; b += 1 }
    }
    (b, if (b == 16) 0 else j)
  }

  /** Random-hyperplane (SRP) LSH over embeddings: 4·bits+extra sign
    * planes ([[lshBandPlan]]) → 4 bands → candidates share a band →
    * verified with exact cosine ≥ 0.45.
    *
    * The scale path for cosine near-dup detection when no IVF index exists:
    * signature computation is a map (codegen'd dot products), banding is
    * `explode(4)`, and the candidate join keys on (band, band_val) so the
    * shuffle carries signatures, not vectors. Band width trades recall vs
    * candidate volume — [[lshBandPlan]] widens one band at a time with
    * the corpus to keep expected bucket size inside a fixed window at
    * every N. The 0.45 verify threshold is sized to the synthetic
    * corpus (near-random vectors top out near cos 0.51), so the contract
    * returns a non-empty, oracle-pinned pair set at every test scale.
    *
    * Round 15: each (k, band_val) bucket additionally carries the HARD
    * per-bucket budget every other near-dup path already has — members
    * rank by the PER-BUCKET-SALTED portable hash of `k:band_val:vec_id`
    * (ties → min vec_id) and split into consecutive width-
    * [[Dedup.PairCapB]] sub-buckets; pairs enumerate only WITHIN a
    * sub-bucket ([[Dedup.subBucketPairs]]'s mechanism over a composite
    * bucket key). The band plan bounds EXPECTED occupancy (≤ ~128/band
    * by the capacity rule), so the budget is a no-op on uniform buckets
    * and converts a skewed band value's unbounded bucket² term into
    * occupancy·B/2 — worst-case O(N·B) pair volume under ANY skew, with
    * the linear (not quadratic) recall decay the salted split buys.
    * Four bands are four independently-salted chances to retain a true
    * pair. The sub-bucket window shuffles narrow (vec_id, k, band_val)
    * rows; embeddings re-attach by one equi-join so the cosine still
    * scores inside the band self-join.
    */
  def lshCosine(spark: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    val (bb, bx) = lshBandPlan(Similarity.corpusN(spark, dir))
    val nPlanes = 4 * bb + bx
    val signLits = hyperplaneSigns.map(row => array(row.toIndexedSeq.map(lit(_)): _*))
    val sigCol = (0 until nPlanes).map { b =>
      when(VectorOps.dot(col("e"), signLits(b)) > 0d, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    // The vectors ride ON the band rows (4 rows/vector) and the exact
    // cosine is scored INSIDE the band self-join, filtering BEFORE the
    // distinct — so the O(Σ bucket²) candidate volume exists only as a
    // projection and the pair-keyed exchange sees survivors of the 0.45
    // verify. The former shape deduped the full candidate set and then
    // attached both arrays with two sort-merge joins at candidate
    // cardinality — the sf10 probe measured that at 44× the sf1.0 wall.
    // A multi-band duplicate pair scores its cosine once per shared band
    // (deterministic → identical rows, removed by the distinct); that
    // recompute is linear in candidates, the attach-after sorts were not.
    // Same lesson as [[graft.operators.Dedup.ivfPairs]] (round 10).
    // band k covers planes [k·bits + min(k, extra), +width) with width =
    // bits (+1 for the first `extra` bands) — consecutive, disjoint
    val bandVals = (0 until 4).map { k =>
      val w = bb + (if (k < bx) 1 else 0)
      val off = k * bb + math.min(k, bx)
      expr(s"(sig >> $off) & ${(1L << w) - 1L}")
    }
    val wSub = Window.partitionBy(col("k"), col("band_val"))
      .orderBy(Tables.portableHash(concat(
          col("k").cast("string"), lit(":"),
          col("band_val").cast("string"), lit(":"),
          col("vec_id").cast("string"))),
        col("vec_id"))
    val bands = v.select(col("vec_id"), col("e"), col("nrm"), sigCol.as("sig"))
      .select(col("vec_id"),
        posexplode(array(bandVals: _*)).as(Seq("k", "band_val")))
      .withColumn("sub",
        ((row_number().over(wSub) - 1) / Dedup.PairCapB).cast("int"))
      .join(v, "vec_id")
      .select("vec_id", "e", "nrm", "k", "band_val", "sub")
    bands.as("a").join(bands.as("b"),
        col("a.k") === col("b.k") && col("a.band_val") === col("b.band_val") &&
          col("a.sub") === col("b.sub") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (VectorOps.dot(col("a.e"), col("b.e")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .where(col("cos") >= 0.45)
      .distinct()
      .orderBy("vec_a", "vec_b")
  }

  /** Interval overlap count: for each well-formed message, how many other
    * messages on the same src_ip overlap it in time. The *overlap*-join
    * sibling of the containment join: replicate each interval across its
    * time buckets, join on (ip, bucket), dedup pairs. Any overlapping pair
    * shares the bucket containing max(start_a, start_b), so banding finds
    * every pair; `distinct` removes multi-bucket double-counts.
    */
  def overlapCount(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.msgs(spark, dir)
      .where(col("end_at_ms") >= col("start_at_ms"))
      .select(col("id"), col("src_ip"), col("start_at_ms"), col("end_at_ms"))
    val w = ChainLink.bandWidth(m)
    val r = m.withColumn("bucket", explode(sequence(
      expr(s"start_at_ms div $w"), expr(s"end_at_ms div $w"))))
    val pairs = r.as("a").join(r.as("b"),
        col("a.src_ip") === col("b.src_ip") && col("a.bucket") === col("b.bucket") &&
          col("a.id") =!= col("b.id"))
      .where(col("a.start_at_ms") <= col("b.end_at_ms") &&
        col("b.start_at_ms") <= col("a.end_at_ms"))
      .select(col("a.id").as("id"), col("b.id").as("other_id"))
      .distinct()
    val counts = pairs.groupBy("id").agg(count(lit(1)).as("n_overlap"))
    m.select("id").join(counts, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .orderBy("id")
  }

  /** Gaps-and-islands: per-user longest consecutive-day activity streak.
    *
    * ONE exchange: `collect_set(day)` dedupes and gathers each user's days
    * (map-side combined; bounded by the calendar, never by event volume),
    * and the runs statistics fall out of a single left fold over the
    * sorted array — no windows, no second shuffle. The windowed
    * `day − row_number()` formulation needs a (user, day)-keyed distinct
    * exchange before its user-keyed window; this shape replaces both with
    * the aggregation it already had to do.
    */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("user_id"), Tables.epochMsBucket(86400000L).as("day"))
      .groupBy("user_id")
      .agg(sort_array(collect_set(col("day"))).as("ds"))
      .select(col("user_id"),
        size(col("ds")).cast("long").as("active_days"),
        // fold: (prev day, current run length, longest run, run count)
        aggregate(col("ds"),
          struct(lit(Long.MinValue).as("prev"), lit(0L).as("cur"),
            lit(0L).as("mx"), lit(0L).as("n")),
          (acc, d) => {
            val cur = when(d === acc("prev") + 1L, acc("cur") + 1L).otherwise(1L)
            struct(d.as("prev"), cur.as("cur"),
              greatest(acc("mx"), cur).as("mx"),
              (acc("n") + when(d === acc("prev") + 1L, 0L).otherwise(1L)).as("n"))
          }).as("st"))
      .select(col("user_id"), col("active_days"),
        col("st.n").as("n_streaks"), col("st.mx").as("max_streak"))
      .orderBy("user_id")

  /** BM25 keyword retrieval (Robertson/Okapi, k1 = 1.2, b = 0.75): the
    * top-10 documents for a deterministic 5-term query — the terms ranked
    * 11..15 by document frequency (df desc, term asc), i.e. mid-frequency
    * vocabulary, the realistic keyword-query regime (the df-top-10 behave
    * like stopwords).
    *
    * The idf factor uses the rational surrogate (N − df + 0.5)/(df + 0.5)
    * — the argument of BM25's log, without the log. The log is monotone,
    * so single-term ranking is identical; for the summed multi-term score
    * the surrogate weights rare terms more sharply than log-idf does. The
    * trade is deliberate: every arithmetic op stays a single IEEE
    * double op identical in Spark and DuckDB, so the driver hash-verifies
    * the full scoring pipeline (a transcendental log would be
    * library-rounding territory). Scores are emitted floor-scaled to
    * milli-units and summed as exact int64.
    *
    * Scale shape: tf/df/dl are the linear inverted-index aggregations;
    * the query-term table is 5 rows (TakeOrdered, then broadcast by the
    * join planner); scoring touches only postings of the 5 query terms;
    * the final top-10 is a TakeOrdered, not a global sort. At 100 TB this
    * is the batch ranking pass of a BM25 index probe, with the full-corpus
    * stats computed once and reused.
    */
  /** The BM25 per-term milli-score for [[bm25Search]] — one IEEE double
    * expression shared verbatim by the batch scorer and the streaming
    * twin ([[graft.streaming.StreamingOps.bm25ScoreStream]]), so the
    * stream ≡ batch proof covers the arithmetic, not a reimplementation.
    */
  private[graft] def bm25Milli(tf: Column, df: Column, dl: Column,
      nd: Column, tot: Column): Column =
    floor(
      (((nd - df) + lit(0.5)) / (df + lit(0.5))) *
        ((tf * lit(2.2)) /
          (tf + lit(1.2) * (lit(0.25) +
            lit(0.75) * ((dl * nd) / tot)))) *
        lit(1000.0)).cast("long")

  /** Query-term table (df ranks 11..15) + the (nd, tot) corpus-stats row —
    * the tiny "index statistics" artifact both BM25 personalities read.
    * Memoized ([[graft.sources.Materialized]]): the nightly-built stats a
    * serving tier loads, so repeat queries and the streaming scorer never
    * re-scan the corpus for 6 rows of statistics.
    */
  private[graft] def bm25StatsFor(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    def words = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val qt = graft.sources.Materialized.of(spark, s"bm25qt:$dir") {
      val df = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .groupBy("term").agg(count(lit(1)).as("df"))
      // TakeOrdered the 15 df-heaviest terms FIRST, then rank within those
      // 15 rows — the single-partition window only ever sees 15 rows, never
      // the vocabulary (which is corpus-sized at 100 TB).
      val wDf = Window.orderBy(col("df").desc, col("term"))
      df.orderBy(col("df").desc, col("term")).limit(15)
        .withColumn("r", row_number().over(wDf))
        .where(col("r") >= 11 && col("r") <= 15)
        .select("term", "df")
    }
    val tot = graft.sources.Materialized.of(spark, s"bm25tot:$dir") {
      words.groupBy("doc_id").agg(count(lit(1)).as("dl"))
        .agg(count(lit(1)).as("nd"), sum(col("dl")).as("tot"))
    }
    (qt, tot)
  }

  /** Per-document BM25 aggregate (docs with ≥ 1 query-term hit): the
    * relation [[bm25Search]] ranks and the streaming scorer must
    * reproduce row-for-row.
    */
  private[graft] def bm25ScoredFor(spark: SparkSession, dir: String): DataFrame = {
    val (qt, tot) = bm25StatsFor(spark, dir)
    val words = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = words.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = words.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    tf.join(broadcast(qt), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        bm25Milli(col("tf"), col("df"), col("dl"), col("nd"), col("tot"))
          .as("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("s")).as("score_milli"))
  }

  def bm25Search(spark: SparkSession, dir: String): DataFrame = {
    val scored = bm25ScoredFor(spark, dir)
    val wTop = Window.orderBy(col("score_milli").desc, col("doc_id"))
    scored.orderBy(col("score_milli").desc, col("doc_id")).limit(10)
      .withColumn("rk", row_number().over(wTop).cast("long"))
      .select("rk", "doc_id", "n_hit_terms", "score_milli")
      .orderBy("rk")
  }
}
