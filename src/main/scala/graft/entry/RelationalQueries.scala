package graft
package entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables
import OracleCtes._

/** Query + oracle registry: TPC-H-style relational staples: joins, windows, set ops, grouping sets, SCD2, skew/salting and pruning demonstrations.
  *
  * Split out of the former SparkEntry monolith (round 9); merged back into
  * the driver contract by [[graft.SparkEntry]]. Key sets of [[queries]] and
  * [[oracles]] stay aligned — EntryRegistrySpec enforces it.
  */
object RelationalQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational staples
    "q1_pricing" -> ((s, d) => Relational.q1Pricing(s, d)),
    "q3_top_orders" -> ((s, d) => Relational.q3TopOrders(s, d)),
    "q5_nation_revenue" -> ((s, d) => Relational.q5NationRevenue(s, d)),
    "q7_volume" -> ((s, d) => Relational.q7Volume(s, d)),
    "q_semi_high_qty" -> ((s, d) => Relational.qSemiHighQty(s, d)),
    "q_anti_no_orders" -> ((s, d) => Relational.qAntiNoOrders(s, d)),
    "q_window_top3" -> ((s, d) => Relational.qWindowTop3(s, d)),
    "q_events_tumbling" -> ((s, d) => Relational.qEventsTumbling(s, d)),
    "q_distinct_users" -> ((s, d) => Relational.qDistinctUsers(s, d)),
    "q_rollup_revenue" -> ((s, d) => Relational.qRollupRevenue(s, d)),
    "q_lag_events" -> ((s, d) => Relational.qLagEvents(s, d)),
    "q_event_debounce" -> ((s, d) => Relational.qEventDebounce(s, d)),
    // third-wave relational staples
    "q_cube_revenue" -> ((s, d) => Relational.qCubeRevenue(s, d)),
    "q_ntile_quartile" -> ((s, d) => Relational.qNtileQuartile(s, d)),
    "q_value_histogram" -> ((s, d) => Relational.qValueHistogram(s, d)),
    "q_skew_distinct" -> ((s, d) => Relational.qSkewDistinct(s, d)),
    "q_rolling_sum" -> ((s, d) => Relational.qRollingSum(s, d)),
    "q_except_users" -> ((s, d) => Relational.qExceptUsers(s, d)),
    "q_latest_snapshot" -> ((s, d) => Relational.qLatestSnapshot(s, d)),
    "q_dedup_first_event" -> ((s, d) => Relational.qDedupFirstEvent(s, d)),
    "q_events_hopping" -> ((s, d) => Relational.qEventsHopping(s, d)),
    "q_full_outer_daily" -> ((s, d) => Relational.qFullOuterDaily(s, d)),
    "q_intersect_users" -> ((s, d) => Relational.qIntersectUsers(s, d)),
    "q_dense_rank_brand" -> ((s, d) => Relational.qDenseRankBrand(s, d)),
    // bounded-heap top-k aggregate (custom TypedImperativeAggregate) — the
    // exchange-light alternative to the window-rank idiom; oracle replays
    // the window form, proving the two equivalent
    "q_topk_parts" -> ((s, d) => Relational.qTopkParts(s, d)),
    // SQL personality
    "q_sql_segment_revenue" -> ((s, d) => SqlApi.revenueBySegment(s, d)),
    "q_sql_cosine_by_label" -> ((s, d) => SqlApi.sqlCosineByLabel(s, d)),
    "q_sql_small_qty" -> ((s, d) => SqlApi.smallQtyParts(s, d)),
    "q_sql_grouping_sets" -> ((s, d) => SqlApi.groupingSetsMarginals(s, d)),
    // SQL-text twins of DataFrame operators: same engine through
    // spark.sql over registered views (links = the memoized artifact)
    "q_sql_degree_hist" -> ((s, d) => SqlApi.sqlDegreeHist(s, d)),
    "q_sql_sessions" -> ((s, d) => SqlApi.sqlSessions(s, d)),
    "q_sql_anti_no_orders" -> ((s, d) => SqlApi.sqlAntiNoOrders(s, d)),
    "q_sql_pivot_events" -> ((s, d) => SqlApi.sqlPivotEvents(s, d)),
    "q_scd2" -> ((s, d) => Relational.qScd2(s, d)),
    "q_zonemap_prune" -> ((s, d) => Relational.qZonemapPrune(s, d)),
    "q_bloom_semi" -> ((s, d) => RuntimeFilter.bloomSemiRevenue(s, d)),
    "q_unpivot_daily" -> ((s, d) => Relational.qUnpivotDaily(s, d)),
    "q_salted_join" -> ((s, d) => Skew.saltedJoinPriority(s, d)),
    "q_hot_keys" -> ((s, d) => Skew.hotKeys(s, d)),
    "q_skyline" -> ((s, d) => Relational.qSkylineParts(s, d)),
    "q_pivot_events" -> ((s, d) => Analytics.pivotEventCounts(s, d)),
    // second-wave analytics staples
    "q_asof_last_view" -> ((s, d) => Analytics.asofLastView(s, d)),
    "q_promo_share" -> ((s, d) => Analytics.promoShare(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         |         AS sum_base_cents,
         |       $revenueE4 AS sum_disc_e4,
         |       count(*) AS count_order
         |FROM lineitem
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_top_orders" ->
      s"""SELECT o_orderkey, $revenueE4 AS revenue_e4
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY 1 ORDER BY revenue_e4 DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      s"""SELECT n_name, $revenueE4 AS revenue_e4, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Replays Q7 volume shipping: the two-nation disjunctive predicate,
    // ship-year rollup, integer-e4 money.
    "q7_volume" ->
      s"""WITH sn AS (SELECT s_suppkey, n_name AS supp_nation
         |            FROM supplier JOIN nation ON s_nationkey = n_nationkey),
         |cn AS (SELECT c_custkey, n_name AS cust_nation
         |       FROM customer JOIN nation ON c_nationkey = n_nationkey)
         |SELECT supp_nation, cust_nation,
         |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |       $revenueE4 AS revenue_e4, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN cn ON o_custkey = c_custkey
         |JOIN sn ON l_suppkey = s_suppkey
         |WHERE (supp_nation = 'NATION_1' AND cust_nation = 'NATION_2')
         |   OR (supp_nation = 'NATION_2' AND cust_nation = 'NATION_1')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // Replays the burst-leader debounce: 60 s gap rule per
    // (user, event_type) timeline, per-type keep/drop rollup.
    "q_event_debounce" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |             epoch_ms(ts) AS tms FROM events),
        |g AS (SELECT event_type,
        |        tms - lag(tms) OVER (PARTITION BY user_id, event_type
        |                             ORDER BY tms, event_id) AS gap
        |      FROM e)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CASE WHEN gap IS NULL OR gap >= 60000
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST((count(*) - sum(CASE WHEN gap IS NULL OR gap >= 60000
        |                                 THEN 1 ELSE 0 END)) * 1000
        |            // count(*) AS BIGINT) AS drop_permille
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_semi_high_qty" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_anti_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_window_top3" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q_events_tumbling" ->
      """SELECT event_type, epoch_ms(ts) // 300000 AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rollup_revenue" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END
        |         AS returnflag,
        |       CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END
        |         AS linestatus,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
        |         AS base_cents
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "q_lag_events" ->
      """SELECT event_id, user_id,
        |       coalesce(lag(event_id, 1) OVER w, -1) AS prev_event_id,
        |       coalesce(lead(event_id, 1) OVER w, -1) AS next_event_id
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
        |ORDER BY event_id""".stripMargin,
    "q_cube_revenue" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END
        |         AS returnflag,
        |       CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END
        |         AS linestatus,
        |       count(*) AS n,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "q_ntile_quartile" ->
      """SELECT event_id, event_type,
        |       CAST(ntile(4) OVER (PARTITION BY event_type
        |                           ORDER BY value, event_id) AS BIGINT) AS quartile
        |FROM events ORDER BY event_id""".stripMargin,
    "q_value_histogram" ->
      """SELECT least(CAST(floor(value * 20) AS BIGINT), 19) AS bucket,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS sum_value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skew_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rolling_sum" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS em,
        |                  CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events)
        |SELECT event_id, user_id, em,
        |       CAST(sum(v) OVER (PARTITION BY user_id ORDER BY em
        |              RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS roll_cents
        |FROM e ORDER BY event_id""".stripMargin,
    "q_except_users" ->
      """SELECT user_id FROM (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase' AND value >= 90
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'click' AND value >= 90)
        |ORDER BY user_id""".stripMargin,
    "q_latest_snapshot" ->
      """SELECT user_id, event_type, event_id, em, value_cents FROM (
        |  SELECT user_id, event_type, event_id, epoch_ms(ts) AS em,
        |         CAST(round(value * 100) AS BIGINT) AS value_cents,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rk
        |  FROM events)
        |WHERE rk = 1 ORDER BY user_id, event_type""".stripMargin,
    "q_dedup_first_event" ->
      """SELECT user_id, event_type, event_id, em FROM (
        |  SELECT user_id, event_type, event_id, epoch_ms(ts) AS em,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY epoch_ms(ts), event_id) AS rk
        |  FROM events)
        |WHERE rk = 1 ORDER BY user_id, event_type""".stripMargin,
    // width = 2×slide ⇒ every event is in exactly the two windows starting
    // at floor(em/slide)·slide and one slide earlier (start ≤ t < start+width
    // always holds for both) — mirrors Spark's epoch-aligned window().
    "q_events_hopping" ->
      """WITH e AS (SELECT event_type,
        |                  (epoch_ms(ts) // 300000) * 300000 AS s0 FROM events),
        |x AS (SELECT event_type, s0 AS window_start_ms FROM e
        |      UNION ALL
        |      SELECT event_type, s0 - 300000 FROM e)
        |SELECT event_type, window_start_ms, count(*) AS n
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_full_outer_daily" ->
      """WITH e AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day FROM events),
        |c AS (SELECT day, count(*) AS n_clicks FROM e
        |      WHERE event_type = 'click' GROUP BY 1),
        |p AS (SELECT day, count(*) AS n_purchases FROM e
        |      WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT coalesce(c.day, p.day) AS day,
        |       coalesce(n_clicks, 0) AS n_clicks,
        |       coalesce(n_purchases, 0) AS n_purchases
        |FROM c FULL OUTER JOIN p ON c.day = p.day
        |ORDER BY day""".stripMargin,
    "q_intersect_users" ->
      """SELECT user_id FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |ORDER BY user_id""".stripMargin,
    "q_dense_rank_brand" ->
      """SELECT p_brand, p_partkey,
        |       CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
        |       rk
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |             CAST(dense_rank() OVER (PARTITION BY p_brand
        |                    ORDER BY p_retailprice DESC) AS BIGINT) AS rk
        |      FROM part)
        |WHERE rk <= 2 ORDER BY p_brand, rk, p_partkey""".stripMargin,
    "q_topk_parts" ->
      """SELECT p_brand, rk, price_cents, p_partkey
        |FROM (SELECT p_brand, p_partkey,
        |             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
        |             CAST(row_number() OVER (PARTITION BY p_brand
        |                    ORDER BY CAST(round(p_retailprice * 100) AS BIGINT) DESC,
        |                             p_partkey) AS BIGINT) AS rk
        |      FROM part)
        |WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin,
    "q_sql_segment_revenue" ->
      s"""SELECT c_mktsegment, $revenueE4 AS revenue_e4, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,
    // Replays sqlCosineByLabel's SRP-LSH banding exactly (same inlined
    // 64-plane hyperplane literals as q_lsh_cosine, same adaptive band
    // bits), restricted to equal labels.
    "q_sql_cosine_by_label" -> {
      s"""WITH $vecCte,
         |v2 AS (SELECT v.vec_id, e.label, v.e, v.nrm
         |       FROM v JOIN embeddings e ON v.vec_id = e.vec_id),
         |bb AS (SELECT $lshPlanSql AS bj),
         |sig AS (SELECT vec_id, label, e, nrm, CAST($sigTerms64Sql AS BIGINT) AS sig
         |        FROM v2),
         |bands AS (SELECT vec_id, label, sig, k,
         |            ${OracleCtes.lshBandValSql()} AS band_val
         |          FROM sig CROSS JOIN bb
         |          CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) ks),
         |cand AS (SELECT DISTINCT a.label AS label, a.vec_id AS vec_a,
         |                b.vec_id AS vec_b
         |         FROM bands a JOIN bands b
         |           ON a.label = b.label AND a.k = b.k
         |          AND a.band_val = b.band_val AND a.vec_id < b.vec_id),
         |p AS (SELECT c.label, c.vec_a, c.vec_b,
         |        ${dotSql("va.e", "vb.e")} / (va.nrm * vb.nrm) AS cos
         |      FROM cand c
         |      JOIN v va ON c.vec_a = va.vec_id
         |      JOIN v vb ON c.vec_b = vb.vec_id),
         |r AS (SELECT label, vec_a, vec_b, cos,
         |        row_number() OVER (PARTITION BY label
         |                           ORDER BY cos DESC, vec_a, vec_b) AS rk
         |      FROM p)
         |SELECT label, vec_a, vec_b, cos FROM r WHERE rk = 1
         |ORDER BY label""".stripMargin
    },
    "q_sql_small_qty" ->
      """SELECT l_partkey,
        |       count(*) AS n_small,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_small_qty
        |FROM lineitem l
        |WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY l_partkey
        |ORDER BY l_partkey""".stripMargin,
    "q_sql_grouping_sets" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END
        |         AS returnflag,
        |       CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END
        |         AS linestatus,
        |       count(*) AS n,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q_scd2" ->
      """WITH ch AS (
        |  SELECT user_id, event_type, em, event_id FROM (
        |    SELECT user_id, event_type, event_id, epoch_ms(ts) AS em,
        |           lag(event_type, 1) OVER w AS prev_type
        |    FROM events
        |    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id))
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type, em AS valid_from_ms,
        |       coalesce(lead(em, 1) OVER w2, -1) AS valid_to_ms,
        |       CAST(CASE WHEN lead(em, 1) OVER w2 IS NULL
        |                 THEN 1 ELSE 0 END AS BIGINT) AS is_current
        |FROM ch
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY em, event_id)
        |ORDER BY user_id, valid_from_ms""".stripMargin,
    "q_zonemap_prune" ->
      """WITH z AS (SELECT event_id // 512 AS zone_id, epoch_ms(ts) AS em
        |           FROM events),
        |t AS (SELECT min(em) + 20 * 86400000 AS cut FROM z)
        |SELECT zone_id, count(*) AS n_rows, min(em) AS min_em, max(em) AS max_em,
        |       CAST(sum(CASE WHEN em >= cut THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
        |       CASE WHEN max(em) < max(cut) THEN 'skip'
        |            WHEN min(em) >= max(cut) THEN 'full'
        |            ELSE 'partial' END AS verdict
        |FROM z CROSS JOIN t
        |GROUP BY zone_id ORDER BY zone_id""".stripMargin,
    // The bloom prefilter is internal-only (false positives re-checked by
    // the exact semi-join), so the oracle is the plain EXISTS form.
    "q_bloom_semi" ->
      s"""SELECT l_returnflag, $revenueE4 AS revenue_e4, count(*) AS n_items
         |FROM lineitem l
         |WHERE EXISTS (SELECT 1 FROM orders o
         |              WHERE o.o_orderkey = l.l_orderkey
         |                AND o.o_orderpriority = '1-URGENT')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_unpivot_daily" ->
      """WITH d AS (SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS n_events,
        |             count(DISTINCT user_id) AS n_users,
        |             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |               AS value_cents
        |           FROM events GROUP BY 1)
        |SELECT day, metric, val FROM (
        |  SELECT day, 'n_events' AS metric, n_events AS val FROM d
        |  UNION ALL SELECT day, 'n_users', n_users FROM d
        |  UNION ALL SELECT day, 'value_cents', value_cents FROM d)
        |ORDER BY day, metric""".stripMargin,
    // Oracle is the PLAIN join + aggregation — the salted join must be
    // result-identical, differing only in physical work distribution.
    "q_salted_join" ->
      """SELECT o.o_orderpriority, count(*) AS n_items,
        |       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hot_keys" ->
      """WITH c AS (SELECT l_orderkey, count(*) AS n_rows FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM c)
        |SELECT l_orderkey, n_rows,
        |       CAST(n_rows * 1000 // t.n_total AS BIGINT) AS share_permille
        |FROM c CROSS JOIN t
        |ORDER BY n_rows DESC, l_orderkey LIMIT 20""".stripMargin,
    "q_skyline" ->
      """WITH p AS (SELECT p_partkey,
        |             CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |             CAST(p_size AS BIGINT) AS sz FROM part),
        |m AS (SELECT p_partkey, price_c, sz,
        |        max(sz) OVER (ORDER BY price_c
        |          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax,
        |        max(sz) OVER (PARTITION BY price_c) AS pmax
        |      FROM p)
        |SELECT p_partkey, price_c, sz FROM m
        |WHERE coalesce(prevmax, -1) < sz AND pmax = sz
        |ORDER BY price_c, p_partkey""".stripMargin,
    // SQL-text twins — the Spark side runs spark.sql text; the oracles
    // replay the same relational content in DuckDB's dialect.
    "q_sql_degree_hist" ->
      s"""WITH $msgsCte, $linksCte,
         |par AS (SELECT child_id AS id, count(DISTINCT parent_id) AS parent_cnt
         |        FROM links GROUP BY 1),
         |chi AS (SELECT parent_id AS id, count(DISTINCT child_id) AS child_cnt
         |        FROM links GROUP BY 1)
         |SELECT coalesce(p.parent_cnt, 0) AS parent_cnt,
         |       coalesce(c.child_cnt, 0) AS child_cnt,
         |       count(*) AS n
         |FROM msgs m
         |LEFT JOIN par p ON m.id = p.id
         |LEFT JOIN chi c ON m.id = c.id
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,
    "q_sql_sessions" ->
      s"""WITH $sessionsCtes
         |SELECT user_id, session_id, count(*) AS n_events,
         |       min(em) AS session_start_ms, max(em) AS session_end_ms
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_sql_anti_no_orders" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 300000.0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q_sql_pivot_events" ->
      """SELECT user_id % 8 AS bucket,
        |       count(*) FILTER (WHERE event_type = 'click') AS click,
        |       count(*) FILTER (WHERE event_type = 'error') AS error,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_pivot_events" ->
      """SELECT user_id % 8 AS bucket,
        |       count(*) FILTER (WHERE event_type = 'click') AS click,
        |       count(*) FILTER (WHERE event_type = 'error') AS error,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // DuckDB's native ASOF JOIN — a genuinely different mechanism than the
    // Spark side's union+window carry-forward, so agreement validates the
    // as-of semantics, not just the arithmetic. Views deduped to
    // max(event_id) per (user, ms) to pin the tie-break both engines use.
    "q_asof_last_view" ->
      """WITH p AS (SELECT event_id, user_id, epoch_ms(ts) AS pem
        |           FROM events WHERE event_type = 'purchase'),
        |v0 AS (SELECT user_id, epoch_ms(ts) AS vem, max(event_id) AS view_event_id
        |       FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.pem AS purchase_ms,
        |       coalesce(v0.view_event_id, -1) AS view_event_id,
        |       coalesce(v0.vem, -1) AS view_ms
        |FROM p ASOF LEFT JOIN v0
        |  ON p.user_id = v0.user_id AND p.pem >= v0.vem
        |ORDER BY p.event_id""".stripMargin,
    "q_promo_share" ->
      s"""WITH t AS (
         |  SELECT p_type, $revenueE4 AS revenue_e4, count(*) AS n_items
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1)
         |SELECT p_type, revenue_e4, n_items,
         |       CAST(revenue_e4 * 1000 // sum(revenue_e4) OVER () AS BIGINT)
         |         AS share_permille
         |FROM t ORDER BY p_type""".stripMargin,
  )
}
