package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a batch DataFrame query over the parquet
  * tables in `sfDir`; [[oracleSql]] holds the equivalent DuckDB SQL run by
  * the driver over the same tables. Column names and row order are aligned
  * between the two by construction (explicit aliases + total ORDER BY).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ChainLink.chainLink(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "chain_link" -> ((s, d) => ChainLink.chainLink(s, d)),
    "link_pairs" -> ((s, d) => ChainLink.linkPairs(s, d)),
    "expand_roles" -> ((s, d) => ChainLink.expandRoles(s, d)),
    "expand_updates" -> ((s, d) => ChainLink.expandUpdates(s, d)),
    "watermark_emitted" -> ((s, d) => ChainLink.watermarkEmitted(s, d)),
    "eviction_survivors" -> ((s, d) => ChainLink.evictionSurvivors(s, d)),
    "degree_histogram" -> ((s, d) => ChainLink.degreeHistogram(s, d)),
    "parse_events" -> ((s, d) => ChainLink.parseEvents(s, d)),
    "q1_pricing" -> ((s, d) => Relational.q1Pricing(s, d)),
    "q3_top_orders" -> ((s, d) => Relational.q3TopOrders(s, d)),
    "q5_nation_revenue" -> ((s, d) => Relational.q5NationRevenue(s, d)),
    "q_semi_high_qty" -> ((s, d) => Relational.qSemiHighQty(s, d)),
    "q_anti_no_orders" -> ((s, d) => Relational.qAntiNoOrders(s, d)),
    "q_window_top3" -> ((s, d) => Relational.qWindowTop3(s, d)),
    "q_events_tumbling" -> ((s, d) => Relational.qEventsTumbling(s, d)),
    "q_distinct_users" -> ((s, d) => Relational.qDistinctUsers(s, d)),
  )

  private val msgsCte = Tables.msgsCte

  private val linksCte: String =
    """links AS (
      |  SELECT p.id AS parent_id, c.id AS child_id
      |  FROM msgs p JOIN msgs c
      |    ON p.dst_ip = c.src_ip
      |   AND p.start_at_ms <= c.start_at_ms
      |   AND p.end_at_ms >= c.end_at_ms
      |   AND p.id <> c.id
      |)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "chain_link" ->
      s"""WITH $msgsCte, $linksCte,
         |par AS (SELECT child_id AS id, list_sort(list(DISTINCT parent_id)) AS parents
         |        FROM links GROUP BY 1),
         |chi AS (SELECT parent_id AS id, list_sort(list(DISTINCT child_id)) AS children
         |        FROM links GROUP BY 1)
         |SELECT m.id, m.src_ip, m.dst_ip, m.start_at_ms, m.latency_msec, m.end_at_ms,
         |       coalesce(p.parents, CAST([] AS VARCHAR[])) AS parents,
         |       coalesce(c.children, CAST([] AS VARCHAR[])) AS children
         |FROM msgs m
         |LEFT JOIN par p ON m.id = p.id
         |LEFT JOIN chi c ON m.id = c.id
         |ORDER BY m.id""".stripMargin,

    "link_pairs" ->
      s"""WITH $msgsCte, $linksCte
         |SELECT parent_id, child_id FROM links
         |ORDER BY parent_id, child_id""".stripMargin,

    "expand_roles" ->
      s"""WITH $msgsCte
         |SELECT * FROM (
         |  SELECT 'parent' AS role, dst_ip AS ip_key, id, start_at_ms, end_at_ms FROM msgs
         |  UNION ALL
         |  SELECT 'child' AS role, src_ip AS ip_key, id, start_at_ms, end_at_ms FROM msgs
         |) ORDER BY id, role""".stripMargin,

    "expand_updates" ->
      s"""WITH $msgsCte, $linksCte
         |SELECT * FROM (
         |  SELECT 'message' AS event_type, id AS key_id, '' AS other_id FROM msgs
         |  UNION ALL
         |  SELECT 'add_child' AS event_type, parent_id AS key_id, child_id AS other_id FROM links
         |  UNION ALL
         |  SELECT 'add_parent' AS event_type, child_id AS key_id, parent_id AS other_id FROM links
         |) ORDER BY event_type, key_id, other_id""".stripMargin,

    "watermark_emitted" ->
      s"""WITH $msgsCte
         |SELECT id, src_ip, dst_ip, start_at_ms, latency_msec, end_at_ms FROM msgs
         |WHERE end_at_ms <= (SELECT max(start_at_ms) - 30000 FROM msgs)
         |ORDER BY id""".stripMargin,

    "eviction_survivors" ->
      s"""WITH $msgsCte
         |SELECT id, src_ip, dst_ip, start_at_ms, latency_msec, end_at_ms FROM msgs
         |WHERE end_at_ms > (SELECT max(start_at_ms) - 30000 FROM msgs)
         |ORDER BY id""".stripMargin,

    "degree_histogram" ->
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
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "parse_events" ->
      """SELECT event_id,
        |       CAST(floor(coalesce(
        |         TRY_CAST(regexp_extract(props, '"k"\s*:\s*(-?[0-9.]+)', 1) AS DOUBLE),
        |         0.0)) AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_cents,
        |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS sum_disc_e4,
        |       count(*) AS count_order
        |FROM lineitem
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_top_orders" ->
      """SELECT o_orderkey,
        |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS revenue_e4
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY revenue_e4 DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_nation_revenue" ->
      """SELECT n_name,
        |       sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS revenue_e4,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

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
        |       sum(CAST(round(value * 100) AS BIGINT)) AS sum_value_cents
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
