package graft
package entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables
import OracleCtes._

/** Query + oracle registry: the reference chain-linking pipeline (parse → expand → interval-join → link → aggregate) plus the graph/session analytics that ride the linked-message tables.
  *
  * Split out of the former SparkEntry monolith (round 9); merged back into
  * the driver contract by [[graft.SparkEntry]]. Key sets of [[queries]] and
  * [[oracles]] stay aligned — EntryRegistrySpec enforces it.
  */
object ChainQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // chain-linking pipeline (reference operators)
    // Driver-checked variant projects the arrays to canonical CSV strings:
    // the driver's pandas-based compare cannot sort/hash array columns
    // (ADVICE r1). The library API (ChainLink.chainLink / entry) keeps
    // first-class ArrayType columns.
    "chain_link" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      ChainLink.chainLink(s, d)
        .withColumn("parents", concat_ws(",", col("parents")))
        .withColumn("children", concat_ws(",", col("children")))
    }),
    "link_pairs" -> ((s, d) => ChainLink.linkPairs(s, d)),
    "expand_roles" -> ((s, d) => ChainLink.expandRoles(s, d)),
    "expand_updates" -> ((s, d) => ChainLink.expandUpdates(s, d)),
    "watermark_emitted" -> ((s, d) => ChainLink.watermarkEmitted(s, d)),
    "eviction_survivors" -> ((s, d) => ChainLink.evictionSurvivors(s, d)),
    "degree_histogram" -> ((s, d) => ChainLink.degreeHistogram(s, d)),
    "parse_events" -> ((s, d) => ChainLink.parseEvents(s, d)),
    "q_grandparents" -> ((s, d) => ChainLink.grandparents(s, d)),
    "q_trace_depth" -> ((s, d) => ChainLink.traceDepth(s, d)),
    "q_sessions" -> ((s, d) => ChainLink.sessionize(s, d)),
    "q_session_stats" -> ((s, d) => ChainLink.sessionStats(s, d)),
    "q_native_sessions" -> ((s, d) => ChainLink.nativeSessions(s, d)),
    "q_band_stats" -> ((s, d) => ChainLink.bandStats(s, d)),
    "q_peak_concurrency" -> ((s, d) => ChainLink.peakConcurrency(s, d)),
    // fourth-wave: graph analytics, runtime filters, curation signals
    "q_pagerank" -> ((s, d) => Graph.pageRank(s, d)),
    "q_triangles" -> ((s, d) => Graph.triangles(s, d)),
    "q_top_paths" -> ((s, d) => Analytics.topPaths(s, d)),
    "q_props_k" -> ((s, d) => Relational.qPropsK(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "chain_link" ->
      s"""WITH $msgsCte, $linksCte,
         |par AS (SELECT child_id AS id, list_sort(list(DISTINCT parent_id)) AS parents
         |        FROM links GROUP BY 1),
         |chi AS (SELECT parent_id AS id, list_sort(list(DISTINCT child_id)) AS children
         |        FROM links GROUP BY 1)
         |SELECT m.id, m.src_ip, m.dst_ip, m.start_at_ms, m.latency_msec, m.end_at_ms,
         |       coalesce(array_to_string(p.parents, ','), '') AS parents,
         |       coalesce(array_to_string(c.children, ','), '') AS children
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
    // Full JSON number syntax (incl. exponents) so the regex extraction is
    // semantically equivalent to Spark's from_json on any valid JSON value:
    // non-numeric / quoted / missing `k` → NULL on both sides → default 0.
    "parse_events" ->
      """SELECT event_id,
        |       CAST(floor(coalesce(
        |         TRY_CAST(regexp_extract(props,
        |           '"k"\s*:\s*(-?(?:0|[1-9][0-9]*)(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)', 1)
        |           AS DOUBLE),
        |         0.0)) AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_grandparents" ->
      s"""WITH $msgsCte, $linksCte
         |SELECT DISTINCT g.parent_id AS grand_id, g.child_id AS mid_id,
         |       c.child_id AS child_id
         |FROM links g JOIN links c ON g.child_id = c.parent_id
         |WHERE g.parent_id <> c.child_id
         |ORDER BY 1, 2, 3""".stripMargin,
    // Longest path over the strict-containment DAG via recursive CTE
    // (UNION dedups (node, d) pairs each step; DAG ⇒ termination) vs the
    // Spark side's iterative max-relaxation — independent mechanisms.
    "q_trace_depth" ->
      s"""WITH RECURSIVE $msgsCte, $linksCte,
         |strict AS MATERIALIZED (
         |  SELECT l.parent_id, l.child_id FROM links l
         |  JOIN msgs p ON l.parent_id = p.id
         |  JOIN msgs c ON l.child_id = c.id
         |  WHERE NOT (p.start_at_ms = c.start_at_ms AND p.end_at_ms = c.end_at_ms)),
         |paths AS (
         |  SELECT child_id AS id, 1 AS d FROM strict
         |  UNION
         |  SELECT s.child_id, p.d + 1 FROM paths p
         |  JOIN strict s ON s.parent_id = p.id),
         |dep AS (SELECT id, max(d) AS depth FROM paths GROUP BY 1)
         |SELECT m.id, CAST(coalesce(dep.depth, 0) AS BIGINT) AS depth
         |FROM msgs m LEFT JOIN dep USING (id)
         |ORDER BY m.id""".stripMargin,
    "q_sessions" ->
      s"""WITH $sessionsCtes
         |SELECT user_id, session_id, count(*) AS n_events,
         |       min(em) AS session_start_ms, max(em) AS session_end_ms
         |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Session-length distribution: one more aggregation over the same
    // session relation (operator composition check).
    "q_session_stats" ->
      s"""WITH $sessionsCtes,
         |sess AS (SELECT user_id, session_id, count(*) AS n_events,
         |                max(em) - min(em) AS span_ms
         |         FROM s GROUP BY 1, 2)
         |SELECT n_events, count(*) AS n_sessions,
         |       CAST(sum(span_ms) AS BIGINT) AS total_span_ms
         |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin,
    // Native session_window checked against the INDEPENDENT windowed-lag
    // sessionization mechanism (native end = last event + gap).
    "q_native_sessions" ->
      s"""WITH $sessionsCtes
         |SELECT user_id, CAST(min(em) AS BIGINT) AS start_ms,
         |       CAST(max(em) + 1800000 AS BIGINT) AS end_ms,
         |       count(*) AS n_events
         |FROM s GROUP BY user_id, session_id
         |ORDER BY user_id, start_ms""".stripMargin,
    // Banded-join what-if under a pinned 20 s width, via the sweep-line
    // form (±1 boundary prefix sums; O(msgs) at any width).
    "q_band_stats" ->
      s"""WITH $msgsCte,
         |wf AS (SELECT * FROM msgs WHERE end_at_ms >= start_at_ms),
         |bounds AS (SELECT ip, bucket, 0 AS tag,
         |             CAST(sum(delta) AS BIGINT) AS delta,
         |             CAST(NULL AS BIGINT) AS nc
         |           FROM (SELECT dst_ip AS ip, start_at_ms // 20000 AS bucket,
         |                        1 AS delta FROM wf
         |                 UNION ALL
         |                 SELECT dst_ip, end_at_ms // 20000 + 1, -1 FROM wf)
         |           GROUP BY 1, 2),
         |ck AS (SELECT src_ip AS ip, start_at_ms // 20000 AS bucket, 1 AS tag,
         |              CAST(NULL AS BIGINT) AS delta, count(*) AS nc
         |       FROM wf GROUP BY 1, 2),
         |merged AS (SELECT * FROM bounds UNION ALL SELECT * FROM ck),
         |swept AS (SELECT tag, nc,
         |            CAST(sum(coalesce(delta, 0)) OVER (PARTITION BY ip
         |              ORDER BY bucket, tag
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |              AS BIGINT) AS np
         |          FROM merged),
         |keys AS (SELECT np, nc FROM swept WHERE tag = 1),
         |tot AS (SELECT count(*) AS n_msgs,
         |          CAST(sum(end_at_ms // 20000 - start_at_ms // 20000 + 1)
         |               AS BIGINT) AS parent_replicas
         |        FROM wf)
         |SELECT count(*) AS n_child_keys,
         |       CAST(sum(np * nc) AS BIGINT) AS total_candidates,
         |       CAST(max(np * nc) AS BIGINT) AS max_candidates,
         |       CAST(min(tot.parent_replicas) AS BIGINT) AS parent_replicas,
         |       CAST(min(tot.n_msgs) AS BIGINT) AS n_msgs,
         |       CAST(min(tot.parent_replicas) * 1000 // min(tot.n_msgs)
         |            AS BIGINT) AS replication_permille
         |FROM keys CROSS JOIN tot""".stripMargin,
    "q_peak_concurrency" ->
      s"""WITH $msgsCte,
         |wf AS (SELECT * FROM msgs WHERE end_at_ms >= start_at_ms),
         |b AS (SELECT ip, t, CAST(sum(delta) AS BIGINT) AS delta FROM (
         |        SELECT dst_ip AS ip, start_at_ms AS t, 1 AS delta FROM wf
         |        UNION ALL
         |        SELECT dst_ip, end_at_ms + 1, -1 FROM wf)
         |      GROUP BY 1, 2),
         |c AS (SELECT ip, CAST(max(cur) AS BIGINT) AS peak_concurrent FROM (
         |        SELECT ip, sum(delta) OVER (PARTITION BY ip ORDER BY t
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cur
         |        FROM b)
         |      GROUP BY 1),
         |n AS (SELECT dst_ip AS ip, count(*) AS n_calls FROM wf GROUP BY 1)
         |SELECT c.ip, c.peak_concurrent, n.n_calls
         |FROM c JOIN n ON c.ip = n.ip
         |ORDER BY c.peak_concurrent DESC, c.ip LIMIT 20""".stripMargin,
    // Two unrolled integer-PageRank iterations; every step is `div`-exact
    // so both engines produce identical longs (DuckDB sum→HUGEINT is
    // normalized by the outer CASTs).
    "q_pagerank" ->
      s"""WITH $msgsCte, $linksCte,
         |outdeg AS (SELECT parent_id, count(*) AS outdeg FROM links GROUP BY 1),
         |r0 AS (SELECT id, CAST(1000 AS BIGINT) AS pr FROM msgs),
         |c1 AS (SELECT l.child_id AS id, sum(850 * (r.pr // o.outdeg)) AS c
         |       FROM links l JOIN outdeg o ON l.parent_id = o.parent_id
         |                    JOIN r0 r ON l.parent_id = r.id
         |       GROUP BY 1),
         |r1 AS (SELECT m.id, CAST(150 + coalesce(c.c, 0) // 1000 AS BIGINT) AS pr
         |       FROM msgs m LEFT JOIN c1 c ON m.id = c.id),
         |c2 AS (SELECT l.child_id AS id, sum(850 * (r.pr // o.outdeg)) AS c
         |       FROM links l JOIN outdeg o ON l.parent_id = o.parent_id
         |                    JOIN r1 r ON l.parent_id = r.id
         |       GROUP BY 1),
         |r2 AS (SELECT m.id, CAST(150 + coalesce(c.c, 0) // 1000 AS BIGINT) AS pr
         |       FROM msgs m LEFT JOIN c2 c ON m.id = c.id)
         |SELECT r2.id, r1.pr AS pr_prev, r2.pr AS pr
         |FROM r2 JOIN r1 ON r2.id = r1.id
         |ORDER BY r2.id""".stripMargin,
    // Support ≥ 2 (co-occurrence in at least two orders) is the edge
    // semantics: single co-occurrences are linear-growing noise.
    "q_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |e AS (SELECT u, v FROM (
        |        SELECT a.pk AS u, b.pk AS v, count(*) AS c
        |        FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
        |        GROUP BY 1, 2)
        |      WHERE c >= 2),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |        FROM e e1 JOIN e e2 ON e1.v = e2.u
        |                  JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v),
        |pn AS (SELECT pk, count(*) AS n_triangles
        |       FROM (SELECT a AS pk FROM tri
        |             UNION ALL SELECT b FROM tri
        |             UNION ALL SELECT c FROM tri)
        |       GROUP BY 1)
        |SELECT pk, n_triangles FROM pn
        |ORDER BY n_triangles DESC, pk LIMIT 20""".stripMargin,
    "q_top_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS em
        |           FROM events),
        |tri AS (SELECT event_type || '>' || t2 || '>' || t3 AS path FROM (
        |          SELECT event_type,
        |                 lead(event_type, 1) OVER w AS t2,
        |                 lead(event_type, 2) OVER w AS t3
        |          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY em, event_id))
        |        WHERE t2 IS NOT NULL AND t3 IS NOT NULL),
        |c AS (SELECT path, count(*) AS n FROM tri GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
        |SELECT path, n, CAST(n * 1000 // t.n_total AS BIGINT) AS share_permille
        |FROM c CROSS JOIN t
        |ORDER BY n DESC, path LIMIT 25""".stripMargin,
    "q_props_k" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(min(k) AS BIGINT) AS min_k,
        |       CAST(max(k) AS BIGINT) AS max_k,
        |       CAST(sum(k) // count(*) AS BIGINT) AS avg_k
        |FROM (SELECT event_type, CAST(props ->> '$.k' AS BIGINT) AS k FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
