package graft
package entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables
import OracleCtes._

/** Query + oracle registry: statistical / behavioral analytics: funnels, retention, moments, rank statistics, outlier families.
  *
  * Split out of the former SparkEntry monolith (round 9); merged back into
  * the driver contract by [[graft.SparkEntry]]. Key sets of [[queries]] and
  * [[oracles]] stay aligned — EntryRegistrySpec enforces it.
  */
object AnalyticsQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cohort_matrix" -> ((s, d) => Analytics.cohortMatrix(s, d)),
    // HLL sketch with a *checkable* accuracy contract: the estimate itself is
    // engine-specific, so the emitted columns are the exact distinct count
    // plus a deterministic `within_2pct` flag (|estimate − exact|·50 ≤ exact).
    // The DuckDB oracle asserts the flag is 1, making the sketch's accuracy
    // claim part of the hash-checked contract instead of a rows-only row.
    "q_approx_distinct" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      sources.Tables.load(s, d, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.01).as("est"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("est") - col("exact_users")) * 50 <= col("exact_users"))
            .cast("long").as("within_2pct"))
        .orderBy("event_type")
    }),
    "q_percentiles" -> ((s, d) => Analytics.quantityPercentiles(s, d)),
    "q_funnel" -> ((s, d) => Analytics.funnelStages(s, d)),
    "q_corr_moments" -> ((s, d) => Analytics.corrMoments(s, d)),
    "q_day_retention" -> ((s, d) => Analytics.dayRetention(s, d)),
    "q_iqr_outliers" -> ((s, d) => Analytics.iqrOutliers(s, d)),
    "q_markov_transitions" -> ((s, d) => Analytics.markovTransitions(s, d)),
    "q_rfm_segments" -> ((s, d) => Analytics.rfmSegments(s, d)),
    "q_pareto_share" -> ((s, d) => Analytics.paretoShare(s, d)),
    "q_gini_spend" -> ((s, d) => Analytics.giniSpend(s, d)),
    "q_streaks" -> ((s, d) => Analytics.activityStreaks(s, d)),
    "q_mad_outliers" -> ((s, d) => Analytics.madOutliers(s, d)),
    "q_ab_lift" -> ((s, d) => Analytics.abLift(s, d)),
    "q_latency_log2" -> ((s, d) => Analytics.latencyLog2(s, d)),
    "q_dau_wau" -> ((s, d) => Analytics.dauWau(s, d)),
    "q_time_to_convert" -> ((s, d) => Analytics.timeToConvert(s, d)),
    "q_rich_idle" -> ((s, d) => Relational.qRichIdleCustomers(s, d)),
    "q_profile_events" -> ((s, d) => Relational.qProfileEvents(s, d)),
    "q_hourly_seasonality" -> ((s, d) => Relational.qHourlySeasonality(s, d)),
    "q_approx_quantile" -> ((s, d) => Analytics.approxQuantile(s, d)),
    "q_percent_rank" -> ((s, d) => Relational.qPercentRank(s, d)),
    "q_overlap_count" -> ((s, d) => Analytics.overlapCount(s, d)),
    "q_type_jaccard" -> ((s, d) => Analytics.typeUserJaccard(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "q_cohort_matrix" ->
      """WITH a AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
        |           FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
        |       count(*) AS n_active
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // The oracle asserts the sketch contract: Spark's HLL++ estimate must be
    // within 2% of the exact count (the flag is computed Spark-side from the
    // real estimate; the oracle pins it to 1, so an out-of-tolerance sketch
    // hash-mismatches).
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |       count(*) AS n, CAST(1 AS BIGINT) AS within_2pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_percentiles" ->
      """WITH r AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |                  row_number() OVER (PARTITION BY l_returnflag
        |                                     ORDER BY l_quantity) AS rn
        |           FROM lineitem),
        |n AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |       min(CASE WHEN rn = (n + 3) // 4 THEN q END) AS p25,
        |       min(CASE WHEN rn = (n + 1) // 2 THEN q END) AS p50,
        |       min(CASE WHEN rn = (9 * n + 9) // 10 THEN q END) AS p90,
        |       max(q) AS qmax,
        |       min(n) AS n
        |FROM r JOIN n USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_funnel" ->
      """WITH j AS (
        |  SELECT user_id,
        |         string_agg(substr(event_type, 1, 1), ''
        |                    ORDER BY epoch_ms(ts), event_id) AS seq
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
        |  GROUP BY 1),
        |s AS (SELECT user_id,
        |        CASE WHEN regexp_matches(seq, 'v.*c.*p') THEN 3
        |             WHEN regexp_matches(seq, 'v.*c') THEN 2
        |             WHEN regexp_matches(seq, 'v') THEN 1
        |             ELSE 0 END AS stage
        |      FROM j)
        |SELECT CAST(stage AS BIGINT) AS stage, count(*) AS n_users
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_corr_moments" ->
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(x) AS BIGINT) AS sum_x,
        |       CAST(sum(y) AS BIGINT) AS sum_y,
        |       CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |       CAST(sum(x * x) AS BIGINT) AS sum_x2,
        |       CAST(sum(y * y) AS BIGINT) AS sum_y2
        |FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
        |             CAST(round(l_extendedprice) AS BIGINT) AS y
        |      FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_day_retention" ->
      """WITH a AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
        |           FROM events),
        |r AS (SELECT a.day, count(*) AS n_retained
        |      FROM a JOIN a b ON a.user_id = b.user_id AND b.day = a.day + 1
        |      GROUP BY 1)
        |SELECT a.day, count(*) AS n_active,
        |       coalesce(min(r.n_retained), 0) AS n_retained
        |FROM a LEFT JOIN r ON a.day = r.day
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_iqr_outliers" ->
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events),
        |rk AS (SELECT event_type, v,
        |              row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
        |       FROM e),
        |n AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1),
        |q AS (SELECT event_type,
        |        min(CASE WHEN rn = (n + 3) // 4 THEN v END) AS q1,
        |        min(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS q3
        |      FROM rk JOIN n USING (event_type) GROUP BY 1),
        |b AS (SELECT event_type, q1 * 2 - (q3 - q1) * 3 AS lo2,
        |             q3 * 2 + (q3 - q1) * 3 AS hi2
        |      FROM q)
        |SELECT event_type, count(*) AS n,
        |       CAST(sum(CASE WHEN v * 2 < lo2 OR v * 2 > hi2 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_outliers
        |FROM e JOIN b USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_markov_transitions" ->
      """WITH t AS (
        |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY epoch_ms(ts), event_id) AS from_type,
        |         event_type AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n
        |FROM t WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_rfm_segments" ->
      """WITH u AS (
        |  SELECT user_id, max(epoch_ms(ts)) AS last_ms, count(*) AS frequency,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS monetary_cents
        |  FROM events GROUP BY 1)
        |SELECT user_id, last_ms, frequency, monetary_cents,
        |       CAST(ntile(5) OVER (ORDER BY last_ms, user_id) AS BIGINT)
        |         AS r_score,
        |       CAST(ntile(5) OVER (ORDER BY frequency, user_id) AS BIGINT)
        |         AS f_score,
        |       CAST(ntile(5) OVER (ORDER BY monetary_cents, user_id) AS BIGINT)
        |         AS m_score
        |FROM u ORDER BY user_id""".stripMargin,
    "q_pareto_share" ->
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS spend_cents,
        |         count(*) AS n_events
        |  FROM events GROUP BY 1),
        |r AS (SELECT *, row_number() OVER (ORDER BY spend_cents DESC, user_id)
        |        AS rk FROM u),
        |n AS (SELECT count(*) AS n FROM u)
        |SELECT (SELECT n FROM n) AS n_users,
        |       CAST(sum(CASE WHEN rk <= ((SELECT n FROM n) + 4) // 5
        |                THEN n_events ELSE 0 END) AS BIGINT) AS top20_events,
        |       CAST(sum(n_events) AS BIGINT) AS total_events,
        |       CAST(sum(CASE WHEN rk <= ((SELECT n FROM n) + 4) // 5
        |                THEN n_events ELSE 0 END) * 1000
        |            // sum(n_events) AS BIGINT) AS event_share_permille,
        |       CAST(sum(CASE WHEN rk <= ((SELECT n FROM n) + 4) // 5
        |                THEN spend_cents ELSE 0 END) * 1000
        |            // sum(spend_cents) AS BIGINT) AS spend_share_permille
        |FROM r""".stripMargin,
    "q_gini_spend" ->
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(greatest(sum(CAST(round(value * 100) AS BIGINT)), 0)
        |              AS BIGINT)
        |           AS spend_cents
        |  FROM events GROUP BY 1),
        |r AS (SELECT spend_cents,
        |        CAST(row_number() OVER (ORDER BY spend_cents, user_id) AS BIGINT)
        |          AS rk
        |      FROM u),
        |n AS (SELECT count(*) AS n FROM u)
        |SELECT (SELECT n FROM n) AS n_users,
        |       CAST(sum(spend_cents) AS BIGINT) AS total_cents,
        |       CAST((2 * sum(rk * spend_cents)
        |             - ((SELECT n FROM n) + 1) * sum(spend_cents)) * 1000
        |            // ((SELECT n FROM n) * sum(spend_cents)) AS BIGINT)
        |         AS gini_permille
        |FROM r""".stripMargin,
    "q_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
        |              FROM events),
        |runs AS (SELECT user_id,
        |           day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |         FROM days),
        |s AS (SELECT user_id, grp, count(*) AS len FROM runs GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
        |       count(*) AS n_streaks, CAST(max(len) AS BIGINT) AS max_streak
        |FROM s GROUP BY 1 ORDER BY user_id""".stripMargin,
    // Exact integer median / MAD via rank-at-position (ties-safe: the value
    // at rank k is order-independent among duplicates).
    "q_mad_outliers" ->
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events),
        |c AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1),
        |r AS (SELECT event_type, v,
        |        row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
        |      FROM e),
        |med AS (SELECT r.event_type,
        |          min(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
        |        FROM r JOIN c ON r.event_type = c.event_type GROUP BY 1),
        |d AS (SELECT e.event_type, e.v, abs(e.v - med.med) AS dv, med.med
        |      FROM e JOIN med ON e.event_type = med.event_type),
        |r2 AS (SELECT event_type, dv,
        |         row_number() OVER (PARTITION BY event_type ORDER BY dv) AS rn2
        |       FROM d),
        |mad AS (SELECT r2.event_type,
        |          min(CASE WHEN rn2 = (n + 1) // 2 THEN dv END) AS mad
        |        FROM r2 JOIN c ON r2.event_type = c.event_type GROUP BY 1)
        |SELECT d.event_type, CAST(min(d.med) AS BIGINT) AS med,
        |       CAST(min(mad.mad) AS BIGINT) AS mad, count(*) AS n,
        |       CAST(sum(CASE WHEN d.dv > 3 * mad.mad THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_outliers
        |FROM d JOIN mad ON d.event_type = mad.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_ab_lift" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |a AS (SELECT user_id,
         |        CASE WHEN ${Tables.portableHashSql("'ab:' || user_id")} % 2 = 0
         |             THEN 'control' ELSE 'treatment' END AS grp
         |      FROM u),
         |conv AS (SELECT user_id, CAST(1 AS BIGINT) AS converted
         |         FROM events WHERE event_type = 'purchase'
         |         GROUP BY user_id HAVING count(*) > 13),
         |per AS (SELECT grp, count(*) AS n_users,
         |          CAST(sum(coalesce(converted, 0)) AS BIGINT) AS n_converted
         |        FROM a LEFT JOIN conv ON a.user_id = conv.user_id
         |        GROUP BY 1),
         |p2 AS (SELECT grp, n_users, n_converted,
         |         CAST(n_converted * 1000 // n_users AS BIGINT) AS conv_permille
         |       FROM per)
         |SELECT grp, n_users, n_converted, conv_permille,
         |       conv_permille - (SELECT conv_permille FROM p2
         |                        WHERE grp = 'control') AS lift_permille
         |FROM p2 ORDER BY grp""".stripMargin,
    // Integer-exact log2 bucket via binary-string length (float log2 would
    // risk ulp disagreement at exact powers of two).
    "q_latency_log2" ->
      s"""WITH $msgsCte,
         |v AS (SELECT end_at_ms - start_at_ms + 1 AS v FROM msgs
         |      WHERE end_at_ms >= start_at_ms)
         |SELECT CAST(length(printf('%b', v)) AS BIGINT) AS bucket,
         |       count(*) AS n, CAST(min(v) AS BIGINT) AS min_ms,
         |       CAST(max(v) AS BIGINT) AS max_ms
         |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
        |            FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |w AS (SELECT DISTINCT user_id, day + o AS day
        |      FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o) os),
        |wau AS (SELECT day, count(*) AS wau FROM w GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |       CAST(dau.dau * 1000 // wau.wau AS BIGINT) AS stickiness_permille
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY 1""".stripMargin,
    "q_time_to_convert" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS em FROM events
        |            WHERE event_type IN ('view', 'purchase')),
        |fv AS (SELECT user_id, min(em) AS view_ms FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |d AS (SELECT ev.user_id, min(ev.em - fv.view_ms) AS delta_ms
        |      FROM ev JOIN fv ON ev.user_id = fv.user_id
        |      WHERE ev.event_type = 'purchase' AND ev.em >= fv.view_ms
        |      GROUP BY 1),
        |d2 AS (SELECT user_id % 8 AS cohort, delta_ms FROM d),
        |c AS (SELECT cohort, count(*) AS n FROM d2 GROUP BY 1),
        |r AS (SELECT cohort, delta_ms,
        |        row_number() OVER (PARTITION BY cohort ORDER BY delta_ms) AS rn
        |      FROM d2)
        |SELECT r.cohort, CAST(min(c.n) AS BIGINT) AS n_converted,
        |       CAST(min(CASE WHEN rn = (n + 1) // 2 THEN delta_ms END) AS BIGINT)
        |         AS median_delta_ms
        |FROM r JOIN c ON r.cohort = c.cohort
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_rich_idle" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |           FROM customer),
        |a AS (SELECT CAST(sum(bal_c) // count(*) AS BIGINT) AS avg_bal_c
        |      FROM c WHERE bal_c > 0)
        |SELECT c_mktsegment, count(*) AS n_customers,
        |       CAST(sum(bal_c) AS BIGINT) AS total_bal_c
        |FROM c CROSS JOIN a
        |WHERE bal_c > avg_bal_c
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_profile_events" ->
      """SELECT count(*) AS n_rows,
        |       count(DISTINCT event_id) AS n_distinct_ids,
        |       count(DISTINCT user_id) AS n_users,
        |       count(DISTINCT event_type) AS n_types,
        |       CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_null_props,
        |       CAST(sum(CASE WHEN length(props) = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_empty_props,
        |       CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_negative_values,
        |       CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS min_value_cents,
        |       CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS max_value_cents,
        |       CAST(min(epoch_ms(ts)) AS BIGINT) AS min_ts_ms,
        |       CAST(max(epoch_ms(ts)) AS BIGINT) AS max_ts_ms
        |FROM events""".stripMargin,
    "q_hourly_seasonality" ->
      """SELECT (epoch_ms(ts) // 3600000) % 24 AS hour,
        |       count(*) AS n_events,
        |       count(DISTINCT event_type) AS n_types,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // The quantile sketch's accuracy as a checked contract (the
    // q_approx_distinct pattern): oracle computes the exact median and pins
    // within_1pct to 1; Spark computes the flag from the real t-digest.
    "q_approx_quantile" ->
      """WITH e AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        |           FROM events),
        |rk AS (SELECT event_type, v,
        |              row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
        |       FROM e),
        |n AS (SELECT event_type, count(*) AS n FROM e GROUP BY 1)
        |SELECT event_type, min(n.n) AS n,
        |       min(CASE WHEN rn = (n.n + 1) // 2 THEN v END) AS p50_exact,
        |       CAST(1 AS BIGINT) AS within_1pct
        |FROM rk JOIN n USING (event_type)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_percent_rank" ->
      """SELECT p_brand, p_partkey, price_cents,
        |       percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM (SELECT p_brand, p_partkey,
        |             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
        |      FROM part)
        |WINDOW w AS (PARTITION BY p_brand ORDER BY price_cents, p_partkey)
        |ORDER BY p_brand, price_cents, p_partkey""".stripMargin,
    "q_overlap_count" ->
      s"""WITH $msgsCte,
         |wf AS (SELECT id, src_ip, start_at_ms, end_at_ms FROM msgs
         |       WHERE end_at_ms >= start_at_ms),
         |p AS (SELECT a.id AS id, count(*) AS n_overlap
         |      FROM wf a JOIN wf b ON a.src_ip = b.src_ip AND a.id <> b.id
         |        AND a.start_at_ms <= b.end_at_ms AND b.start_at_ms <= a.end_at_ms
         |      GROUP BY 1)
         |SELECT wf.id, coalesce(p.n_overlap, 0) AS n_overlap
         |FROM wf LEFT JOIN p ON wf.id = p.id
         |ORDER BY wf.id""".stripMargin,
    "q_type_jaccard" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
        |s AS (SELECT event_type, count(*) AS n FROM tu GROUP BY 1),
        |i AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |        count(*) AS inter
        |      FROM tu a JOIN tu b ON a.user_id = b.user_id
        |                         AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT i.type_a, i.type_b, i.inter,
        |       CAST(sa.n + sb.n - i.inter AS BIGINT) AS union_n,
        |       CAST(i.inter * 1000 // (sa.n + sb.n - i.inter) AS BIGINT)
        |         AS jaccard_permille
        |FROM i JOIN s sa ON i.type_a = sa.event_type
        |       JOIN s sb ON i.type_b = sb.event_type
        |ORDER BY 1, 2""".stripMargin,
  )
}
