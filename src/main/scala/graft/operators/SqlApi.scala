package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.GraftFunctions
import graft.sources.Tables

/** The SQL personality: the same engine driven through `spark.sql` over
  * registered views — a user of the reference who prefers SQL gets the
  * identical Catalyst plans the DataFrame API produces, plus the engine's
  * custom expressions (`graft_dot`) as SQL functions.
  */
object SqlApi {

  private def view(spark: SparkSession, dir: String, name: String): Unit =
    Tables.load(spark, dir, name).createOrReplaceTempView(name)

  /** Register every table (plus the derived `msgs` trace view) as temp
    * views AND the engine's custom SQL functions (graft_dot …), making the
    * whole surface addressable from `spark.sql` — the full SQL personality
    * for users coming from the reference, with no dependence on the
    * session having been built with the GraftExtensions conf.
    */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(view(spark, dir, _))
    Tables.msgs(spark, dir).createOrReplaceTempView("msgs")
    graft.functions.GraftFunctions.register(spark)
  }

  /** Revenue by market segment, pure SQL text (same integer-cents policy). */
  def revenueBySegment(spark: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "orders", "customer").foreach(view(spark, dir, _))
    spark.sql(
      """SELECT c_mktsegment,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |            * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
        |         AS revenue_e4,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  /** TPC-H Q17-flavored correlated scalar subquery: parts whose small-order
    * lineitems (quantity below 20% of that part's average) exist, with
    * their counts. Catalyst decorrelates the subquery into an aggregate +
    * join — the rewrite that makes correlated SQL scale (one pass over
    * lineitem for ALL the per-part averages, not one subquery per row).
    * The comparison is double-deterministic cross-engine: both sides
    * compute 0.2·avg from identical integer quantities with IEEE ops.
    */
  def smallQtyParts(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "lineitem")
    spark.sql(
      """SELECT l_partkey,
        |       count(*) AS n_small,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_small_qty
        |FROM lineitem l
        |WHERE l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY l_partkey
        |ORDER BY l_partkey""".stripMargin)
  }

  /** Explicit GROUPING SETS (neither rollup nor cube): per-returnflag and
    * per-linestatus marginals in ONE pass — the arbitrary-sets form only
    * SQL exposes (DataFrame API has rollup/cube). Labels are NULL-free for
    * portable ordering.
    */
  def groupingSetsMarginals(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "lineitem")
    spark.sql(
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END
        |         AS returnflag,
        |       CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END
        |         AS linestatus,
        |       count(*) AS n,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** The 64-row hyperplane table as one FOLDABLE array-of-structs literal
    * (`(b, s)` = plane index, ±1 sign vector), inlining the same
    * md5-derived literals the DuckDB oracle inlines
    * ([[Analytics.hyperplaneSigns]]) — signatures agree bit-for-bit.
    *
    * The signature is computed RELATIONALLY (explode the plane table,
    * one small `graft_dot` per (vector, plane) row, sum the bits into
    * an aggregate) rather than as a single 64-term projection
    * expression: the aggregate materializes each signature ONCE, where
    * the mega-expression form recomputed it per downstream reference
    * (band fan-out × both sides of the self-join) and measured 31.7 s
    * at sf1.0 vs 4.5 s for this form. Two earlier forms are documented
    * failures: 16 inline terms (not corpus-adaptive) and a per-term
    * `b < 4·bits` scalar-subquery guard (64 un-reused subqueries, 2×
    * slower again). Surplus high bits never reach a `band_val`, so
    * signing all 64 planes is result-identical at every scale.
    */
  private def planesSql: String =
    Analytics.hyperplaneSigns.zipWithIndex.map { case (row, b) =>
      val lits = row.map(v => if (v > 0) "1.0D" else "-1.0D")
        .mkString("array(", ",", ")")
      s"named_struct('b', $b, 's', $lits)"
    }.mkString("array(", ",", ")")

  /** Top similar pair per label via `graft_dot` in SQL — the custom codegen
    * expression exposed through the SQL function registry.
    *
    * Candidates come from SRP-LSH banding (4 bands of bits(+1) planes —
    * [[Analytics.lshBandPlan]], the same corpus-adaptive signature family
    * as [[Analytics.lshCosine]] — the `bb` CTE computes the encoded plan
    * `bj = 4·bits + extra` with the identical integer comparison IN SQL,
    * so the query stays a pure `spark.sql` string) restricted to equal
    * labels, then exact-cosine
    * verified and ranked — so the join keys on (label, band, band_val)
    * and the plan carries signatures, not an all-pairs blowup quadratic
    * in label-group size. Like every ANN search, the CONTRACT is
    * index-restricted top-1: the DuckDB oracle replays the identical
    * banding (inlined hyperplane literals, same adaptive-bits
    * subquery), so both sides agree bit-for-bit at every scale.
    * [[sqlCosineByLabelExact]] keeps the all-pairs semantics as the
    * test-scale baseline.
    */
  def sqlCosineByLabel(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    view(spark, dir, "embeddings")
    spark.sql(
      s"""WITH v AS (
         |  SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS e,
         |         sqrt(graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
         |                        CAST(embedding AS ARRAY<DOUBLE>))) AS nrm
         |  FROM embeddings),
         |bb AS (
         |  SELECT coalesce(min(4 * b + j), 64) AS bj
         |  FROM (SELECT explode(sequence(4, 15)) AS b)
         |  LATERAL VIEW explode(sequence(0, 3)) jj AS j
         |  WHERE 1024 * shiftleft(CAST(1 AS BIGINT), b) >=
         |        (SELECT count(*) FROM v) * (8 - j)),
         |sigb AS (
         |  SELECT vec_id,
         |         CAST(sum(CASE WHEN graft_dot(e, p.s) > 0D
         |                       THEN shiftleft(CAST(1 AS BIGINT), p.b)
         |                       ELSE 0L END) AS BIGINT) AS sig
         |  FROM v LATERAL VIEW explode($planesSql) pp AS p
         |  GROUP BY vec_id),
         |sig AS (
         |  SELECT v.vec_id, v.label, v.e, v.nrm, sigb.sig
         |  FROM v JOIN sigb ON v.vec_id = sigb.vec_id),
         |bands AS (
         |  -- bb rides in once as a 1-row cross join: the former four
         |  -- scalar `(SELECT bj FROM bb)` references each planned their
         |  -- own subquery (each re-running bb's `count(*) FROM v` corpus
         |  -- scan), 32 subquery executions per run in the round-18 plan
         |  -- dump; as a join input bb (and its count) is computed once.
         |  SELECT vec_id, label, sig, k,
         |         shiftright(sig,
         |             CAST(k * (bj div 4) + least(k, bj % 4) AS INT)) &
         |           (shiftleft(CAST(1 AS BIGINT),
         |              CAST(bj div 4
         |                   + (CASE WHEN k < bj % 4
         |                      THEN 1 ELSE 0 END) AS INT)) - 1)
         |           AS band_val
         |  FROM sig CROSS JOIN bb
         |  LATERAL VIEW explode(sequence(0, 3)) ks AS k),
         |cand AS (
         |  -- pairs generated map-side from each band bucket's sorted
         |  -- member set — ONE pass over `bands` instead of the former
         |  -- bands⋈bands self-join, whose two references each recomputed
         |  -- the full signature pipeline (no implicit plan sharing).
         |  -- Same pair set: members sorted ascending, (i, j>i) ⇒ va < vb.
         |  SELECT DISTINCT label, p.va AS vec_a, p.vb AS vec_b
         |  FROM (SELECT label, k, band_val,
         |               sort_array(collect_set(vec_id)) AS vs
         |        FROM bands GROUP BY label, k, band_val) g
         |  LATERAL VIEW explode(flatten(transform(vs, (x, i) ->
         |    transform(slice(vs, i + 2, size(vs)),
         |      y -> named_struct('va', x, 'vb', y))))) pp AS p),
         |p AS (
         |  SELECT c.label, c.vec_a, c.vec_b,
         |         graft_dot(va.e, vb.e) / (va.nrm * vb.nrm) AS cos
         |  FROM cand c
         |  JOIN v va ON c.vec_a = va.vec_id
         |  JOIN v vb ON c.vec_b = vb.vec_id),
         |r AS (
         |  SELECT label, vec_a, vec_b, cos,
         |         row_number() OVER (PARTITION BY label
         |                            ORDER BY cos DESC, vec_a, vec_b) AS rk
         |  FROM p)
         |SELECT label, vec_a, vec_b, cos FROM r WHERE rk = 1
         |ORDER BY label""".stripMargin)
  }

  /** All-pairs form of [[sqlCosineByLabel]] — executable spec, test scale
    * only (quadratic in label-group size by construction).
    */
  def sqlCosineByLabelExact(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    view(spark, dir, "embeddings")
    spark.sql(
      """WITH v AS (
        |  SELECT vec_id, label, CAST(embedding AS ARRAY<DOUBLE>) AS e,
        |         sqrt(graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                        CAST(embedding AS ARRAY<DOUBLE>))) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
        |         graft_dot(a.e, b.e) / (a.nrm * b.nrm) AS cos
        |  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id),
        |r AS (
        |  SELECT label, vec_a, vec_b, cos,
        |         row_number() OVER (PARTITION BY label
        |                            ORDER BY cos DESC, vec_a, vec_b) AS rk
        |  FROM p)
        |SELECT label, vec_a, vec_b, cos FROM r WHERE rk = 1
        |ORDER BY label""".stripMargin)
  }

  /** The MEMOIZED link relation as a SQL view: the SQL user queries the
    * materialized trace-graph artifact (a parquet scan), not a per-query
    * rebuild of the banded interval join — the same discipline every
    * DataFrame consumer gets through [[ChainLink.linksFor]].
    */
  private def linksView(spark: SparkSession, dir: String): Unit =
    ChainLink.linksFor(spark, dir).createOrReplaceTempView("links")

  /** Degree histogram in SQL text over the `links` + `msgs` views — the
    * SQL twin of [[ChainLink.degreeHistogram]] (two distinct-count CTEs,
    * outer-joined back to every message so zero-degree nodes survive).
    */
  def sqlDegreeHist(spark: SparkSession, dir: String): DataFrame = {
    Tables.msgs(spark, dir).createOrReplaceTempView("msgs")
    linksView(spark, dir)
    spark.sql(
      """WITH par AS (SELECT child_id AS id,
        |               count(DISTINCT parent_id) AS parent_cnt
        |             FROM links GROUP BY 1),
        |     chi AS (SELECT parent_id AS id,
        |               count(DISTINCT child_id) AS child_cnt
        |             FROM links GROUP BY 1)
        |SELECT coalesce(p.parent_cnt, 0) AS parent_cnt,
        |       coalesce(c.child_cnt, 0) AS child_cnt,
        |       count(*) AS n
        |FROM msgs m
        |LEFT JOIN par p ON m.id = p.id
        |LEFT JOIN chi c ON m.id = c.id
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin)
  }

  /** Gap sessionization in SQL text (named WINDOW clause + running sum) —
    * the SQL twin of [[ChainLink.sessionize]], identical output.
    */
  def sqlSessions(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "events")
    spark.sql(
      """WITH e AS (
        |  SELECT event_id, user_id, ts DIV 1000000 AS em FROM events),
        |g AS (
        |  SELECT event_id, user_id, em,
        |         CASE WHEN em - lag(em, 1) OVER w > 1800000 THEN 1 ELSE 0 END
        |           AS gap_break
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY em, event_id)),
        |s AS (
        |  SELECT user_id, em, event_id,
        |         CAST(sum(gap_break) OVER (PARTITION BY user_id
        |                ORDER BY em, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(em) AS session_start_ms, max(em) AS session_end_ms
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
  }

  /** Correlated NOT EXISTS in SQL text — the SQL twin of
    * [[Relational.qAntiNoOrders]]; Catalyst decorrelates it into the same
    * left-anti join the DataFrame form declares.
    */
  def sqlAntiNoOrders(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders").foreach(view(spark, dir, _))
    spark.sql(
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 300000.0)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  /** PIVOT syntax in SQL text — the SQL twin of
    * [[Analytics.pivotEventCounts]] (same buckets, same pinned value
    * list; empty cells coalesced to 0 as `na.fill` does there).
    */
  def sqlPivotEvents(spark: SparkSession, dir: String): DataFrame = {
    view(spark, dir, "events")
    spark.sql(
      """SELECT bucket,
        |       coalesce(click, 0L) AS click, coalesce(error, 0L) AS error,
        |       coalesce(purchase, 0L) AS purchase,
        |       coalesce(signup, 0L) AS signup, coalesce(view, 0L) AS view
        |FROM (SELECT user_id % 8 AS bucket, event_type FROM events)
        |PIVOT (count(*) FOR event_type
        |       IN ('click', 'error', 'purchase', 'signup', 'view'))
        |ORDER BY bucket""".stripMargin)
  }
}
