package graft
package entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables
import OracleCtes._

/** Query + oracle registry: embedding similarity search and quantization: exact/IVF ANN, k-means, PQ and SQ8 families with recall audits.
  *
  * Split out of the former SparkEntry monolith (round 9); merged back into
  * the driver contract by [[graft.SparkEntry]]. Key sets of [[queries]] and
  * [[oracles]] stay aligned — EntryRegistrySpec enforces it.
  */
object SimilarityQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_recall" -> ((s, d) => Dedup.annRecall(s, d)),
    "q_ann_recall_kmeans" -> ((s, d) => Dedup.annRecallKmeans(s, d)),
    "q_ivf2_pair_recall" -> ((s, d) => Dedup.ivf2PairRecall(s, d)),
    // similarity search
    "ann_topk" -> ((s, d) => Similarity.annTopk(s, d)),
    "ann_ivf" -> ((s, d) => Similarity.annIvf(s, d)),
    "ann_ivf_kmeans" -> ((s, d) => Similarity.annIvfKmeans(s, d)),
    "q_ivf2_search" -> ((s, d) => Similarity.annIvf2(s, d)),
    "q_ivf2_np2" -> ((s, d) => Similarity.annIvf2Np2(s, d)),
    "q_ivf2_recall" -> ((s, d) => Similarity.ivf2Mrr(s, d)),
    "q_pq_search" -> ((s, d) => Similarity.pqSearch(s, d)),
    // clustering
    "q_kmeans_step" -> ((s, d) => Clustering.kmeansStep(s, d)),
    "q_lsh_cosine" -> ((s, d) => Analytics.lshCosine(s, d)),
    "q_vector_quantize" -> ((s, d) => Similarity.vectorQuantize(s, d)),
    "q_ivf_stats" -> ((s, d) => Similarity.ivfStats(s, d)),
    "q_ivf_purity" -> ((s, d) => Similarity.ivfLabelPurity(s, d)),
    "q_centroid_drift" -> ((s, d) => Clustering.centroidDrift(s, d)),
    "q_pq_recall" -> ((s, d) => Similarity.pqRecall(s, d)),
    "q_pq_ivf_search" -> ((s, d) => Similarity.pqIvfSearch(s, d)),
    "q_pq_recall_trained" -> ((s, d) => Similarity.pqRecallTrained(s, d)),
    "q_pq_res_search" -> ((s, d) => Similarity.pqResSearch(s, d)),
    "q_pq_res_recall" -> ((s, d) => Similarity.pqResRecall(s, d)),
    "q_pq_ivf_trained" -> ((s, d) => Similarity.pqIvfTrainedSearch(s, d)),
    "q_incremental_ivf" -> ((s, d) => Similarity.incrementalIvf(s, d)),
    // seventh wave: int8 scalar-quantization serving, matryoshka truncation,
    // deterministic training-order sharding
    "q_sq_search" -> ((s, d) => Similarity.sqSearch(s, d)),
    "q_sq_ivf_search" -> ((s, d) => Similarity.sqIvfSearch(s, d)),
    "q_sq_recall" -> ((s, d) => Similarity.sqRecall(s, d)),
    "q_mrl_recall" -> ((s, d) => Similarity.mrlRecall(s, d)),
    "q_embed_stats" -> ((s, d) => Similarity.embedStats(s, d)),
    // eighth wave: two-stage exact-rerank serving and hard-negative mining
    "q_rerank" -> ((s, d) => Similarity.rerankSearch(s, d)),
    "q_rerank_recall" -> ((s, d) => Similarity.rerankRecall(s, d)),
    "q_hard_negatives" -> ((s, d) => Similarity.hardNegatives(s, d)),
    "q_triplets" -> ((s, d) => Similarity.tripletMine(s, d)),
    // ninth wave: neighborhood graph + pseudo-labeling
    "q_knn_graph" -> ((s, d) => Neighbors.knnGraph(s, d)),
    "q_knn_recall" -> ((s, d) => Neighbors.knnRecall(s, d)),
    "q_label_prop" -> ((s, d) => Neighbors.labelProp(s, d)),
    "q_knn_clusters" -> ((s, d) => Neighbors.knnClusters(s, d)),
    "q_cc_stars" -> ((s, d) => Neighbors.knnClustersStars(s, d)),
    "q_pca_power" -> ((s, d) => Similarity.pcaPower(s, d)),
    "q_whiten_check" -> ((s, d) => Similarity.whitenCheck(s, d)),
    "q_ann_mrr" -> ((s, d) => Similarity.annMrr(s, d)),
  )

  /** Mutual-kNN clustering oracle (recursive-CTE closure, min-reachable
    * label clipped at own id, singleton fallback) — shared verbatim by
    * `q_knn_clusters` (min-label Pregel kernel) and `q_cc_stars`
    * (large-star/small-star kernel): one ground truth, two engines.
    */
  private lazy val knnClustersSql: String =
    s"""WITH RECURSIVE $vecCte,
       |$knnCtes,
       |me AS MATERIALIZED (SELECT a.src AS s, a.dst AS t FROM ek a
       |       JOIN ek b ON b.src = a.dst AND b.dst = a.src),
       |reach AS (
       |  SELECT s, t FROM me
       |  UNION
       |  SELECT r.s, me.t FROM reach r JOIN me ON r.t = me.s),
       |mn AS (SELECT s, min(t) AS m FROM reach GROUP BY 1),
       |cl AS (SELECT emb.vec_id,
       |         CASE WHEN mn.m IS NULL THEN emb.vec_id
       |              WHEN mn.m < emb.vec_id THEN mn.m
       |              ELSE emb.vec_id END AS cluster_id
       |       FROM embeddings emb LEFT JOIN mn ON emb.vec_id = mn.s),
       |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
       |       FROM cl GROUP BY 1)
       |SELECT cl.vec_id, cl.cluster_id, sz.cluster_size
       |FROM cl JOIN sz USING (cluster_id)
       |ORDER BY cl.vec_id""".stripMargin

  /** Shared kNN-graph CTE chain — centroid table + quantizer base + the
    * ONE-home edge replay [[graft.entry.OracleCtes.knnEdgeCtes]]
    * (probe seed → NN-descent rounds → serving truncation `ek`), shared
    * by `q_knn_graph`, `q_knn_recall`, `q_knn_clusters`/`q_cc_stars` —
    * and, prefixed, by every pair oracle that unions the round-17
    * graph-derived pair candidates.
    */
  private lazy val knnCtes: String =
    s"""${hashMinCte("cents")},
       |$ivf2BaseCtes,
       |${knnEdgeCtes("", "", "cents")}""".stripMargin

  /** Parameterized IVF top-5 CTE chain (assignment → nprobe=2 probes →
    * candidates → ranked top-5 `${p}top`) over centroid table `cents`;
    * expects `v` and the query CTE `q (q_id, qe, qn)` upstream. Shared by
    * the `q_ann_mrr` replay for both index variants.
    */
  private def ivfTop5Ctes(cents: String, p: String): String =
    s"""${p}asg AS (SELECT vec_id, cent_id FROM (
       |  SELECT v.vec_id, c.cent_id,
       |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |           ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
       |           c.cent_id) AS rn
       |  FROM v CROSS JOIN $cents c) WHERE rn = 1),
       |${p}probes AS (SELECT q_id, cent_id FROM (
       |  SELECT q.q_id, c.cent_id,
       |         row_number() OVER (PARTITION BY q.q_id ORDER BY
       |           ${dotSql("q.qe", "c.ce")} / (q.qn * c.cn) DESC,
       |           c.cent_id) AS rn
       |  FROM q CROSS JOIN $cents c) WHERE rn <= 2),
       |${p}cand AS (SELECT pb.q_id, a.vec_id FROM ${p}probes pb
       |            JOIN ${p}asg a ON pb.cent_id = a.cent_id
       |            WHERE a.vec_id <> pb.q_id),
       |${p}top AS (SELECT q_id, n_id, rk FROM (
       |  SELECT cd.q_id, v.vec_id AS n_id,
       |         row_number() OVER (PARTITION BY cd.q_id ORDER BY
       |           ${dotSql("q.qe", "v.e")} / (q.qn * v.nrm) DESC,
       |           v.vec_id) AS rk
       |  FROM ${p}cand cd JOIN q ON cd.q_id = q.q_id
       |  JOIN v ON cd.vec_id = v.vec_id)
       |WHERE rk <= 5)""".stripMargin

  private val pcaLast = s"v${operators.Similarity.PcaIters}"
  private val pcaLastW = s"w${operators.Similarity.PcaIters}"

  /** Shared PCA CTE chain (milli codes `xq` → int64 second-moment `cov` →
    * PcaIters unrolled multiply+normalize stages ending at [[pcaLast]]),
    * replaying [[graft.operators.Similarity.pcaAxisFor]]; consumed by
    * `q_pca_power` and `q_whiten_check`. MATERIALIZED is load-bearing:
    * each stage is referenced twice, so DuckDB's default CTE inlining
    * would re-evaluate the whole upstream chain 2^k times (the same
    * exponential-plan hazard Iterative.round's localCheckpoint guards
    * against on the Spark side).
    */
  private lazy val pcaCtes: String = {
    def mult(vin: String, w: String) =
      s"""$w AS MATERIALIZED (SELECT c.i AS d,
         |  list_reduce(list(c.c * $vin.vv ORDER BY c.j),
         |              (x, y) -> x + y) AS wv
         |FROM cov c JOIN $vin ON c.j = $vin.d GROUP BY c.i)""".stripMargin
    def norm(w: String, vout: String) =
      s"""$vout AS MATERIALIZED (SELECT d, wv / (
         |  SELECT sqrt(list_reduce(list(wv * wv ORDER BY d),
         |                          (x, y) -> x + y)) FROM $w) AS vv
         |FROM $w)""".stripMargin
    val iters = (1 to operators.Similarity.PcaIters).map { k =>
      s"${mult(s"v${k - 1}", s"w$k")},\n${norm(s"w$k", s"v$k")}"
    }.mkString(",\n")
    s"""xq AS MATERIALIZED (SELECT vec_id, di.i - 1 AS d,
       |         CAST(round(e[di.i] * 1000.0e0) AS BIGINT) AS x
       |       FROM v CROSS JOIN
       |         (SELECT unnest(generate_series(1, 64)) AS i) di),
       |cov AS MATERIALIZED (SELECT a.d AS i, b.d AS j,
       |          CAST(sum(a.x * b.x) AS BIGINT) AS c
       |        FROM xq a JOIN xq b USING (vec_id) GROUP BY 1, 2),
       |v0 AS (SELECT unnest(generate_series(0, 63)) AS d, 0.125e0 AS vv),
       |$iters""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // Recall audit: exact all-pairs vs the IVF-restricted pair set, counted
    // both ways plus the permille recall — the index quality as a checked
    // number (replays both mechanisms).
    "q_ann_recall" ->
      s"""WITH $vecCte,
         |ex AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |       FROM v a JOIN v b ON a.vec_id < b.vec_id
         |       WHERE a.vec_id % $auditStrideSql = 0
         |         AND b.vec_id % $auditStrideSql = 0
         |         AND ${dotSql("a.e", "b.e")} / (a.nrm * b.nrm) >= ${operators.Dedup.PairCosThresholdSql}),
         |${hashMinCte("cents")},
         |$ivf2BaseCtes,
         |${ivf2ProbeCte("rpr", "", "cents",
            operators.Dedup.PairCoarseNprobe, operators.Dedup.PairFinePerCell)},
         |${ivfPairCtes("ivp", "rpr")},
         |${knnEdgeCtes("g", "", "cents")},
         |${graphPairsCte("gp", "g")},
         |iv AS (SELECT DISTINCT vec_a, vec_b FROM (
         |         SELECT vec_a, vec_b FROM ivp
         |         UNION ALL SELECT vec_a, vec_b FROM gp)),
         |n AS (SELECT (SELECT count(*) FROM ex) AS n_exact,
         |             (SELECT count(*) FROM iv) AS n_ivf,
         |             (SELECT count(*) FROM ex JOIN iv USING (vec_a, vec_b))
         |               AS n_common)
         |SELECT n_exact, n_ivf, n_common,
         |       CAST(CASE WHEN n_exact = 0 THEN 1000
         |            ELSE n_common * 1000 // n_exact END AS BIGINT)
         |         AS recall_permille
         |FROM n""".stripMargin,
    // Side-by-side recall of the hash-min vs k-means-refined IVF indexes
    // against the exact all-pairs truth (both pair mechanisms replayed).
    "q_ann_recall_kmeans" ->
      s"""WITH $vecCte,
         |$kmeansCtes,
         |ex AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |       FROM v a JOIN v b ON a.vec_id < b.vec_id
         |       WHERE a.vec_id % $auditStrideSql = 0
         |         AND b.vec_id % $auditStrideSql = 0
         |         AND ${dotSql("a.e", "b.e")} / (a.nrm * b.nrm) >= ${operators.Dedup.PairCosThresholdSql}),
         |${ivf2BaseCtesOver("h", "seeds")},
         |${ivf2ProbeCte("hpr", "h", "seeds",
            operators.Dedup.PairCoarseNprobe, operators.Dedup.PairFinePerCell)},
         |${ivfPairCtes("hmp", "hpr")},
         |${knnEdgeCtes("g", "h", "seeds")},
         |${graphPairsCte("gp", "g")},
         |hm AS (SELECT DISTINCT vec_a, vec_b FROM (
         |         SELECT vec_a, vec_b FROM hmp
         |         UNION ALL SELECT vec_a, vec_b FROM gp)),
         |${ivf2BaseCtesOver("k", "kcents")},
         |${ivf2ProbeCte("kpr", "k", "kcents",
            operators.Dedup.PairCoarseNprobe, operators.Dedup.PairFinePerCell)},
         |${ivfPairCtes("kmp", "kpr")},
         |km AS (SELECT vec_a, vec_b FROM kmp),
         |n AS (SELECT (SELECT count(*) FROM ex) AS n_exact,
         |             (SELECT count(*) FROM ex JOIN hm USING (vec_a, vec_b))
         |               AS n_hashmin,
         |             (SELECT count(*) FROM ex JOIN km USING (vec_a, vec_b))
         |               AS n_kmeans)
         |SELECT n_exact, n_hashmin, n_kmeans,
         |       CAST(CASE WHEN n_exact = 0 THEN 1000
         |            ELSE n_hashmin * 1000 // n_exact END AS BIGINT)
         |         AS recall_hashmin_permille,
         |       CAST(CASE WHEN n_exact = 0 THEN 1000
         |            ELSE n_kmeans * 1000 // n_exact END AS BIGINT)
         |         AS recall_kmeans_permille
         |FROM n""".stripMargin,
    // Decision evidence for the r15 routed-pair production switch: the
    // exact truth (audit stride), the production single-level nprobe=8
    // pair set, AND the two-level-routed pair set (top-2 coarse, top-4
    // fine per cell) — every mechanism replayed bit-for-bit, plus the
    // routed build's retention of the production pair mass (held).
    "q_ivf2_pair_recall" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |$ivf2BaseCtes,
         |ex AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |       FROM v a JOIN v b ON a.vec_id < b.vec_id
         |       WHERE a.vec_id % $auditStrideSql = 0
         |         AND b.vec_id % $auditStrideSql = 0
         |         AND ${dotSql("a.e", "b.e")} / (a.nrm * b.nrm) >= ${operators.Dedup.PairCosThresholdSql}),
         |probes AS (SELECT vec_id, cent_id FROM (
         |             SELECT v.vec_id, c.cent_id,
         |                    row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                      ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                      c.cent_id) AS rn
         |             FROM v CROSS JOIN cents c
         |             WHERE v.vec_id % $auditStrideSql = 0) WHERE rn <= 8),
         |${ivfPairCtes("slp", "probes")},
         |single AS (SELECT vec_a, vec_b FROM slp),
         |${ivf2ProbeCte("rpr", "", "cents",
            operators.Dedup.PairCoarseNprobe, operators.Dedup.PairFinePerCell)},
         |${ivfPairCtes("rtp", "rpr")},
         |${knnEdgeCtes("g", "", "cents")},
         |${graphPairsCte("gp", "g")},
         |routed AS (SELECT DISTINCT vec_a, vec_b FROM (
         |         SELECT vec_a, vec_b FROM rtp
         |         UNION ALL SELECT vec_a, vec_b FROM gp)),
         |n AS (SELECT (SELECT count(*) FROM ex) AS n_exact,
         |             (SELECT count(*) FROM single) AS n_single,
         |             (SELECT count(*) FROM routed) AS n_routed,
         |             (SELECT count(*) FROM single JOIN routed USING (vec_a, vec_b))
         |               AS n_held,
         |             (SELECT count(*) FROM ex JOIN single USING (vec_a, vec_b))
         |               AS n_single_hit,
         |             (SELECT count(*) FROM ex JOIN routed USING (vec_a, vec_b))
         |               AS n_routed_hit)
         |SELECT n_exact, n_single, n_routed, n_held,
         |       CAST(CASE WHEN n_exact = 0 THEN 1000
         |            ELSE n_single_hit * 1000 // n_exact END AS BIGINT)
         |         AS recall_single_permille,
         |       CAST(CASE WHEN n_exact = 0 THEN 1000
         |            ELSE n_routed_hit * 1000 // n_exact END AS BIGINT)
         |         AS recall_routed_permille,
         |       CAST(CASE WHEN n_single = 0 THEN 1000
         |            ELSE n_held * 1000 // n_single END AS BIGINT)
         |         AS held_permille
         |FROM n""".stripMargin,
    "ann_topk" ->
      s"""WITH $vecCte,
         |p AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
         |        ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
         |      FROM v q JOIN v t ON t.vec_id <> q.vec_id
         |      WHERE q.vec_id % $panelStepSql = 0)
         |SELECT q_id, n_id, cos, rk FROM (
         |  SELECT q_id, n_id, cos,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
         |  FROM p)
         |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "ann_ivf" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |asg AS (SELECT vec_id, cent_id FROM (
         |          SELECT v.vec_id, c.cent_id,
         |                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                   ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                   c.cent_id) AS rn
         |          FROM v CROSS JOIN cents c) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v
         |      WHERE vec_id % $panelStepSql = 0),
         |probes AS (SELECT q_id, cent_id FROM (
         |             SELECT q.q_id, c.cent_id,
         |                    row_number() OVER (PARTITION BY q.q_id ORDER BY
         |                      ${dotSql("q.qe", "c.ce")} / (q.qn * c.cn) DESC,
         |                      c.cent_id) AS rn
         |             FROM q CROSS JOIN cents c) WHERE rn <= 2),
         |cand AS (SELECT p.q_id, a.vec_id FROM probes p
         |         JOIN asg a ON p.cent_id = a.cent_id
         |         WHERE a.vec_id <> p.q_id)
         |SELECT q_id, n_id, cos, rk FROM (
         |  SELECT cand.q_id, v.vec_id AS n_id,
         |         ${dotSql("q.qe", "v.e")} / (q.qn * v.nrm) AS cos,
         |         row_number() OVER (PARTITION BY cand.q_id ORDER BY
         |           ${dotSql("q.qe", "v.e")} / (q.qn * v.nrm) DESC, v.vec_id) AS rk
         |  FROM cand JOIN q ON cand.q_id = q.q_id JOIN v ON cand.vec_id = v.vec_id)
         |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // ann_ivf with the k-means-refined centroid table: identical search
    // mechanics, centroids from the replayed 2-iteration Lloyd loop.
    "ann_ivf_kmeans" ->
      s"""WITH $vecCte,
         |$kmeansCtes,
         |asg AS (SELECT vec_id, cent_id FROM (
         |          SELECT v.vec_id, c.cent_id,
         |                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                   ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                   c.cent_id) AS rn
         |          FROM v CROSS JOIN kcents c) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v
         |      WHERE vec_id % $panelStepSql = 0),
         |probes AS (SELECT q_id, cent_id FROM (
         |             SELECT q.q_id, c.cent_id,
         |                    row_number() OVER (PARTITION BY q.q_id ORDER BY
         |                      ${dotSql("q.qe", "c.ce")} / (q.qn * c.cn) DESC,
         |                      c.cent_id) AS rn
         |             FROM q CROSS JOIN kcents c) WHERE rn <= 2),
         |cand AS (SELECT p.q_id, a.vec_id FROM probes p
         |         JOIN asg a ON p.cent_id = a.cent_id
         |         WHERE a.vec_id <> p.q_id)
         |SELECT q_id, n_id, cos, rk FROM (
         |  SELECT cand.q_id, v.vec_id AS n_id,
         |         ${dotSql("q.qe", "v.e")} / (q.qn * v.nrm) AS cos,
         |         row_number() OVER (PARTITION BY cand.q_id ORDER BY
         |           ${dotSql("q.qe", "v.e")} / (q.qn * v.nrm) DESC, v.vec_id) AS rk
         |  FROM cand JOIN q ON cand.q_id = q.q_id JOIN v ON cand.vec_id = v.vec_id)
         |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // Replays the PQ pipeline: 16 hash-min codebook vectors, 8×8-dim
    // subspaces, L2² left-fold encode argmin, micro-unit integer ADC sums.
    "q_pq_search" ->
      s"""WITH $vecCte,
         |$pqCtes
         |SELECT q_id, n_id, adc_q, rk FROM (
         |  SELECT q_id, n_id, adc_q,
         |         row_number() OVER (PARTITION BY q_id ORDER BY adc_q, n_id) AS rk
         |  FROM adc)
         |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // Replays the round-15 two-level-routed Lloyd assignment (top-1
    // coarse cell of the seed table's hash-min prefix, then within-cell
    // argmax) + the integer micro-unit update.
    "q_kmeans_step" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |$ivf2BaseCtes,
         |${ivf2AsgCte("ksa", "", "cents")},
         |asg AS (SELECT a.vec_id, a.cent_id AS cluster_id, v.e
         |        FROM ksa a JOIN v ON v.vec_id = a.vec_id),
         |pts AS (SELECT cluster_id, di.i - 1 AS dim,
         |               CAST(round(e[di.i] * 1000000.0) AS BIGINT) AS q
         |        FROM asg CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) di)
         |SELECT cluster_id, CAST(dim AS BIGINT) AS dim,
         |       CAST(trunc(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT) AS centroid_q,
         |       count(*) AS n_members
         |FROM pts GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_lsh_cosine" -> lshCosineSql,
    "q_vector_quantize" ->
      s"""WITH $vecCte,
         |p AS (SELECT vec_id, di.i - 1 AS dim, e[di.i] AS x
         |      FROM v CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) di),
         |s AS (SELECT dim, max(abs(x)) AS maxabs FROM p GROUP BY 1)
         |SELECT vec_id, CAST(p.dim AS BIGINT) AS dim,
         |       CAST(round(x * 127.0 / maxabs) AS BIGINT) AS q
         |FROM p JOIN s ON p.dim = s.dim
         |ORDER BY vec_id, dim""".stripMargin,
    // Replays the ann_ivf nprobe=1 assignment; per-centroid bucket sizes.
    "q_ivf_stats" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |asg AS (SELECT vec_id, cent_id FROM (
         |          SELECT v.vec_id, c.cent_id,
         |                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                   ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                   c.cent_id) AS rn
         |          FROM v CROSS JOIN cents c) WHERE rn = 1)
         |SELECT cent_id, count(*) AS n_vecs,
         |       CAST(count(*) * 1000 // (SELECT count(*) FROM asg) AS BIGINT)
         |         AS share_permille
         |FROM asg GROUP BY 1 ORDER BY 1""".stripMargin,
    // Replays the nprobe=1 assignment; per-bucket majority label + purity.
    "q_ivf_purity" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |asg AS (SELECT vec_id, cent_id FROM (
         |          SELECT v.vec_id, c.cent_id,
         |                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                   ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                   c.cent_id) AS rn
         |          FROM v CROSS JOIN cents c) WHERE rn = 1),
         |cl AS (SELECT a.cent_id, CAST(e.label AS BIGINT) AS label,
         |         count(*) AS n_lab
         |       FROM asg a JOIN embeddings e ON a.vec_id = e.vec_id
         |       GROUP BY 1, 2),
         |r AS (SELECT cent_id, label, n_lab,
         |        row_number() OVER (PARTITION BY cent_id
         |                           ORDER BY n_lab DESC, label) AS rk,
         |        CAST(sum(n_lab) OVER (PARTITION BY cent_id) AS BIGINT)
         |          AS n_total
         |      FROM cl)
         |SELECT cent_id, label AS majority_label,
         |       CAST(n_lab AS BIGINT) AS n_majority, n_total,
         |       CAST(n_lab * 1000 // n_total AS BIGINT) AS purity_permille
         |FROM r WHERE rk = 1 ORDER BY cent_id""".stripMargin,
    "q_centroid_drift" ->
      s"""WITH $vecCte,
         |$kmeansCtes
         |SELECT s.cent_id,
         |       CAST(floor(1000.0 * ${dotSql("s.ce", "k.ce")}
         |                  / (s.cn * k.cn)) AS BIGINT) AS cos_permille
         |FROM seeds s JOIN kcents k ON s.cent_id = k.cent_id
         |ORDER BY s.cent_id""".stripMargin,
    "q_pq_recall" ->
      s"""WITH $vecCte,
         |$pqCtes,
         |$pqIvfCtes,
         |pqt AS (SELECT q_id, n_id FROM (
         |          SELECT q_id, n_id,
         |                 row_number() OVER (PARTITION BY q_id
         |                   ORDER BY adc_q, n_id) AS rk
         |          FROM adc) WHERE rk <= 5),
         |pqit AS (SELECT q_id, n_id FROM (
         |           SELECT q_id, n_id,
         |                  row_number() OVER (PARTITION BY q_id
         |                    ORDER BY adc_q, n_id) AS rk
         |           FROM adci) WHERE rk <= 5),
         |ep AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
         |         ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
         |       FROM v q JOIN v t ON t.vec_id <> q.vec_id
         |       WHERE q.vec_id % $panelStepSql = 0),
         |ext AS (SELECT q_id, n_id FROM (
         |          SELECT q_id, n_id,
         |                 row_number() OVER (PARTITION BY q_id
         |                   ORDER BY cos DESC, n_id) AS rk
         |          FROM ep) WHERE rk <= 5),
         |n AS (SELECT (SELECT count(DISTINCT q_id) FROM ext) AS n_queries,
         |             (SELECT count(*) FROM ext JOIN pqt USING (q_id, n_id))
         |               AS n_hits,
         |             (SELECT count(*) FROM ext JOIN pqit USING (q_id, n_id))
         |               AS n_hits_ivf)
         |SELECT n_queries, n_hits, n_hits_ivf,
         |       n_hits * 1000 // (n_queries * 5) AS recall_permille,
         |       n_hits_ivf * 1000 // (n_queries * 5) AS recall_ivf_permille
         |FROM n""".stripMargin,
    // Replays the PQ∘IVF composition: identical codebook/encode/ADC tables,
    // scoring restricted to each query's nprobe=2 probed hash-min buckets.
    "q_pq_ivf_search" ->
      s"""WITH $vecCte,
         |$pqCtes,
         |$pqIvfCtes
         |SELECT q_id, n_id, adc_q, rk FROM (
         |  SELECT q_id, n_id, adc_q,
         |         row_number() OVER (PARTITION BY q_id ORDER BY adc_q, n_id) AS rk
         |  FROM adci)
         |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // Replays the per-subspace Lloyd codebook training and audits the full
    // seed/trained × full-scan/IVF recall matrix against the exact top-5.
    "q_pq_recall_trained" ->
      s"""WITH $vecCte,
         |$pqCtes,
         |$pqIvfCtes,
         |$pqTrainCtes,
         |$pqIvfTrainedCte,
         |stop5 AS (SELECT q_id, n_id FROM (
         |            SELECT q_id, n_id,
         |                   row_number() OVER (PARTITION BY q_id
         |                     ORDER BY adc_q, n_id) AS rk
         |            FROM adc) WHERE rk <= 5),
         |sitop5 AS (SELECT q_id, n_id FROM (
         |             SELECT q_id, n_id,
         |                    row_number() OVER (PARTITION BY q_id
         |                      ORDER BY adc_q, n_id) AS rk
         |             FROM adci) WHERE rk <= 5),
         |ttop5 AS (SELECT q_id, n_id FROM (
         |            SELECT q_id, n_id,
         |                   row_number() OVER (PARTITION BY q_id
         |                     ORDER BY adc_q, n_id) AS rk
         |            FROM tadc) WHERE rk <= 5),
         |titop5 AS (SELECT q_id, n_id FROM (
         |             SELECT q_id, n_id,
         |                    row_number() OVER (PARTITION BY q_id
         |                      ORDER BY adc_q, n_id) AS rk
         |             FROM tadci) WHERE rk <= 5),
         |ep AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
         |         ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
         |       FROM v q JOIN v t ON t.vec_id <> q.vec_id
         |       WHERE q.vec_id % $panelStepSql = 0),
         |ext AS (SELECT q_id, n_id FROM (
         |          SELECT q_id, n_id,
         |                 row_number() OVER (PARTITION BY q_id
         |                   ORDER BY cos DESC, n_id) AS rk
         |          FROM ep) WHERE rk <= 5),
         |n AS (SELECT (SELECT count(DISTINCT q_id) FROM ext) AS n_queries,
         |             (SELECT count(*) FROM ext JOIN stop5 USING (q_id, n_id))
         |               AS n_hits_seed,
         |             (SELECT count(*) FROM ext JOIN sitop5 USING (q_id, n_id))
         |               AS n_hits_seed_ivf,
         |             (SELECT count(*) FROM ext JOIN ttop5 USING (q_id, n_id))
         |               AS n_hits_trained,
         |             (SELECT count(*) FROM ext JOIN titop5 USING (q_id, n_id))
         |               AS n_hits_trained_ivf)
         |SELECT n_queries, n_hits_seed, n_hits_seed_ivf, n_hits_trained,
         |       n_hits_trained_ivf,
         |       n_hits_seed * 1000 // (n_queries * 5) AS recall_seed_permille,
         |       n_hits_seed_ivf * 1000 // (n_queries * 5)
         |         AS recall_seed_ivf_permille,
         |       n_hits_trained * 1000 // (n_queries * 5)
         |         AS recall_trained_permille,
         |       n_hits_trained_ivf * 1000 // (n_queries * 5)
         |         AS recall_trained_ivf_permille
         |FROM n""".stripMargin,
    // Replays residual-PQ∘IVF (IVFADC): residual encode against the
    // assigned centroid, per-(query, probed-centroid) ADC tables,
    // bucket-restricted scoring.
    "q_pq_res_search" ->
      s"""WITH $vecCte,
         |$pqCtes,
         |$pqIvfCtes,
         |$pqResCtes
         |SELECT q_id, n_id, adc_q, rk FROM (
         |  SELECT q_id, n_id, adc_q,
         |         row_number() OVER (PARTITION BY q_id ORDER BY adc_q, n_id) AS rk
         |  FROM radc)
         |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // Residual vs plain PQ∘IVF recall against the exact top-5 (all three
    // chains replayed).
    "q_pq_res_recall" ->
      s"""WITH $vecCte,
         |$pqCtes,
         |$pqIvfCtes,
         |$pqResCtes,
         |pqit AS (SELECT q_id, n_id FROM (
         |           SELECT q_id, n_id,
         |                  row_number() OVER (PARTITION BY q_id
         |                    ORDER BY adc_q, n_id) AS rk
         |           FROM adci) WHERE rk <= 5),
         |rest AS (SELECT q_id, n_id FROM (
         |           SELECT q_id, n_id,
         |                  row_number() OVER (PARTITION BY q_id
         |                    ORDER BY adc_q, n_id) AS rk
         |           FROM radc) WHERE rk <= 5),
         |ep AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
         |         ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
         |       FROM v q JOIN v t ON t.vec_id <> q.vec_id
         |       WHERE q.vec_id % $panelStepSql = 0),
         |ext AS (SELECT q_id, n_id FROM (
         |          SELECT q_id, n_id,
         |                 row_number() OVER (PARTITION BY q_id
         |                   ORDER BY cos DESC, n_id) AS rk
         |          FROM ep) WHERE rk <= 5),
         |n AS (SELECT (SELECT count(DISTINCT q_id) FROM ext) AS n_queries,
         |             (SELECT count(*) FROM ext JOIN pqit USING (q_id, n_id))
         |               AS n_hits_ivf,
         |             (SELECT count(*) FROM ext JOIN rest USING (q_id, n_id))
         |               AS n_hits_res)
         |SELECT n_queries, n_hits_ivf, n_hits_res,
         |       n_hits_ivf * 1000 // (n_queries * 5) AS recall_ivf_permille,
         |       n_hits_res * 1000 // (n_queries * 5) AS recall_res_permille
         |FROM n""".stripMargin,
    // Replays the trained-codebook PQ∘IVF composition — the production
    // IVFPQ configuration: Lloyd-trained codes/ADC tables, scoring
    // restricted to each query's nprobe=2 probed hash-min buckets.
    "q_pq_ivf_trained" ->
      s"""WITH $vecCte,
         |$pqCtes,
         |$pqIvfCtes,
         |$pqTrainCtes,
         |$pqIvfTrainedCte
         |SELECT q_id, n_id, adc_q, rk FROM (
         |  SELECT q_id, n_id, adc_q,
         |         row_number() OVER (PARTITION BY q_id ORDER BY adc_q, n_id) AS rk
         |  FROM tadci)
         |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // Replays incremental IVF maintenance: shard (vec_id % 5 = 0) vs
    // persisted-quantizer assignment, per-bucket growth, integer-exact
    // member-mean drift, and the reindex/keep verdict.
    "q_incremental_ivf" ->
      s"""WITH $vecCte,
         |${hashMinCte("icents")},
         |iasg AS (SELECT vec_id, cent_id FROM (
         |           SELECT v.vec_id, c.cent_id,
         |                  row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                    ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                    c.cent_id) AS rn
         |           FROM v CROSS JOIN icents c) WHERE rn = 1),
         |wv AS (SELECT a.vec_id, a.cent_id, v.e,
         |              (a.vec_id % 5 = 0) AS is_new
         |       FROM iasg a JOIN v ON a.vec_id = v.vec_id),
         |growth AS (SELECT cent_id,
         |                  CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END)
         |                       AS BIGINT) AS n_old,
         |                  CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END)
         |                       AS BIGINT) AS n_new
         |           FROM wv GROUP BY 1),
         |ex AS (SELECT cent_id, is_new, di.i AS dim,
         |              CAST(round(e[di.i] * 1000000.0) AS BIGINT) AS q
         |       FROM wv CROSS JOIN
         |         (SELECT unnest(generate_series(1, 64)) AS i) di),
         |sums AS (SELECT cent_id, dim,
         |                sum(CASE WHEN NOT is_new THEN q END) AS so,
         |                CAST(sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END)
         |                     AS BIGINT) AS no,
         |                sum(q) AS sa, count(*) AS na
         |         FROM ex GROUP BY 1, 2),
         |means AS (SELECT cent_id, dim,
         |                 CAST(trunc(CAST(so AS DOUBLE) / no) AS BIGINT) AS mo,
         |                 CAST(trunc(CAST(sa AS DOUBLE) / na) AS BIGINT) AS ma
         |          FROM sums WHERE no > 0),
         |arrs AS (SELECT cent_id,
         |                list(mo / 1000000.0 ORDER BY dim) AS om,
         |                list(ma / 1000000.0 ORDER BY dim) AS am
         |         FROM means GROUP BY 1),
         |drift AS (SELECT cent_id,
         |                 CAST(floor(1000.0 * ${dotSql("om", "am")} /
         |                      (sqrt(${dotSql("om", "om")}) *
         |                       sqrt(${dotSql("am", "am")}))) AS BIGINT) AS cosp
         |          FROM arrs)
         |SELECT g.cent_id, g.n_old, g.n_new,
         |       g.n_new * 1000 // greatest(g.n_old, 1) AS growth_permille,
         |       coalesce(d.cosp, -1) AS cos_permille,
         |       CASE WHEN g.n_old = 0
         |              OR g.n_new * 1000 // greatest(g.n_old, 1) >= 400
         |              OR coalesce(d.cosp, -1) < 950
         |            THEN 'reindex' ELSE 'keep' END AS verdict
         |FROM growth g LEFT JOIN drift d USING (cent_id)
         |ORDER BY cent_id""".stripMargin,
    "q_sq_search" ->
      s"""WITH $vecCte,
         |$sqCtes
         |SELECT q_id, n_id, dot, rk FROM (
         |  SELECT q_id, n_id, dot,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY dot DESC, n_id) AS rk
         |  FROM sd) WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "q_sq_ivf_search" ->
      s"""WITH $vecCte,
         |$sqCtes,
         |$sqIvfCtes
         |SELECT q_id, n_id, dot, rk FROM (
         |  SELECT q_id, n_id, dot,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY dot DESC, n_id) AS rk
         |  FROM sqdi) WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    "q_sq_recall" ->
      s"""WITH $vecCte,
         |$sqCtes,
         |$sqIvfCtes,
         |sqt AS (SELECT q_id, n_id FROM (
         |          SELECT q_id, n_id,
         |                 row_number() OVER (PARTITION BY q_id
         |                   ORDER BY dot DESC, n_id) AS rk
         |          FROM sd) WHERE rk <= 5),
         |sqit AS (SELECT q_id, n_id FROM (
         |           SELECT q_id, n_id,
         |                  row_number() OVER (PARTITION BY q_id
         |                    ORDER BY dot DESC, n_id) AS rk
         |           FROM sqdi) WHERE rk <= 5),
         |$exactTopCtes,
         |n AS (SELECT (SELECT count(DISTINCT q_id) FROM ext) AS n_queries,
         |             (SELECT count(*) FROM ext JOIN sqt USING (q_id, n_id))
         |               AS n_hits,
         |             (SELECT count(*) FROM ext JOIN sqit USING (q_id, n_id))
         |               AS n_hits_ivf)
         |SELECT n_queries, n_hits, n_hits_ivf,
         |       n_hits * 1000 // (n_queries * 5) AS recall_permille,
         |       n_hits_ivf * 1000 // (n_queries * 5) AS recall_ivf_permille
         |FROM n""".stripMargin,
    "q_mrl_recall" ->
      s"""WITH $vecCte,
         |t16 AS (SELECT vec_id, e[1:16] AS e16,
         |          sqrt(list_reduce(list_transform(e[1:16], x -> x * x),
         |                           (a, b) -> a + b)) AS n16
         |        FROM v),
         |mp AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
         |         ${dotSql("q.e16", "t.e16")} / (q.n16 * t.n16) AS cos
         |       FROM t16 q JOIN t16 t ON t.vec_id <> q.vec_id
         |       WHERE q.vec_id % $panelStepSql = 0),
         |mt AS (SELECT q_id, n_id FROM (
         |         SELECT q_id, n_id,
         |                row_number() OVER (PARTITION BY q_id
         |                  ORDER BY cos DESC, n_id) AS rk
         |         FROM mp) WHERE rk <= 5),
         |$exactTopCtes,
         |n AS (SELECT (SELECT count(DISTINCT q_id) FROM ext) AS n_queries,
         |             (SELECT count(*) FROM ext JOIN mt USING (q_id, n_id))
         |               AS n_hits)
         |SELECT n_queries, n_hits,
         |       n_hits * 1000 // (n_queries * 5) AS recall_permille
         |FROM n""".stripMargin,
    "q_embed_stats" ->
      s"""WITH $vecCte,
         |p AS (SELECT di.i - 1 AS dim,
         |        CAST(round(e[di.i] * 1000000.0) AS BIGINT) AS q
         |      FROM v CROSS JOIN
         |        (SELECT unnest(generate_series(1, 64)) AS i) di)
         |SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
         |       CAST(sum(q) AS BIGINT) AS sum_micro,
         |       CAST(sum(q * q) AS BIGINT) AS sumsq_micro2,
         |       CAST(max(abs(q)) AS BIGINT) AS maxabs_micro
         |FROM p GROUP BY dim ORDER BY dim""".stripMargin,
    // Replays the two-stage pipeline: PQ∘IVF ADC candidates widened to
    // top-32 per query, then exact full-dimension cosine re-scoring of
    // just those candidates, top-5 re-emitted.
    "q_rerank" ->
      s"""WITH $vecCte,
         |$pqCtes,
         |$pqIvfCtes,
         |widek AS (SELECT q_id, n_id FROM (
         |            SELECT q_id, n_id,
         |                   row_number() OVER (PARTITION BY q_id
         |                     ORDER BY adc_q, n_id) AS rk
         |            FROM adci) WHERE rk <= 32),
         |rr AS (SELECT w.q_id, w.n_id,
         |         ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
         |       FROM widek w
         |       JOIN v q ON w.q_id = q.vec_id
         |       JOIN v t ON w.n_id = t.vec_id)
         |SELECT q_id, n_id, cos, rk FROM (
         |  SELECT q_id, n_id, cos,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY cos DESC, n_id) AS rk
         |  FROM rr)
         |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // Raw PQ∘IVF top-5 vs the exact-reranked top-5, both graded against
    // the exact brute-force truth — what refinement recovers of the ADC
    // compression loss.
    "q_rerank_recall" ->
      s"""WITH $vecCte,
         |$pqCtes,
         |$pqIvfCtes,
         |ivf5 AS (SELECT q_id, n_id FROM (
         |           SELECT q_id, n_id,
         |                  row_number() OVER (PARTITION BY q_id
         |                    ORDER BY adc_q, n_id) AS rk
         |           FROM adci) WHERE rk <= 5),
         |widek AS (SELECT q_id, n_id FROM (
         |            SELECT q_id, n_id,
         |                   row_number() OVER (PARTITION BY q_id
         |                     ORDER BY adc_q, n_id) AS rk
         |            FROM adci) WHERE rk <= 32),
         |rr AS (SELECT w.q_id, w.n_id,
         |         ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
         |       FROM widek w
         |       JOIN v q ON w.q_id = q.vec_id
         |       JOIN v t ON w.n_id = t.vec_id),
         |rr5 AS (SELECT q_id, n_id FROM (
         |          SELECT q_id, n_id,
         |                 row_number() OVER (PARTITION BY q_id
         |                   ORDER BY cos DESC, n_id) AS rk
         |          FROM rr) WHERE rk <= 5),
         |$exactTopCtes,
         |n AS (SELECT (SELECT count(DISTINCT q_id) FROM ext) AS n_queries,
         |             (SELECT count(*) FROM ext JOIN ivf5 USING (q_id, n_id))
         |               AS n_hits_ivf,
         |             (SELECT count(*) FROM ext JOIN rr5 USING (q_id, n_id))
         |               AS n_hits_rerank)
         |SELECT n_queries, n_hits_ivf, n_hits_rerank,
         |       n_hits_ivf * 1000 // (n_queries * 5) AS recall_ivf_permille,
         |       n_hits_rerank * 1000 // (n_queries * 5) AS recall_rerank_permille
         |FROM n""".stripMargin,
    // Replays the IVF-probed hard-negative mine: nprobe=2 candidates,
    // different-label filter, exact cosine, top-3 per query.
    "q_hard_negatives" ->
      s"""WITH $vecCte,
         |$hardMineCtes
         |SELECT q_id, q_label, n_id, n_label, cos, rk FROM (
         |  SELECT q_id, q_label, n_id, n_label, cos,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY cos DESC, n_id) AS rk
         |  FROM hcos WHERE q_label <> n_label)
         |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin,
    // Replays the triplet mine: rank-1 same-label and rank-1
    // different-label selections over the shared labeled candidates.
    "q_triplets" ->
      s"""WITH $vecCte,
         |$hardMineCtes,
         |tpos AS (SELECT q_id, q_label, n_id AS pos_id, cos AS pos_cos
         |         FROM (SELECT q_id, q_label, n_id, cos,
         |                 row_number() OVER (PARTITION BY q_id
         |                   ORDER BY cos DESC, n_id) AS rk
         |               FROM hcos WHERE q_label = n_label) WHERE rk = 1),
         |tneg AS (SELECT q_id, n_id AS neg_id, cos AS neg_cos
         |         FROM (SELECT q_id, n_id, cos,
         |                 row_number() OVER (PARTITION BY q_id
         |                   ORDER BY cos DESC, n_id) AS rk
         |               FROM hcos WHERE q_label <> n_label) WHERE rk = 1)
         |SELECT p.q_id, p.q_label, p.pos_id, p.pos_cos,
         |       n.neg_id, n.neg_cos, p.pos_cos - n.neg_cos AS margin
         |FROM tpos p JOIN tneg n ON p.q_id = n.q_id
         |ORDER BY p.q_id""".stripMargin,
    // Replays the kNN-graph build: two-level routed probes (top-2 coarse
    // x top-2 fine) for every vector, the two-level assignment as the
    // candidate index (salted per-bucket cap), exact-cosine top-5 edges,
    // and the reversed-edge self-join for mutuality.
    "q_knn_graph" ->
      s"""WITH $vecCte,
         |$knnCtes
         |SELECT e.src AS vec_id, CAST(count(*) AS BIGINT) AS out_deg,
         |       CAST(sum(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS mutual_deg,
         |       min(CASE WHEN e.rk = 1 THEN e.dst END) AS top1_id
         |FROM ek e LEFT JOIN ek r ON r.src = e.dst AND r.dst = e.src
         |GROUP BY e.src ORDER BY vec_id""".stripMargin,
    // Replays the kNN pseudo-labeling pass (round-15 routed form):
    // held-out vec_id % 5 = 0 queries routed through the two-level
    // quantizer, two-level-assignment candidate index with the labeled
    // pool capped per bucket (salted hash-min), top-5 by cosine,
    // majority vote (ties -> smaller label), per-true-label accuracy.
    "q_label_prop" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |$ivf2BaseCtes,
         |${ivf2ProbeCte("lpr", "", "cents",
           Neighbors.KnnCoarseNprobe, Neighbors.KnnFinePerCell)},
         |${ivf2AsgCte("asg", "", "cents")},
         |lasg AS (SELECT vec_id, cent_id FROM asg WHERE vec_id % 5 <> 0),
         |${bucketCapCte("lpool", "lasg")},
         |cand AS (SELECT p.vec_id AS q_id, a.vec_id AS n_id
         |         FROM lpr p JOIN lpool a USING (cent_id)
         |         WHERE p.vec_id % 5 = 0),
         |sc AS (SELECT q_id, n_id,
         |         ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
         |       FROM cand JOIN v q ON q.vec_id = q_id
         |       JOIN v t ON t.vec_id = n_id),
         |nb AS (SELECT q_id, n_id FROM (
         |         SELECT q_id, n_id,
         |                row_number() OVER (PARTITION BY q_id
         |                  ORDER BY cos DESC, n_id) AS rk
         |         FROM sc) WHERE rk <= 5),
         |vt AS (SELECT q_id, CAST(l.label AS BIGINT) AS n_label,
         |              count(*) AS n_votes
         |       FROM nb JOIN embeddings l ON l.vec_id = nb.n_id
         |       GROUP BY 1, 2),
         |pd AS (SELECT q_id, n_label AS pred_label FROM (
         |         SELECT q_id, n_label,
         |                row_number() OVER (PARTITION BY q_id
         |                  ORDER BY n_votes DESC, n_label) AS vr
         |         FROM vt) WHERE vr = 1),
         |t AS (SELECT vec_id AS q_id, CAST(label AS BIGINT) AS label
         |      FROM embeddings WHERE vec_id % 5 = 0)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_test,
         |       CAST(sum(CASE WHEN pred_label IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_pred,
         |       CAST(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_correct,
         |       CAST(sum(CASE WHEN pred_label = label THEN 1 ELSE 0 END)
         |            * 1000 // count(*) AS BIGINT) AS acc_permille
         |FROM t LEFT JOIN pd USING (q_id)
         |GROUP BY label ORDER BY label""".stripMargin,
    // Recall audit of the kNN graph: the shared edge chain restricted to
    // the audit panel, intersected with the exact cosine top-5 baseline
    // (exactTopCtes — the same ground truth every ANN recall audit
    // replays); one integer row.
    "q_knn_recall" ->
      s"""WITH $vecCte,
         |$knnCtes,
         |$exactTopCtes,
         |ext1 AS (SELECT q_id, n_id FROM (
         |          SELECT q_id, n_id,
         |                 row_number() OVER (PARTITION BY q_id
         |                   ORDER BY cos DESC, n_id) AS rk
         |          FROM ep) WHERE rk = 1),
         |pe AS (SELECT src, dst, rk FROM ek
         |       WHERE src % $panelStepSql = 0),
         |n AS (SELECT
         |  (SELECT count(DISTINCT q_id) FROM ext) AS n_queries,
         |  (SELECT count(*) FROM pe) AS n_edges,
         |  (SELECT count(*) FROM pe JOIN ext
         |     ON pe.src = ext.q_id AND pe.dst = ext.n_id) AS n_hits,
         |  (SELECT count(*) FROM pe JOIN ext1
         |     ON pe.src = ext1.q_id AND pe.dst = ext1.n_id
         |    WHERE pe.rk = 1) AS n_top1)
         |SELECT CAST(n_queries AS BIGINT) AS n_queries,
         |       CAST(n_edges AS BIGINT) AS n_edges,
         |       CAST(n_hits AS BIGINT) AS n_hits,
         |       CAST(CASE WHEN n_edges = 0 THEN 0
         |            ELSE n_hits * 1000 // n_edges END AS BIGINT)
         |         AS hit_permille,
         |       CAST(CASE WHEN n_queries = 0 THEN 0
         |            ELSE n_hits * 1000 // (n_queries * 5) END AS BIGINT)
         |         AS recall_permille,
         |       CAST(n_top1 AS BIGINT) AS n_top1
         |FROM n""".stripMargin,
    // Replays mutual-kNN clustering: the shared edge chain, mutual edges
    // via the reversed self-join, transitive closure by recursive CTE,
    // min-reachable-id labels (clipped at own id), singleton fallback.
    "q_knn_clusters" -> knnClustersSql,
    // q_cc_stars computes the SAME relation through the alternating
    // large-star/small-star kernel (no densification, different fixpoint)
    // — one oracle, two independent distributed mechanisms.
    "q_cc_stars" -> knnClustersSql,
    // Replays the PCA power iteration: milli-quantized int64 second-moment
    // matrix (order-free exact sums), then PcaIters unrolled
    // multiply+normalize stages whose ordered-list left folds reproduce
    // the Spark driver's pinned j-then-i double arithmetic bit-for-bit.
    "q_pca_power" ->
      s"""WITH $vecCte,
         |$pcaCtes,
         |tr AS (SELECT CAST(sum(CASE WHEN i = j THEN c ELSE 0 END)
         |                AS BIGINT) AS trace FROM cov),
         |lm AS (SELECT sqrt(list_reduce(list(wv * wv ORDER BY d),
         |                               (x, y) -> x + y)) AS lam
         |       FROM $pcaLastW)
         |SELECT CAST($pcaLast.d AS BIGINT) AS dim,
         |       CAST(floor($pcaLast.vv * 1000000.0e0) AS BIGINT)
         |         AS eig_micros,
         |       CAST(floor(lam) AS BIGINT) AS lambda_floor,
         |       CAST(floor((lam * 1000.0e0) / trace) AS BIGINT)
         |         AS ev_permille
         |FROM $pcaLast CROSS JOIN lm CROSS JOIN tr
         |ORDER BY dim""".stripMargin,
    // Replays the anisotropy check: raw stage over the xq milli codes;
    // whitened stage subtracts the v8-axis projection per vector (same
    // list_zip left-fold dot and op order as VectorOps.dot), re-quantizes,
    // and both stages reduce to exact int64 moment sums.
    "q_whiten_check" ->
      s"""WITH $vecCte,
         |$pcaCtes,
         |va AS MATERIALIZED (SELECT list(vv ORDER BY d) AS vl
         |                    FROM $pcaLast),
         |pj AS (SELECT v.vec_id, v.e, va.vl,
         |         list_reduce(list_transform(list_zip(v.e, va.vl),
         |           s -> s[1] * s[2]), (x, y) -> x + y) AS proj
         |       FROM v CROSS JOIN va),
         |wq AS (SELECT vec_id, di.i - 1 AS d,
         |         CAST(round((e[di.i] - proj * vl[di.i]) * 1000.0e0)
         |              AS BIGINT) AS x
         |       FROM pj CROSS JOIN
         |         (SELECT unnest(generate_series(1, 64)) AS i) di),
         |rs AS (SELECT d, CAST(sum(x) AS BIGINT) AS s FROM xq GROUP BY 1),
         |rmu AS (SELECT CAST(sum(s * s) AS BIGINT) AS mu_sq FROM rs),
         |rtot AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
         |                CAST(sum(x * x) AS BIGINT) AS sum_sq FROM xq),
         |ws AS (SELECT d, CAST(sum(x) AS BIGINT) AS s FROM wq GROUP BY 1),
         |wmu AS (SELECT CAST(sum(s * s) AS BIGINT) AS mu_sq FROM ws),
         |wtot AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n_vecs,
         |                CAST(sum(x * x) AS BIGINT) AS sum_sq FROM wq)
         |SELECT 'raw' AS stage, n_vecs, sum_sq, mu_sq,
         |       CAST(floor(CAST(mu_sq AS DOUBLE) * 1000.0e0 /
         |            (CAST(n_vecs AS DOUBLE) * CAST(sum_sq AS DOUBLE)))
         |         AS BIGINT)
         |         AS aniso_permille
         |FROM rtot CROSS JOIN rmu
         |UNION ALL
         |SELECT 'whitened', n_vecs, sum_sq, mu_sq,
         |       CAST(floor(CAST(mu_sq AS DOUBLE) * 1000.0e0 /
         |            (CAST(n_vecs AS DOUBLE) * CAST(sum_sq AS DOUBLE)))
         |         AS BIGINT)
         |FROM wtot CROSS JOIN wmu
         |ORDER BY stage""".stripMargin,
    // Replays MRR@5 vs the exact rank-1 neighbor for both IVF variants:
    // reciprocal ranks as integer 1000 // rk, averaged over queries.
    "q_ann_mrr" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |$kmeansCtes,
         |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v
         |      WHERE vec_id % $panelStepSql = 0),
         |${ivfTop5Ctes("cents", "h")},
         |${ivfTop5Ctes("kcents", "k")},
         |ex1 AS (SELECT q_id, n_id FROM (
         |  SELECT q.q_id, t.vec_id AS n_id,
         |         row_number() OVER (PARTITION BY q.q_id ORDER BY
         |           ${dotSql("q.qe", "t.e")} / (q.qn * t.nrm) DESC,
         |           t.vec_id) AS rk
         |  FROM q JOIN v t ON t.vec_id <> q.q_id) WHERE rk = 1),
         |m AS (SELECT
         |  (SELECT count(*) FROM ex1) AS n_queries,
         |  (SELECT count(*) FROM ex1 JOIN htop USING (q_id, n_id))
         |    AS hits_ivf,
         |  (SELECT CAST(coalesce(sum(1000 // rk), 0) AS BIGINT)
         |   FROM ex1 JOIN htop USING (q_id, n_id)) AS rr_ivf,
         |  (SELECT count(*) FROM ex1 JOIN ktop USING (q_id, n_id))
         |    AS hits_km,
         |  (SELECT CAST(coalesce(sum(1000 // rk), 0) AS BIGINT)
         |   FROM ex1 JOIN ktop USING (q_id, n_id)) AS rr_km)
         |SELECT CAST(n_queries AS BIGINT) AS n_queries,
         |       CAST(hits_ivf AS BIGINT) AS hits_ivf,
         |       CAST(rr_ivf // n_queries AS BIGINT) AS mrr_ivf_milli,
         |       CAST(hits_km AS BIGINT) AS hits_km,
         |       CAST(rr_km // n_queries AS BIGINT) AS mrr_km_milli
         |FROM m""".stripMargin,
    // Two-level (coarse → fine) IVF search: the oracle replays BOTH
    // quantizer levels — the coarse table is the hash-min PREFIX of the
    // fine one (same 60-bit portable hash, same tie rule), routing is
    // argmax cosine with ties → min id at each level, and the search
    // probes the top-2 fine cells within the routed coarse cell — so
    // every approximation the two-level index makes is replayed
    // bit-for-bit and the gate hash-pins all rows.
    "q_ivf2_search" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v
         |      WHERE vec_id % $panelStepSql = 0),
         |$ivf2TopCtes
         |SELECT q_id, n_id, cos, rk FROM t2top
         |ORDER BY q_id, rk""".stripMargin,
    // The coarse-nprobe=2 two-level search: top-2 coarse cells per query,
    // top-2 fine within each — the recall dial, replayed bit-for-bit.
    "q_ivf2_np2" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v
         |      WHERE vec_id % $panelStepSql = 0),
         |$ivf2TopCtes
         |SELECT q_id, n_id, cos, rk FROM t2top2
         |ORDER BY q_id, rk""".stripMargin,
    // Side-by-side MRR@5 audit of the two-level search vs the
    // single-level one (identical exact-rank-1 baseline and integer
    // reciprocal ranks as q_ann_mrr) — the number that prices the
    // two-level router's cell-level recall trade.
    "q_ivf2_recall" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v
         |      WHERE vec_id % $panelStepSql = 0),
         |$ivf2TopCtes,
         |${ivfTop5Ctes("cents", "h")},
         |ex1 AS (SELECT q_id, n_id FROM (
         |  SELECT q.q_id, t.vec_id AS n_id,
         |         row_number() OVER (PARTITION BY q.q_id ORDER BY
         |           ${dotSql("q.qe", "t.e")} / (q.qn * t.nrm) DESC,
         |           t.vec_id) AS rk
         |  FROM q JOIN v t ON t.vec_id <> q.q_id) WHERE rk = 1),
         |m AS (SELECT
         |  (SELECT count(*) FROM ex1) AS n_queries,
         |  (SELECT count(*) FROM ex1 JOIN htop USING (q_id, n_id))
         |    AS hits_ivf,
         |  (SELECT CAST(coalesce(sum(1000 // rk), 0) AS BIGINT)
         |   FROM ex1 JOIN htop USING (q_id, n_id)) AS rr_ivf,
         |  (SELECT count(*) FROM ex1 JOIN t2top USING (q_id, n_id))
         |    AS hits_ivf2,
         |  (SELECT CAST(coalesce(sum(1000 // rk), 0) AS BIGINT)
         |   FROM ex1 JOIN t2top USING (q_id, n_id)) AS rr_ivf2,
         |  (SELECT count(*) FROM ex1 JOIN t2top2 USING (q_id, n_id))
         |    AS hits_ivf2_np2,
         |  (SELECT CAST(coalesce(sum(1000 // rk), 0) AS BIGINT)
         |   FROM ex1 JOIN t2top2 USING (q_id, n_id)) AS rr_ivf2_np2)
         |SELECT CAST(n_queries AS BIGINT) AS n_queries,
         |       CAST(hits_ivf AS BIGINT) AS hits_ivf,
         |       CAST(rr_ivf // n_queries AS BIGINT) AS mrr_ivf_milli,
         |       CAST(hits_ivf2 AS BIGINT) AS hits_ivf2,
         |       CAST(rr_ivf2 // n_queries AS BIGINT) AS mrr_ivf2_milli,
         |       CAST(hits_ivf2_np2 AS BIGINT) AS hits_ivf2_np2,
         |       CAST(rr_ivf2_np2 // n_queries AS BIGINT)
         |         AS mrr_ivf2_np2_milli
         |FROM m""".stripMargin,
  )

  /** Two-level (coarse → fine) top-5 CTE chain — assumes `v`, `cents`,
    * and the panel `q` are already declared; emits `coarse` (the ⌈√K⌉
    * hash-min PREFIX of cents, same 60-bit hash and tie rule), `f2c`
    * (fine → coarse cell), `t2asgco`/`t2asg` (vector → coarse → fine
    * WITHIN its cell, via [[OracleCtes.ivf2AsgCte]]), `t2qc`/`t2probes`
    * (query routing: top-2 fine
    * cells within the routed coarse cell), `t2cand`,
    * `t2top(q_id, n_id, cos, rk ≤ 5)`, plus the coarse-nprobe=2 chain
    * `t2qc2`/`t2probes2`/`t2cand2`/`t2top2` (top-2 coarse cells, top-2
    * fine within EACH — replaying [[operators.Similarity.annIvf2Np2]];
    * unreferenced plain CTEs are pruned by DuckDB, so consumers that
    * need only one chain pay only that chain). Shared verbatim by
    * `q_ivf2_search`, `q_ivf2_np2` and `q_ivf2_recall` so the oracles
    * can never drift apart.
    */
  private def ivf2TopCtes: String =
    s"""$ivf2BaseCtes,
       |${ivf2AsgCte("t2asg", "", "cents")},
       |t2qc AS (SELECT q_id, co_id FROM (
       |    SELECT q.q_id, o.co_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             ${dotSql("q.qe", "o.oe")} / (q.qn * o.ocn) DESC,
       |             o.co_id) AS rn
       |    FROM q CROSS JOIN coarse o) WHERE rn = 1),
       |t2probes AS (SELECT q_id, cent_id FROM (
       |    SELECT q.q_id, c.cent_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             ${dotSql("q.qe", "c.ce")} / (q.qn * c.cn) DESC,
       |             c.cent_id) AS rn
       |    FROM q JOIN t2qc ON q.q_id = t2qc.q_id
       |    JOIN f2c ON f2c.co_id = t2qc.co_id
       |    JOIN cents c ON c.cent_id = f2c.cent_id) WHERE rn <= 2),
       |t2cand AS (SELECT p.q_id, a.vec_id FROM t2probes p
       |           JOIN t2asg a ON p.cent_id = a.cent_id
       |           WHERE a.vec_id <> p.q_id),
       |t2top AS (SELECT q_id, n_id, cos, rk FROM (
       |  SELECT cd.q_id, v.vec_id AS n_id,
       |         ${dotSql("q.qe", "v.e")} / (q.qn * v.nrm) AS cos,
       |         row_number() OVER (PARTITION BY cd.q_id ORDER BY
       |           ${dotSql("q.qe", "v.e")} / (q.qn * v.nrm) DESC,
       |           v.vec_id) AS rk
       |  FROM t2cand cd JOIN q ON cd.q_id = q.q_id
       |  JOIN v ON cd.vec_id = v.vec_id)
       |WHERE rk <= 5),
       |t2qc2 AS (SELECT q_id, co_id FROM (
       |    SELECT q.q_id, o.co_id,
       |           row_number() OVER (PARTITION BY q.q_id ORDER BY
       |             ${dotSql("q.qe", "o.oe")} / (q.qn * o.ocn) DESC,
       |             o.co_id) AS rn
       |    FROM q CROSS JOIN coarse o) WHERE rn <= 2),
       |t2probes2 AS (SELECT q_id, cent_id FROM (
       |    SELECT q.q_id, t2qc2.co_id, c.cent_id,
       |           row_number() OVER (PARTITION BY q.q_id, t2qc2.co_id
       |             ORDER BY
       |             ${dotSql("q.qe", "c.ce")} / (q.qn * c.cn) DESC,
       |             c.cent_id) AS rn
       |    FROM q JOIN t2qc2 ON q.q_id = t2qc2.q_id
       |    JOIN f2c ON f2c.co_id = t2qc2.co_id
       |    JOIN cents c ON c.cent_id = f2c.cent_id) WHERE rn <= 2),
       |t2cand2 AS (SELECT p.q_id, a.vec_id FROM t2probes2 p
       |            JOIN t2asg a ON p.cent_id = a.cent_id
       |            WHERE a.vec_id <> p.q_id),
       |t2top2 AS (SELECT q_id, n_id, cos, rk FROM (
       |  SELECT cd.q_id, v.vec_id AS n_id,
       |         ${dotSql("q.qe", "v.e")} / (q.qn * v.nrm) AS cos,
       |         row_number() OVER (PARTITION BY cd.q_id ORDER BY
       |           ${dotSql("q.qe", "v.e")} / (q.qn * v.nrm) DESC,
       |           v.vec_id) AS rk
       |  FROM t2cand2 cd JOIN q ON cd.q_id = q.q_id
       |  JOIN v ON cd.vec_id = v.vec_id)
       |WHERE rk <= 5)""".stripMargin
}
