package graft
package entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables
import OracleCtes._

/** Query + oracle registry: the LLM-curation dedup family: exact, n-gram Jaccard, MinHash-LSH, SimHash, embedding, containment, paragraph, prefix.
  *
  * Split out of the former SparkEntry monolith (round 9); merged back into
  * the driver contract by [[graft.SparkEntry]]. Key sets of [[queries]] and
  * [[oracles]] stay aligned — EntryRegistrySpec enforces it.
  */
object DedupQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // training-data pipeline: dedup
    "dedup_exact" -> ((s, d) => Dedup.dedupExact(s, d)),
    "dedup_ngram" -> ((s, d) => Dedup.dedupNgram(s, d)),
    "q_incremental_dedup" -> ((s, d) => Dedup.incrementalDedup(s, d)),
    "dedup_minhash" -> ((s, d) => Dedup.dedupMinhash(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.dedupSimhash(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.dedupEmbedding(s, d)),
    "q_capped_pairs" -> ((s, d) => Dedup.cappedPairs(s, d)),
    "q_ivf1_pairs" -> ((s, d) => Dedup.ivfSinglePairs(s, d)),
    "q_dup_ngrams" -> ((s, d) => TextAnalysis.dupNgramFraction(s, d)),
    "q_minhash_acc" -> ((s, d) => Dedup.minhashAccuracy(s, d)),
    "q_dup_rate_by_source" -> ((s, d) => Curation.dupRateBySource(s, d)),
    "q_dedup_clusters" -> ((s, d) => Curation.dedupClusters(s, d)),
    // sixth wave: containment dedup, SCD2, chunking, BPE stats, zone maps,
    // PQ recall
    "q_containment" -> ((s, d) => Dedup.containmentPairs(s, d)),
    "q_prefix_dups" -> ((s, d) => Corpus.prefixDups(s, d)),
    "q_para_dedup" -> ((s, d) => Corpus.paraDedup(s, d)),
    "q_boilerplate_grams" -> ((s, d) => Corpus.boilerplateGrams(s, d)),
    "q_source_overlap" -> ((s, d) => Corpus.sourceOverlap(s, d)),
    "q_ngram_novelty" -> ((s, d) => Corpus.ngramNovelty(s, d)),
    "q_semdedup" -> ((s, d) => Dedup.semDedup(s, d)),
    // ninth wave: sliding-window repeated-substring spans, keep-longest
    // cluster canonicalization
    "q_dup_spans" -> ((s, d) => Corpus.dupSpans(s, d)),
    "q_cluster_canon" -> ((s, d) => Curation.clusterCanon(s, d)),
    "q_dedup_agreement" -> ((s, d) => Dedup.dedupAgreement(s, d)),
  )

  /** Shared connected-component CTE chain (Jaccard pairs → symmetric
    * edges → recursive reach → min-label `cl` + sizes `sz`) replaying
    * [[graft.operators.Curation.dedupClusters]]; consumed by
    * `q_dedup_clusters` and `q_cluster_canon`. Callers must open with
    * `WITH RECURSIVE`.
    */
  private lazy val ccCtes: String =
    s"""$docShCtes, $interCte,
       |pairs AS (
       |  SELECT doc_a, doc_b FROM inter
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id
       |  WHERE inter * 3 >= sa.n_sh + sb.n_sh),
       |e AS MATERIALIZED (SELECT doc_a AS s, doc_b AS t FROM pairs
       |      UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT s, t FROM e
       |  UNION
       |  SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
       |mn AS (SELECT s, min(t) AS m FROM reach GROUP BY 1),
       |cl AS (SELECT d.doc_id,
       |         CASE WHEN mn.m IS NULL THEN d.doc_id
       |              WHEN mn.m < d.doc_id THEN mn.m
       |              ELSE d.doc_id END AS cluster_id
       |       FROM documents d LEFT JOIN mn ON d.doc_id = mn.s),
       |sz AS (SELECT cluster_id, count(*) AS cluster_size
       |       FROM cl GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, md5(text) AS content_md5, count(*) AS n_copies
        |FROM documents GROUP BY 2 ORDER BY 1""".stripMargin,
    "dedup_ngram" ->
      s"""WITH $docShCtes, $interCte
         |SELECT doc_a, doc_b, inter, sa.n_sh + sb.n_sh - inter AS union_n
         |FROM inter
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE inter * 3 >= sa.n_sh + sb.n_sh
         |ORDER BY 1, 2""".stripMargin,
    // Same shingle universe + Jaccard test as dedup_ngram; the split is
    // deterministic (doc_id % 5) so both engines agree on shard membership.
    "q_incremental_dedup" ->
      s"""WITH $docShCtes, $interCte,
         |jac AS (SELECT i.doc_a, i.doc_b FROM inter i
         |        JOIN sizes sa ON i.doc_a = sa.doc_id
         |        JOIN sizes sb ON i.doc_b = sb.doc_id
         |        WHERE i.inter * 3 >= sa.n_sh + sb.n_sh),
         |incdocs AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
         |corpdup AS (
         |  SELECT DISTINCT CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS doc_id
         |  FROM jac WHERE (doc_a % 5 = 0) <> (doc_b % 5 = 0)),
         |sharddup AS (
         |  SELECT DISTINCT doc_b AS doc_id FROM jac
         |  WHERE doc_a % 5 = 0 AND doc_b % 5 = 0)
         |SELECT d.doc_id,
         |  CASE WHEN c.doc_id IS NOT NULL THEN 'corpus_dup'
         |       WHEN s.doc_id IS NOT NULL THEN 'shard_dup'
         |       ELSE 'unique' END AS verdict
         |FROM incdocs d
         |LEFT JOIN corpdup c ON d.doc_id = c.doc_id
         |LEFT JOIN sharddup s ON d.doc_id = s.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "dedup_minhash" ->
      s"""WITH $docShCtes, $interCte,
         |hashed AS (SELECT doc_id,
         |             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % 1000000007 AS h
         |           FROM shc),
         |mh AS (SELECT doc_id, j,
         |         min(((j * 4097 + 1) * h + j * 12289 + 7) % 1000000007) AS mh
         |       FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) js
         |       GROUP BY 1, 2),
         |bands AS (SELECT doc_id, j // 4 AS band,
         |            array_to_string(list_sort(list(printf('%02d@%d', j, mh))), ':') AS sig
         |          FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)
         |SELECT c.doc_a, c.doc_b, i.inter, sa.n_sh + sb.n_sh - i.inter AS union_n
         |FROM cand c
         |JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
         |JOIN sizes sa ON c.doc_a = sa.doc_id
         |JOIN sizes sb ON c.doc_b = sb.doc_id
         |WHERE i.inter * 5 >= (sa.n_sh + sb.n_sh - i.inter) * 4
         |ORDER BY 1, 2""".stripMargin,
    "dedup_simhash" ->
      s"""WITH $docShCtes, $simhashCtes,
         |bands AS (SELECT doc_id, simhash, k, (simhash >> (16 * k)) & 65535 AS band_val
         |          FROM sim CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) ks),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |                a.simhash AS sha, b.simhash AS shb
         |         FROM bands a JOIN bands b
         |           ON a.k = b.k AND a.band_val = b.band_val AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sha, shb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sha, shb)) <= 3
         |ORDER BY 1, 2""".stripMargin,
    // Replays dedupEmbedding's ROUTED index exactly (the round-14
    // production path): same centroid subset, coarse prefix + fine→coarse
    // map, top-3 coarse routing, top-8 fine probes per routed cell,
    // salted width-128 sub-bucket split, exact-cosine verification —
    // UNIONED (round 17) with the graph-derived pairs off the
    // NN-descent-refined kNN edge chain, exactly as the production build.
    "dedup_embedding" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |$ivf2BaseCtes,
         |${ivf2ProbeCte("rpr", "", "cents",
            operators.Dedup.PairCoarseNprobe, operators.Dedup.PairFinePerCell)},
         |${ivfPairCtes("p", "rpr")},
         |${knnEdgeCtes("g", "", "cents")},
         |${graphPairsCte("gp", "g")}
         |SELECT DISTINCT vec_a, vec_b, cos FROM (
         |  SELECT vec_a, vec_b, cos FROM p
         |  UNION ALL SELECT vec_a, vec_b, cos FROM gp)
         |ORDER BY 1, 2""".stripMargin,
    // Budget-capped pair enumeration: replays the nprobe=1 assignment
    // (argmax cosine, ties -> min cent_id), ranks each cell's members by
    // the SAME 60-bit portable hash (ties -> min vec_id), and enumerates
    // pairs only among rank <= 128 — the linear-in-N scale form of the
    // Theta(N^1.5) pair family, decision procedure replayed bit-for-bit.
    "q_capped_pairs" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |asg AS (SELECT vec_id, cent_id FROM (
         |    SELECT v.vec_id, c.cent_id,
         |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |             ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |             c.cent_id) AS rn
         |    FROM v CROSS JOIN cents c) WHERE rn = 1),
         |capped AS (SELECT cent_id, vec_id, e, nrm FROM (
         |    SELECT a.cent_id, v.vec_id, v.e, v.nrm,
         |           row_number() OVER (PARTITION BY a.cent_id ORDER BY
         |             CAST('0x' || substr(md5(CAST(v.vec_id AS VARCHAR)), 1, 15)
         |                  AS BIGINT), v.vec_id) AS r
         |    FROM v JOIN asg a ON v.vec_id = a.vec_id) WHERE r <= 128),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |        ${dotSql("a.e", "b.e")} / (a.nrm * b.nrm) AS cos
         |      FROM capped a JOIN capped b
         |        ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, cos FROM p WHERE cos >= ${operators.Dedup.PairCosThresholdSql}
         |ORDER BY 1, 2""".stripMargin,
    // Legacy single-level pair build (the pre-migration production
    // mechanism, kept as the oracle-pinned comparison baseline): nprobe=8
    // multi-probe assignment, salted width-128 sub-bucket split,
    // exact-cosine verification — over the AUDIT POPULATION (round 15;
    // the exactPairsFor stride, s = 1 through sf0.1) against the
    // production full-corpus centroid table.
    "q_ivf1_pairs" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |probes AS (SELECT vec_id, cent_id FROM (
         |             SELECT v.vec_id, c.cent_id,
         |                    row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                      ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                      c.cent_id) AS rn
         |             FROM v CROSS JOIN cents c
         |             WHERE v.vec_id % $auditStrideSql = 0) WHERE rn <= 8),
         |${ivfPairCtes("p", "probes")}
         |SELECT vec_a, vec_b, cos FROM p
         |ORDER BY 1, 2""".stripMargin,
    // Sub-3-word docs stay in the report with zero gram columns (their
    // dup_word_pct is still meaningful), mirroring the Spark side.
    "q_dup_ngrams" ->
      """WITH dw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (SELECT doc_id,
        |        CAST(len(w) AS BIGINT) AS n_words,
        |        CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words,
        |        CASE WHEN len(w) >= 3 THEN CAST(len(w) - 2 AS BIGINT)
        |             ELSE CAST(0 AS BIGINT) END AS n_grams,
        |        CASE WHEN len(w) >= 3 THEN
        |          CAST(len(w) - 2 - len(list_distinct(
        |            list_transform(generate_series(1, len(w) - 2),
        |                           i -> array_to_string(w[i:i+2], ' '))))
        |            AS BIGINT)
        |        ELSE CAST(0 AS BIGINT) END AS n_dup_grams
        |      FROM dw)
        |SELECT doc_id, n_words, n_distinct_words, n_grams, n_dup_grams,
        |       (100 * (n_words - n_distinct_words)) // n_words AS dup_word_pct,
        |       CASE WHEN n_grams > 0 THEN (100 * n_dup_grams) // n_grams
        |            ELSE CAST(0 AS BIGINT) END AS dup_gram_pct
        |FROM g ORDER BY doc_id""".stripMargin,
    // Sketch-accuracy contract for the minhash estimator: per LSH candidate
    // pair, estimate vs exact Jaccard permille and |error| — replays the
    // same 16 affine permutations and 4×4 banding as dedup_minhash.
    "q_minhash_acc" ->
      s"""WITH $docShCtes, $interCte,
         |hashed AS (SELECT doc_id,
         |             CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % 1000000007 AS h
         |           FROM shc),
         |mh AS (SELECT doc_id, j,
         |         min(((j * 4097 + 1) * h + j * 12289 + 7) % 1000000007) AS mh
         |       FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) js
         |       GROUP BY 1, 2),
         |bands AS (SELECT doc_id, j // 4 AS band,
         |            array_to_string(list_sort(list(printf('%02d@%d', j, mh))), ':') AS sig
         |          FROM mh GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM bands a JOIN bands b
         |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |         WHERE a.doc_id % greatest(1,
         |           (SELECT (count(*) + 4999) // 5000 FROM documents)) = 0),
         |m AS (SELECT c.doc_a, c.doc_b,
         |        sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) AS matches
         |      FROM cand c
         |      JOIN mh a ON a.doc_id = c.doc_a
         |      JOIN mh b ON b.doc_id = c.doc_b AND a.j = b.j
         |      GROUP BY 1, 2),
         |x AS (SELECT m.doc_a, m.doc_b,
         |        CAST(m.matches * 1000 // 16 AS BIGINT) AS est_permille,
         |        CAST(coalesce(i.inter, 0) * 1000
         |             // (sa.n_sh + sb.n_sh - coalesce(i.inter, 0)) AS BIGINT)
         |          AS exact_permille
         |      FROM m
         |      LEFT JOIN inter i ON m.doc_a = i.doc_a AND m.doc_b = i.doc_b
         |      JOIN sizes sa ON m.doc_a = sa.doc_id
         |      JOIN sizes sb ON m.doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, est_permille, exact_permille,
         |       abs(est_permille - exact_permille) AS abs_err
         |FROM x ORDER BY doc_a, doc_b""".stripMargin,
    "q_dup_rate_by_source" ->
      s"""WITH $docShCtes, $interCte,
         |pairs AS (
         |  SELECT doc_a, doc_b FROM inter
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE inter * 3 >= sa.n_sh + sb.n_sh),
         |dd AS (SELECT doc_id, source, md5(text) AS h FROM documents),
         |dg AS (SELECT h FROM dd GROUP BY h HAVING count(*) > 1),
         |ex AS (SELECT DISTINCT dd.doc_id FROM dd JOIN dg USING (h)),
         |nd AS (SELECT DISTINCT doc_id FROM (
         |         SELECT doc_a AS doc_id FROM pairs
         |         UNION ALL SELECT doc_b FROM pairs))
         |SELECT dd.source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN ex.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_exact_dup,
         |       CAST(sum(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_near_dup
         |FROM dd
         |LEFT JOIN ex ON dd.doc_id = ex.doc_id
         |LEFT JOIN nd ON dd.doc_id = nd.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Transitive closure over the symmetric near-dup edge list (recursive
    // CTE) vs Spark's min-label-propagation fixpoint — two genuinely
    // different mechanisms agreeing on component labels.
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $ccCtes
         |SELECT cl.doc_id, cl.cluster_id, sz.cluster_size
         |FROM cl JOIN sz USING (cluster_id)
         |ORDER BY cl.doc_id""".stripMargin,
    // Replays keep-longest canonical selection on top of the cluster
    // relation: rank-1 by (n_chars DESC, doc_id) per cluster == Spark's
    // min(-n_chars, doc_id) struct aggregate.
    "q_cluster_canon" ->
      s"""WITH RECURSIVE $ccCtes,
         |ln AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
         |       FROM documents),
         |j AS (SELECT cl.doc_id, cl.cluster_id, sz.cluster_size, ln.n_chars
         |      FROM cl JOIN sz USING (cluster_id) JOIN ln USING (doc_id)),
         |cn AS (SELECT cluster_id, doc_id AS canon_doc FROM (
         |         SELECT cluster_id, doc_id,
         |                row_number() OVER (PARTITION BY cluster_id
         |                  ORDER BY n_chars DESC, doc_id) AS rk
         |         FROM j) WHERE rk = 1)
         |SELECT j.doc_id, j.cluster_id, j.cluster_size, j.n_chars,
         |       cn.canon_doc,
         |       CAST(j.doc_id = cn.canon_doc AS BIGINT) AS is_canon
         |FROM j JOIN cn USING (cluster_id)
         |ORDER BY j.doc_id""".stripMargin,
    "q_containment" ->
      s"""WITH $docShCtes, $interCte
         |SELECT doc_a, doc_b, inter,
         |       least(sa.n_sh, sb.n_sh) AS n_small,
         |       inter * 1000 // least(sa.n_sh, sb.n_sh) AS contain_permille
         |FROM inter
         |JOIN sizes sa ON doc_a = sa.doc_id
         |JOIN sizes sb ON doc_b = sb.doc_id
         |WHERE inter * 10 >= least(sa.n_sh, sb.n_sh) * 9
         |ORDER BY 1, 2""".stripMargin,
    // Replays the PrefixDfCap: prefixes carried by > 64 docs are
    // boilerplate, dropped from the candidate key on both sides.
    "q_prefix_dups" ->
      """WITH d0 AS (SELECT doc_id, text, CAST(len(text) AS BIGINT) AS l,
        |                   substr(text, 1, 60) AS p
        |            FROM documents WHERE len(text) >= 60),
        |pc AS (SELECT p FROM (SELECT p, count(*) AS df FROM d0 GROUP BY 1)
        |       WHERE df <= 64),
        |d AS (SELECT d0.* FROM d0 JOIN pc ON d0.p = pc.p)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       a.l AS len_a, b.l AS len_b
        |FROM d a JOIN d b
        |  ON a.p = b.p
        | AND (a.l < b.l OR (a.l = b.l AND a.doc_id < b.doc_id))
        |WHERE substr(b.text, 1, CAST(a.l AS INT)) = a.text
        |ORDER BY doc_a, doc_b""".stripMargin,
    // Replays paragraph blocking (8-word non-overlapping blocks, tails of
    // < 4 words excluded) and the first-wins rule: rn=1 over (doc_id, pos)
    // per paragraph hash == Spark's min(struct(doc_id, pos)). The fixed
    // series 0..15 covers 128 words; the corpus caps at ~100.
    "q_para_dedup" ->
      s"""WITH dw AS (SELECT doc_id, string_split(text, ' ') AS w
         |            FROM documents),
         |bl AS (SELECT doc_id, b.i AS pos,
         |              array_to_string(w[(b.i*8+1):(b.i*8+8)], ' ') AS para
         |       FROM dw CROSS JOIN
         |         (SELECT unnest(generate_series(0, 15)) AS i) b
         |       WHERE b.i * 8 < len(w)),
         |q AS (SELECT doc_id, pos, CAST(len(para) AS BIGINT) AS plen,
         |             ${Tables.portableHashSql("para")} AS h
         |      FROM bl WHERE len(string_split(para, ' ')) >= 4),
         |r AS (SELECT doc_id, plen,
         |             row_number() OVER (PARTITION BY h
         |               ORDER BY doc_id, pos) AS rn
         |      FROM q)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
         |       CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT)
         |         AS n_removed,
         |       CAST(sum(CASE WHEN rn = 1 THEN plen ELSE 0 END) AS BIGINT)
         |         AS kept_chars
         |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Roster-preserving (sub-3-word docs count in n_docs with zero grams,
    // never flagged), mirroring the Spark side exactly.
    "q_boilerplate_grams" ->
      s"""WITH $docShCtes,
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |cm AS (SELECT s.doc_id, count(*) AS n_common FROM sh s
         |       JOIN (SELECT shingle FROM shdf WHERE df >= 3) c
         |         ON s.shingle = c.shingle
         |       GROUP BY 1),
         |pd AS (SELECT d.doc_id, d.source,
         |              coalesce(sz.n_sh, 0) AS n_sh,
         |              coalesce(cm.n_common, 0) AS n_common
         |       FROM documents d
         |       LEFT JOIN sz ON d.doc_id = sz.doc_id
         |       LEFT JOIN cm ON d.doc_id = cm.doc_id)
         |SELECT source,
         |       count(*) AS n_docs,
         |       CAST(sum(n_sh) AS BIGINT) AS n_grams,
         |       CAST(sum(n_common) AS BIGINT) AS n_common,
         |       CASE WHEN sum(n_sh) > 0
         |            THEN CAST(sum(n_common) AS BIGINT) * 1000
         |                   // CAST(sum(n_sh) AS BIGINT)
         |            ELSE CAST(0 AS BIGINT) END AS bp_permille,
         |       CAST(sum(CASE WHEN n_sh > 0 AND n_common * 2 >= n_sh
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
         |FROM pd GROUP BY source ORDER BY source""".stripMargin,
    "q_source_overlap" ->
      s"""WITH $docShCtes,
         |ss AS (SELECT DISTINCT d.source, s.shingle
         |       FROM shc s JOIN documents d ON s.doc_id = d.doc_id),
         |sn AS (SELECT source, count(*) AS n FROM ss GROUP BY 1),
         |pr AS (SELECT a.source AS src_a, b.source AS src_b,
         |              count(*) AS shared
         |       FROM ss a JOIN ss b
         |         ON a.shingle = b.shingle AND a.source < b.source
         |       GROUP BY 1, 2)
         |SELECT pr.src_a, pr.src_b, na.n AS n_a, nb.n AS n_b, pr.shared,
         |       1000 * pr.shared // (na.n + nb.n - pr.shared)
         |         AS jaccard_permille
         |FROM pr JOIN sn na ON pr.src_a = na.source
         |        JOIN sn nb ON pr.src_b = nb.source
         |ORDER BY pr.shared DESC, pr.src_a, pr.src_b LIMIT 20""".stripMargin,
    "q_ngram_novelty" ->
      s"""WITH $docShCtes,
         |fo AS (SELECT min(doc_id) AS doc_id FROM sh GROUP BY shingle),
         |nv AS (SELECT doc_id, count(*) AS n_novel FROM fo GROUP BY 1),
         |sz AS (SELECT doc_id, count(*) AS n_grams FROM sh GROUP BY 1)
         |SELECT sz.doc_id, sz.n_grams, coalesce(nv.n_novel, 0) AS n_novel,
         |       1000 * coalesce(nv.n_novel, 0) // sz.n_grams
         |         AS novelty_permille
         |FROM sz LEFT JOIN nv ON sz.doc_id = nv.doc_id
         |ORDER BY sz.doc_id""".stripMargin,
    // Replays the dedup_embedding pair chain (incl. the width-128
    // sub-bucket split) plus the SemDeDup keep rule: nearest-centroid
    // assignment, centroid cosine per member, the more-central member of
    // each pair dropped (tie → larger vec_id).
    "q_semdedup" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents")},
         |$ivf2BaseCtes,
         |${ivf2ProbeCte("rpr", "", "cents",
            operators.Dedup.PairCoarseNprobe, operators.Dedup.PairFinePerCell)},
         |${ivfPairCtes("dpc", "rpr")},
         |${knnEdgeCtes("g", "", "cents")},
         |${graphPairsCte("gp", "g")},
         |dp AS (SELECT DISTINCT vec_a, vec_b FROM (
         |         SELECT vec_a, vec_b FROM dpc
         |         UNION ALL SELECT vec_a, vec_b FROM gp)),
         |asg1 AS (SELECT vec_id, cent_id FROM (
         |           SELECT v.vec_id, c.cent_id,
         |                  row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                    ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                    c.cent_id) AS rn
         |           FROM v CROSS JOIN cents c) WHERE rn = 1),
         |cc AS (SELECT a.vec_id, a.cent_id,
         |         ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) AS ccos
         |       FROM asg1 a JOIN v ON a.vec_id = v.vec_id
         |       JOIN cents c ON a.cent_id = c.cent_id),
         |losers AS (SELECT DISTINCT
         |             CASE WHEN ca.ccos > cb.ccos THEN d.vec_a
         |                  WHEN cb.ccos > ca.ccos THEN d.vec_b
         |                  ELSE greatest(d.vec_a, d.vec_b) END AS vec_id
         |           FROM dp d
         |           JOIN cc ca ON d.vec_a = ca.vec_id
         |           JOIN cc cb ON d.vec_b = cb.vec_id),
         |mem AS (SELECT DISTINCT vec_id FROM (
         |          SELECT vec_a AS vec_id FROM dp
         |          UNION ALL SELECT vec_b AS vec_id FROM dp))
         |SELECT m.vec_id, cc.cent_id, cc.ccos,
         |       CASE WHEN l.vec_id IS NULL THEN 'keep' ELSE 'drop' END
         |         AS verdict
         |FROM mem m JOIN cc ON m.vec_id = cc.vec_id
         |LEFT JOIN losers l ON m.vec_id = l.vec_id
         |ORDER BY m.vec_id""".stripMargin,
    // Replays the sliding-window repeated-substring pass: every 8-word
    // window hashed, corpus-wide occurrence >= 2 marks a span, spans merge
    // into islands via the lag-gap sweep (gap >= 8 opens a new island,
    // least(gap, 8) counts the newly covered tokens).
    "q_dup_spans" ->
      s"""WITH dw AS (SELECT doc_id, string_split(text, ' ') AS w
         |            FROM documents),
         |b AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words FROM dw),
         |g AS (SELECT doc_id,
         |        unnest(list_transform(generate_series(1, len(w) - 7),
         |          i -> struct_pack(pos := CAST(i - 1 AS BIGINT),
         |                 h := ${Tables.portableHashSql(
                              "array_to_string(w[i:i+7], ' ')")}))) AS u
         |      FROM dw WHERE len(w) >= 8),
         |gr AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM g),
         |dh AS (SELECT h FROM gr GROUP BY h HAVING count(*) >= 2),
         |sp AS (SELECT doc_id, pos FROM gr JOIN dh USING (h)),
         |lg AS (SELECT doc_id, pos,
         |         pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |           AS gap
         |       FROM sp),
         |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams,
         |         CAST(1 + sum(CASE WHEN gap >= 8 THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_islands,
         |         CAST(8 + sum(CASE WHEN gap IS NULL THEN 0
         |                           ELSE least(gap, 8) END)
         |              AS BIGINT) AS covered_tokens
         |       FROM lg GROUP BY 1)
         |SELECT b.doc_id, b.n_words,
         |       CAST(coalesce(n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
         |       CAST(coalesce(n_islands, 0) AS BIGINT) AS n_islands,
         |       CAST(coalesce(covered_tokens, 0) AS BIGINT) AS covered_tokens,
         |       CAST(coalesce(covered_tokens, 0) * 1000 // b.n_words
         |            AS BIGINT) AS dup_permille
         |FROM b LEFT JOIN ag USING (doc_id) ORDER BY b.doc_id""".stripMargin,
    // Replays the three pair relations (Jaccard >= 0.5, hamming <= 3,
    // containment >= 0.9), tags and unions them, and computes the
    // pair-set agreement matrix.
    "q_dedup_agreement" ->
      s"""WITH $docShCtes, $interCte, $simhashCtes,
         |jacp AS (SELECT doc_a, doc_b FROM inter
         |         JOIN sizes sa ON doc_a = sa.doc_id
         |         JOIN sizes sb ON doc_b = sb.doc_id
         |         WHERE inter * 3 >= sa.n_sh + sb.n_sh),
         |ctp AS (SELECT doc_a, doc_b FROM inter
         |        JOIN sizes sa ON doc_a = sa.doc_id
         |        JOIN sizes sb ON doc_b = sb.doc_id
         |        WHERE inter * 10 >= least(sa.n_sh, sb.n_sh) * 9),
         |bands AS (SELECT doc_id, simhash, k,
         |            (simhash >> (16 * k)) & 65535 AS band_val
         |          FROM sim CROSS JOIN
         |            (SELECT unnest(generate_series(0, 3)) AS k) ks),
         |shp AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |        FROM bands a JOIN bands b
         |          ON a.k = b.k AND a.band_val = b.band_val
         |          AND a.doc_id < b.doc_id
         |        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |tg AS (SELECT 'containment' AS m, doc_a, doc_b FROM ctp
         |       UNION ALL SELECT 'ngram', doc_a, doc_b FROM jacp
         |       UNION ALL SELECT 'simhash', doc_a, doc_b FROM shp),
         |sz AS (SELECT m, CAST(count(*) AS BIGINT) AS n FROM tg GROUP BY 1),
         |cm AS (SELECT x.m AS ma, y.m AS mb,
         |         CAST(count(*) AS BIGINT) AS nc
         |       FROM tg x JOIN tg y
         |         ON x.doc_a = y.doc_a AND x.doc_b = y.doc_b AND x.m < y.m
         |       GROUP BY 1, 2)
         |SELECT a.m AS method_a, b.m AS method_b, a.n AS n_a, b.n AS n_b,
         |       CAST(coalesce(cm.nc, 0) AS BIGINT) AS n_common,
         |       CAST(coalesce(cm.nc, 0) * 1000 //
         |            greatest(a.n + b.n - coalesce(cm.nc, 0), 1) AS BIGINT)
         |         AS jaccard_permille
         |FROM sz a JOIN sz b ON a.m < b.m
         |LEFT JOIN cm ON cm.ma = a.m AND cm.mb = b.m
         |ORDER BY 1, 2""".stripMargin,
  )
}
