package graft
package entry

import graft.operators.Analytics
import graft.sources.Tables

/** Shared DuckDB-oracle CTE fragments and SQL helpers used across the
  * per-family registries in this package. These replay the engine's own
  * constructions (portable md5 hashing, integer money, left-fold float
  * reductions, index builds) in ANSI SQL so the driver's DuckDB compare is
  * bit-exact — see Tables.scala for the portability rules.
  */
object OracleCtes {
  val msgsCte = Tables.msgsCte

  /** Gap-sessionization CTE chain (30-min break) shared by `q_sessions`
    * and `q_session_stats`; final relation `s(user_id, em, session_id,
    * event_id)`.
    */
  val sessionsCtes: String =
    """e AS (
      |  SELECT event_id, user_id, epoch_ms(ts) AS em FROM events),
      |g AS (
      |  SELECT event_id, user_id, em,
      |         CASE WHEN em - lag(em, 1) OVER w > 1800000 THEN 1 ELSE 0 END
      |           AS gap_break
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY em, event_id)),
      |s AS (
      |  SELECT user_id, em, event_id,
      |         CAST(sum(gap_break) OVER (PARTITION BY user_id ORDER BY em, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |           AS session_id
      |  FROM g)""".stripMargin

  /** Mirrors `ChainLink.links` exactly, including its exclusion of inverted
    * (corrupt) intervals from both sides of the containment join.
    */
  val linksCte: String =
    """links AS (
      |  SELECT p.id AS parent_id, c.id AS child_id
      |  FROM msgs p JOIN msgs c
      |    ON p.dst_ip = c.src_ip
      |   AND p.start_at_ms <= c.start_at_ms
      |   AND p.end_at_ms >= c.end_at_ms
      |   AND p.id <> c.id
      |  WHERE p.end_at_ms >= p.start_at_ms
      |    AND c.end_at_ms >= c.start_at_ms
      |)""".stripMargin

  /** Marker-vote lang-id CTE chain; final relation `pr(doc_id, lang,
    * pred_lang)`. Shared by `lang_id` and `q_lang_confusion`.
    */
  val langIdCtes: String =
    """dw2 AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      |sc AS (SELECT doc_id, lang,
      |         CAST(len(list_filter(w, x -> x = 'the' OR x = 'order' OR x = 'table' OR x = 'window')) AS BIGINT) AS s_en,
      |         CAST(len(list_filter(w, x -> x = 'slow' OR x = 'agg' OR x = 'merge' OR x = 'vector')) AS BIGINT) AS s_es,
      |         CAST(len(list_filter(w, x -> x = 'scan' OR x = 'data' OR x = 'query' OR x = 'small')) AS BIGINT) AS s_fr,
      |         CAST(len(list_filter(w, x -> x = 'customer' OR x = 'hash' OR x = 'join' OR x = 'row')) AS BIGINT) AS s_de,
      |         CAST(len(list_filter(w, x -> x = 'join' OR x = 'small' OR x = 'customer' OR x = 'column')) AS BIGINT) AS s_zh
      |       FROM dw2),
      |pr AS (SELECT doc_id, lang,
      |         CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh THEN 'en'
      |              WHEN s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh THEN 'es'
      |              WHEN s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
      |              WHEN s_de >= s_zh THEN 'de'
      |              ELSE 'zh' END AS pred_lang
      |       FROM sc)""".stripMargin

  /** Word-array + distinct-3-gram-shingle CTEs over documents. */
  val docShCtes: String =
    """dw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(w) >= 3 THEN
      |      list_transform(generate_series(1, len(w) - 2),
      |                     i -> array_to_string(w[i:i+2], ' '))
      |    ELSE [] END)) AS shingle
      |  FROM dw),
      |shdf AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
      |shc AS (SELECT s.doc_id, s.shingle FROM sh s
      |        JOIN shdf d ON s.shingle = d.shingle WHERE d.df <= 64),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY 1)""".stripMargin

  /** BPE training replay: 8 chained merge rounds over the word-type table
    * (pair counts weighted by frequency, argmax count-desc/pair-asc, literal
    * replace on the angle-bracket symbol encoding — see
    * [[graft.operators.TextAnalysis.bpeVocabFor]]). Ends at `tok(word, wl,
    * wt)`: per-word char and BPE token counts under the learned vocab.
    * The fixed pair-index series 1..15 covers words to 16 symbols; the
    * corpus caps at 8.
    */
  val bpeCtes: String = {
    val rounds = (1 to operators.TextAnalysis.BpeMergeRounds).map { k =>
      s"""p$k AS (SELECT sy[i.i] AS pa, sy[i.i + 1] AS pb, sum(n) AS np
         |  FROM (SELECT n, regexp_extract_all(st, '<([a-z0-9]+)>', 1) AS sy
         |        FROM s${k - 1})
         |  CROSS JOIN (SELECT unnest(generate_series(1, 15)) AS i) i
         |  WHERE i.i < len(sy) GROUP BY 1, 2),
         |t$k AS (SELECT '<' || pa || '><' || pb || '>' AS pat,
         |               '<' || pa || pb || '>' AS rep
         |        FROM p$k ORDER BY np DESC, pa, pb LIMIT 1),
         |s$k AS (SELECT word, n, replace(st, t$k.pat, t$k.rep) AS st
         |        FROM s${k - 1}, t$k)""".stripMargin
    }.mkString(",\n")
    s"""vw AS (SELECT word, CAST(count(*) AS BIGINT) AS n
       |       FROM (SELECT unnest(string_split(text, ' ')) AS word
       |             FROM documents) GROUP BY 1),
       |s0 AS (SELECT word, n,
       |              regexp_replace(word, '(.)', '<\\1>', 'g') AS st
       |       FROM vw),
       |$rounds,
       |tok AS (SELECT word, CAST(len(word) AS BIGINT) AS wl,
       |          CAST(len(regexp_extract_all(st, '<([a-z0-9]+)>', 1))
       |            AS BIGINT) AS wt
       |        FROM s${operators.TextAnalysis.BpeMergeRounds})""".stripMargin
  }

  /** Pairwise shingle-intersection CTE (needs docShCtes). */
  val interCte: String =
    """inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  /** 63-bit simhash CTE chain over documents (needs dw from docShCtes). */
  val simhashCtes: String =
    """wh AS (SELECT doc_id, CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) AS wh
      |       FROM (SELECT doc_id, unnest(w) AS word FROM dw)),
      |bitsum AS (
      |  SELECT doc_id, b, sum(CASE WHEN (wh >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM wh CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS b) bs
      |  GROUP BY 1, 2),
      |sim AS (
      |  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b
      |                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
      |  FROM bitsum GROUP BY 1)""".stripMargin

  /** Normalized double-precision embedding CTE; dot products are left folds
    * matching Spark's `aggregate` exactly.
    */
  val vecCte: String =
    """v AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS e,
      |         sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
      |                          (a, b) -> a + b)) AS nrm
      |  FROM embeddings)""".stripMargin

  def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), s -> s[1] * s[2]), (x, y) -> x + y)"

  /** The four corpus-adaptive index sizes as DuckDB scalar subqueries over
    * `v` — the SQL mirrors of the Scala formulas, so the oracles replay
    * the ADAPTIVE index build at ANY scale instead of pinning the
    * oracle-scale constants (round 10: the correctness gate itself is now
    * scale-invariant; a full 183-query check runs green at sf1.0, where
    * K = 198, the panel stride is 200, and the LSH bands carry 7 bits).
    *
    * Parity notes, per formula:
    * - centroid K mirrors [[graft.operators.Similarity.centroidKFor]]
    *   (max(64, ⌈1.4·√N⌉)): sqrt and one multiply are correctly-rounded
    *   IEEE doubles in both engines and 1.4 parses to the same double, so
    *   the ceil agrees bit-for-bit.
    * - panel stride mirrors [[graft.operators.Similarity.panelStep]]
    *   (max(20, ⌈N/100⌉)) in pure BIGINT arithmetic — exact by
    *   construction.
    * - audit stride mirrors [[graft.operators.Dedup.exactPairsFor]]'s
    *   population cap (max(1, ⌈N/2000⌉)) — same integer form.
    * - LSH band plan mirrors [[graft.operators.Analytics.lshBandPlan]]
    *   (smallest (b, j) in capacity order with 2^(b+10) ≥ N·(8−j),
    *   encoded as bj = 4·b + j; eligibility ⟺ capacity ≥ N and capacity
    *   is strictly increasing along that encoding, so min(4·b+j) IS the
    *   first fit) — both sides use the integer comparison, no float log
    *   anywhere.
    */
  val centroidKSql: String =
    "(SELECT greatest(64, CAST(ceil(1.4 * sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT)) FROM v)"
  val panelStepSql: String =
    "(SELECT greatest(20, (count(*) + 99) // 100) FROM v)"
  val auditStrideSql: String =
    "(SELECT greatest(1, (count(*) + 1999) // 2000) FROM v)"
  val lshPlanSql: String =
    "(SELECT coalesce(min(4 * b + j), 64) " +
      "FROM generate_series(4, 15) t(b) CROSS JOIN generate_series(0, 3) u(j) " +
      "WHERE 1024 * (CAST(1 AS BIGINT) << b) >= " +
      "(SELECT count(*) FROM v) * (8 - j))"

  /** The shared band-extraction expression over an encoded plan column
    * `bj` and band index column `k` (0–3): band k covers planes
    * [k·bits + min(k, extra), +width), width = bits (+1 for k < extra).
    */
  def lshBandValSql(sig: String = "sig", bj: String = "bj",
      k: String = "k"): String =
    s"($sig >> ($k * ($bj // 4) + least($k, $bj % 4))) & " +
      s"((CAST(1 AS BIGINT) << (($bj // 4) + " +
      s"CASE WHEN $k < $bj % 4 THEN 1 ELSE 0 END)) - 1)"

  /** Hash-min sample CTE: the `kSql` vectors with the smallest portable
    * 60-bit hash of their id (ties -> min vec_id) -- the ONE home for the
    * deterministic selection every index oracle replays (IVF centroids,
    * k-means seeds, PQ codebooks), mirroring `Similarity.centroidsFor` /
    * `pqCodebookSub`. Drift in K, the hash, or the tie-break now touches
    * every consumer at once instead of silently desynchronizing one copy.
    * `kSql` defaults to the corpus-adaptive [[centroidKSql]]; the PQ
    * codebook passes a literal "16" (structural: 4-bit codes, not a
    * corpus-sized index). Rank-filter form rather than LIMIT so the count
    * can be a scalar subquery.
    */
  def hashMinCte(name: String, kSql: String = centroidKSql,
      cols: String = "vec_id AS cent_id, e AS ce, nrm AS cn"): String =
    s"""$name AS (SELECT $cols FROM (
       |    SELECT *, row_number() OVER (ORDER BY
       |      CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
       |           AS BIGINT), vec_id) AS hmrk
       |    FROM v)
       |  WHERE hmrk <= $kSql)""".stripMargin

  /** Per-bucket hash-min member cap replaying the
    * [[graft.operators.Dedup.PairCapB]] budget on the kNN member side:
    * of relation `src(vec_id, cent_id)`, keep each bucket's B
    * smallest-salted-hash members (ties → min vec_id). The rank hash is
    * PER-BUCKET-SALTED (`cent_id:vec_id`, round 15 — the same
    * [[subBucketCte]] lesson): a global hash(vec_id) order retains the
    * SAME corpus-wide hash-min vectors in every bucket, so widening the
    * probe meets the same candidates and the un-retained mass is never
    * reachable from any probe; per-bucket salts make the retained sets
    * independent.
    */
  def bucketCapCte(name: String, src: String,
      cap: Int = graft.operators.Dedup.PairCapB): String =
    s"""$name AS (SELECT vec_id, cent_id FROM (
       |    SELECT vec_id, cent_id,
       |           row_number() OVER (PARTITION BY cent_id ORDER BY
       |             ${Tables.portableHashSql(
                       "CAST(cent_id AS VARCHAR) || ':' || CAST(vec_id AS VARCHAR)")},
       |             vec_id) AS bcr
       |    FROM $src) WHERE bcr <= $cap)""".stripMargin

  /** Per-bucket hash-min SUB-BUCKET split replaying
    * [[graft.operators.Dedup.subBucketPairs]] — the round-14 production
    * pair budget under [[graft.operators.Dedup.ivfHashminPairsFor]]'s
    * routed probes (and, single-level, under the legacy
    * [[graft.operators.Dedup.ivfPairs]] audit baseline): each bucket's
    * members ranked by the PER-BUCKET-SALTED
    * portable hash of `cent_id:vec_id` (ties → min vec_id) and split
    * into consecutive width-B sub-buckets, `sub = (rank − 1) div B`;
    * pair oracles join on (cent_id, sub). Salting makes the splits of
    * DIFFERENT buckets independent: under the earlier global
    * hash(vec_id) order a pair separated in hash rank was separated in
    * EVERY bucket it co-occupied, so multi-probe redundancy bought no
    * retention (measured: widening the routed probe from 4 to 8 fine
    * cells per coarse cell LOWERED pair recall 403 → 241 permille at
    * sf0.1); with per-bucket salts a pair sharing k buckets survives
    * ≈ 1-(1-B/s)^k (same sf0.1 widening: 579 → 622). The ONE home for
    * the sub-bucket decision every pair oracle replays. Width is the
    * round-15 [[graft.operators.Dedup.PairSubB]] (512): the sweep
    * measured pair-build wall time B-insensitive through sf10 while
    * recall is ~linear in B, so the pair paths run the widest flat
    * budget; the candidate-POOL caps (kNN member cap, [[bucketCapCte]])
    * stay at [[graft.operators.Dedup.PairCapB]] where per-query cost IS
    * ∝ B.
    */
  def subBucketCte(name: String, src: String): String =
    s"""$name AS (SELECT vec_id, cent_id,
       |           (bcr - 1) // ${graft.operators.Dedup.PairSubB} AS sub
       |    FROM (
       |    SELECT vec_id, cent_id,
       |           row_number() OVER (PARTITION BY cent_id ORDER BY
       |             ${Tables.portableHashSql(
                       "CAST(cent_id AS VARCHAR) || ':' || CAST(vec_id AS VARCHAR)")},
       |             vec_id) AS bcr
       |    FROM $src))""".stripMargin

  /** Two-level quantizer BASE (needs `v` and `cents` upstream): `coarse`
    * = the ⌈√K⌉ hash-min PREFIX of the fine centroid table (same 60-bit
    * hash and tie rule as the fine selection), `f2c` = fine centroid →
    * its nearest coarse cell (ties → min co_id) — replaying
    * [[graft.operators.Similarity.coarseMemoFor]] /
    * [[graft.operators.Similarity.fineToCoarse]]. The ONE home for the
    * two-level index build every IVF² oracle replays (searches in
    * SimilarityQueries, the routed pair build in DedupQueries).
    */
  lazy val ivf2BaseCtes: String = ivf2BaseCtesOver("", "cents")

  /** [[ivf2BaseCtes]] over an ARBITRARY fine-centroid relation `$cents`
    * with name-prefixed outputs (`${prefix}coarse`, `${prefix}f2c`) so
    * two quantizer instances (e.g. hash-min seeds AND the k-means-refined
    * table, as in `q_ann_recall_kmeans`) can coexist in one oracle.
    */
  def ivf2BaseCtesOver(prefix: String, cents: String): String =
    s"""${prefix}coarse AS (SELECT cent_id AS co_id, ce AS oe, cn AS ocn FROM (
       |    SELECT *, row_number() OVER (ORDER BY
       |      CAST('0x' || substr(md5(CAST(cent_id AS VARCHAR)), 1, 15)
       |           AS BIGINT), cent_id) AS hmrk
       |    FROM $cents)
       |  WHERE hmrk <= greatest(8, CAST(ceil(sqrt(
       |    CAST($centroidKSql AS DOUBLE))) AS BIGINT))),
       |${prefix}f2c AS (SELECT cent_id, co_id FROM (
       |    SELECT c.cent_id, o.co_id,
       |           row_number() OVER (PARTITION BY c.cent_id ORDER BY
       |             ${dotSql("c.ce", "o.oe")} / (c.cn * o.ocn) DESC,
       |             o.co_id) AS rn
       |    FROM $cents c CROSS JOIN ${prefix}coarse o) WHERE rn = 1)""".stripMargin

  /** Two-level-routed corpus probes (needs `v`, `$cents` and
    * [[ivf2BaseCtesOver]]`(prefix, cents)` upstream): `$out(vec_id,
    * cent_id)` — every vector routed through its top-`coarseNprobe`
    * coarse cells, probing the top-`finePerCell` fine centroids within
    * EACH routed cell. Replays
    * [[graft.operators.Similarity.ivf2ProbeIds]], the production pair
    * builds' probe relation since the round-14 migration.
    */
  def ivf2ProbeCte(out: String, prefix: String, cents: String,
      coarseNprobe: Int, finePerCell: Int): String =
    s"""${out}vco AS (SELECT vec_id, co_id FROM (
       |    SELECT v.vec_id, o.co_id,
       |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |             ${dotSql("v.e", "o.oe")} / (v.nrm * o.ocn) DESC,
       |             o.co_id) AS rn
       |    FROM v CROSS JOIN ${prefix}coarse o) WHERE rn <= $coarseNprobe),
       |$out AS (SELECT vec_id, cent_id FROM (
       |    SELECT v.vec_id, w.co_id, c.cent_id,
       |           row_number() OVER (PARTITION BY v.vec_id, w.co_id
       |             ORDER BY
       |             ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
       |             c.cent_id) AS rn
       |    FROM v JOIN ${out}vco w ON v.vec_id = w.vec_id
       |    JOIN ${prefix}f2c f ON f.co_id = w.co_id
       |    JOIN $cents c ON c.cent_id = f.cent_id) WHERE rn <= $finePerCell)"""
      .stripMargin

  /** Two-level assignment (needs `v`, `$cents` and
    * [[ivf2BaseCtesOver]]`(prefix, cents)` upstream): `$out(vec_id,
    * cent_id)` — every vector assigned to its top-1 coarse cell's
    * within-cell argmax fine centroid (ties → min id at both levels),
    * replaying [[graft.operators.Similarity.ivf2Assign]]. The member
    * index of the round-15 routed kNN build and the Lloyd assignment.
    */
  def ivf2AsgCte(out: String, prefix: String, cents: String): String =
    s"""${out}co AS (SELECT vec_id, co_id FROM (
       |    SELECT v.vec_id, o.co_id,
       |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |             ${dotSql("v.e", "o.oe")} / (v.nrm * o.ocn) DESC,
       |             o.co_id) AS rn
       |    FROM v CROSS JOIN ${prefix}coarse o) WHERE rn = 1),
       |$out AS (SELECT vec_id, cent_id FROM (
       |    SELECT v.vec_id, c.cent_id,
       |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |             ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
       |             c.cent_id) AS rn
       |    FROM v JOIN ${out}co w ON v.vec_id = w.vec_id
       |    JOIN ${prefix}f2c f ON f.co_id = w.co_id
       |    JOIN $cents c ON c.cent_id = f.cent_id) WHERE rn = 1)""".stripMargin

  /** Sub-bucketed, exact-cosine-verified near-dup pair set over a probe
    * relation `src(vec_id, cent_id)` (needs `v`): `$out(vec_a, vec_b,
    * cos)` — the [[graft.operators.Dedup.subBucketPairs]] mechanism
    * (salted width-B split, same-sub-bucket candidates, cosine scored on
    * the corpus join, ≥ [[graft.operators.Dedup.PairCosThreshold]],
    * distinct) as ONE shared fragment for every pair-build oracle.
    */
  def ivfPairCtes(out: String, src: String): String =
    s"""${subBucketCte(s"${out}cap", src)},
       |${out}cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |          FROM ${out}cap a JOIN ${out}cap b
       |            ON a.cent_id = b.cent_id AND a.sub = b.sub
       |           AND a.vec_id < b.vec_id),
       |$out AS (SELECT * FROM (
       |    SELECT c.vec_a, c.vec_b,
       |           ${dotSql("va.e", "vb.e")} / (va.nrm * vb.nrm) AS cos
       |    FROM ${out}cand c
       |    JOIN v va ON c.vec_a = va.vec_id
       |    JOIN v vb ON c.vec_b = vb.vec_id)
       |  WHERE cos >= ${operators.Dedup.PairCosThresholdSql})""".stripMargin

  /** kNN edge chain replaying
    * [[graft.operators.Neighbors.knnWorkEdgesFor]] +
    * [[graft.operators.Neighbors.knnEdgesFor]]: two-level routed probes
    * at the graph's production width → two-level assignment → salted
    * member cap → exact-cosine
    * top-[[graft.operators.Neighbors.KnnWorkK]] seed → unrolled
    * NN-descent rounds (reverse adjacency capped at the working degree,
    * symmetrized union, unordered-pair candidates deduplicated before
    * scoring, both directions re-ranked) → serving truncation
    * `${p}ek (src, dst, rk ≤ GraphK)`.
    *
    * The round count is a FIXED 2 at every scale — measured exhausted,
    * not assumed: the r17 sweep rejected round 3 at sf1.0 (+2‰) and the
    * r18 sweep closed the sf10 axis (rounds 3–5: +2/+0/+0‰) — so the
    * unroll replays the production constant directly; a corpus-gated
    * unroll was prototyped in round 18 and dropped with its premise.
    *
    * Expects `v`, the centroid table `cents` and its
    * [[ivf2BaseCtesOver]] (prefix `basePrefix`) upstream. All relation
    * names carry prefix `p` so pair oracles can inject the chain beside
    * their own probe chains without collisions; the knn-family oracles
    * use the unprefixed form ([[graft.entry.SimilarityQueries]]); pair
    * oracles consume the scored relations `${p}sn1..R` through
    * [[graphPairsCte]] (round 18 — the scored-survivor candidate
    * source).
    *
    * Dedup is spelled `SELECT DISTINCT … FROM (… UNION ALL …)`, never
    * bare `UNION`: DuckDB 1.0.0 silently treats a NON-self-referencing
    * UNION CTE inside a `WITH RECURSIVE` block as UNION ALL (the
    * q_knn_clusters replay runs this chain inside WITH RECURSIVE — a
    * bare UNION verified green on plain-WITH consumers while corrupting
    * the recursive one with duplicate candidate rows).
    */
  def knnEdgeCtes(p: String, basePrefix: String, cents: String): String = {
    import graft.operators.Neighbors
    val workK = Neighbors.KnnWorkK
    val rounds = (1 to Neighbors.KnnRefineRounds).map { i =>
      val prev = if (i == 1) s"${p}ek0" else s"${p}ek${i - 1}"
      s"""${p}rv$i AS (SELECT src, dst FROM (
         |  SELECT e.dst AS src, e.src AS dst,
         |         row_number() OVER (PARTITION BY e.dst ORDER BY
         |           ${Tables.portableHashSql(
                       "CAST(e.dst AS VARCHAR) || ':' || CAST(e.src AS VARCHAR)")},
         |           e.src) AS rr
         |  FROM $prev e) WHERE rr <= $workK),
         |${p}un$i AS (SELECT DISTINCT src, dst FROM (
         |         SELECT src, dst FROM $prev
         |         UNION ALL SELECT src, dst FROM ${p}rv$i)),
         |${p}pr$i AS (SELECT DISTINCT least(src, dst) AS a,
         |                greatest(src, dst) AS b FROM (
         |         SELECT a.src AS src, b.dst AS dst
         |         FROM ${p}un$i a JOIN ${p}un$i b ON a.dst = b.src
         |         UNION ALL SELECT src, dst FROM $prev)
         |         WHERE src <> dst),
         |${p}sn$i AS MATERIALIZED (SELECT a, b,
         |           ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
         |         FROM ${p}pr$i JOIN v q ON q.vec_id = a
         |         JOIN v t ON t.vec_id = b),
         |${p}ek$i AS MATERIALIZED (SELECT src, dst, rk FROM (
         |         SELECT src, dst,
         |                row_number() OVER (PARTITION BY src
         |                  ORDER BY cos DESC, dst) AS rk
         |         FROM (SELECT a AS src, b AS dst, cos FROM ${p}sn$i
         |               UNION ALL SELECT b, a, cos FROM ${p}sn$i))
         |         WHERE rk <= $workK)""".stripMargin
    }
    val last = s"${p}ek${Neighbors.KnnRefineRounds}"
    (s"""${ivf2ProbeCte(s"${p}kpr", basePrefix, cents,
         Neighbors.KnnCoarseNprobe, Neighbors.KnnFinePerCell)},
       |${ivf2AsgCte(s"${p}kasg", basePrefix, cents)},
       |${bucketCapCte(s"${p}mcap", s"${p}kasg", Neighbors.KnnMemberCap)},
       |${p}kcand AS (SELECT pb.vec_id AS src, a.vec_id AS dst
       |         FROM ${p}kpr pb JOIN ${p}mcap a USING (cent_id)
       |         WHERE a.vec_id <> pb.vec_id),
       |${p}ksc AS (SELECT src, dst,
       |         ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
       |       FROM ${p}kcand JOIN v q ON q.vec_id = src
       |       JOIN v t ON t.vec_id = dst),
       |${p}ek0 AS MATERIALIZED (SELECT src, dst, rk FROM (
       |         SELECT src, dst,
       |                row_number() OVER (PARTITION BY src
       |                  ORDER BY cos DESC, dst) AS rk
       |         FROM ${p}ksc) WHERE rk <= $workK)""".stripMargin +: rounds)
      .mkString(",\n") +
      // serving truncation: the working-degree graph clipped to GraphK
      s",\n${p}ek AS (SELECT src, dst, rk FROM $last" +
      s" WHERE rk <= ${Neighbors.GraphK})"
  }

  /** Graph-derived verified near-dup pairs replaying
    * [[graft.operators.Dedup.graphPairsFor]] /
    * [[graft.operators.Neighbors.knnScoredPairsFor]] (round-18 form):
    * the refine rounds' SCORED candidate relations `${p}sn1..R` —
    * already unordered (a < b) and exact-cosine-scored by the
    * [[knnEdgeCtes]] chain — filtered at
    * [[graft.operators.Dedup.PairCosThreshold]] and deduplicated across
    * rounds. The round-17 form re-derived pairs from the serving EDGE
    * list; the survivors are its strict superset (every kept edge was
    * scored in its round).
    */
  def graphPairsCte(out: String, p: String): String = {
    val unions = (1 to graft.operators.Neighbors.KnnRefineRounds)
      .map(i => s"SELECT a, b, cos FROM ${p}sn$i")
      .mkString("\n         UNION ALL ")
    s"""$out AS (SELECT DISTINCT a AS vec_a, b AS vec_b, cos FROM (
       |         $unions)
       |  WHERE cos >= ${operators.Dedup.PairCosThresholdSql})""".stripMargin
  }

  /** Exact full-dimension cosine top-5 CTE chain (`ep` pairs → `ext`
    * top-5) — the recall-audit baseline replaying
    * [[operators.Similarity.annTopkFor]]; shared by every `*_recall`
    * oracle that compares an approximate index against the exact scan.
    */
  val exactTopCtes: String =
    s"""ep AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
       |         ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
       |       FROM v q JOIN v t ON t.vec_id <> q.vec_id
       |       WHERE q.vec_id % $panelStepSql = 0),
       |ext AS (SELECT q_id, n_id FROM (
       |          SELECT q_id, n_id,
       |                 row_number() OVER (PARTITION BY q_id
       |                   ORDER BY cos DESC, n_id) AS rk
       |          FROM ep) WHERE rk <= 5)""".stripMargin

  /** SQ8 CTE chain replaying [[operators.Similarity.sqCodesFor]] →
    * [[operators.Similarity.sqTopFor]]: unit-normalize, per-dim maxabs
    * scales, `round(127·x̂/maxabs)` codes rebuilt into ordered BIGINT
    * lists, then integer-dot scored query×corpus pairs (`sd`). The int64
    * sum needs no fold-order discipline — it is exact in both engines.
    */
  val sqCtes: String =
    s"""vn AS (SELECT vec_id, list_transform(e, x -> x / nrm) AS en FROM v),
      |sp AS (SELECT vec_id, di.i - 1 AS dim, en[di.i] AS x
      |       FROM vn CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) di),
      |ss AS (SELECT dim, max(abs(x)) AS maxabs FROM sp GROUP BY 1),
      |sc AS (SELECT vec_id,
      |         list(CAST(round(x * 127.0 / maxabs) AS BIGINT)
      |              ORDER BY sp.dim) AS qe
      |       FROM sp JOIN ss ON sp.dim = ss.dim GROUP BY vec_id),
      |sd AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
      |         CAST(list_reduce(list_transform(list_zip(q.qe, t.qe),
      |                s -> s[1] * s[2]), (x, y) -> x + y) AS BIGINT) AS dot
      |       FROM sc q JOIN sc t ON t.vec_id <> q.vec_id
      |       WHERE q.vec_id % $panelStepSql = 0)""".stripMargin

  /** SQ8∘IVF CTE chain (needs vecCte + sqCtes): hash-min coarse centroids,
    * nearest-centroid assignment, nprobe=2 query probes, candidate pairs,
    * then integer-dot scores over the SQ8 codes (`sc`) — replaying
    * [[operators.Similarity.sqIvfTopBuild]]. Ends in
    * `sqdi(q_id, n_id, dot)`.
    */
  lazy val sqIvfCtes: String =
    s"""${hashMinCte("qcents")},
       |qasg AS (SELECT vec_id, cent_id FROM (
       |           SELECT v.vec_id, c.cent_id,
       |                  row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |                    ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
       |                    c.cent_id) AS rn
       |           FROM v CROSS JOIN qcents c) WHERE rn = 1),
       |qprobes AS (SELECT q_id, cent_id FROM (
       |              SELECT v.vec_id AS q_id, c.cent_id,
       |                     row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |                       ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
       |                       c.cent_id) AS rn
       |              FROM v CROSS JOIN qcents c WHERE v.vec_id % $panelStepSql = 0)
       |            WHERE rn <= 2),
       |sqcand AS (SELECT p.q_id, a.vec_id FROM qprobes p
       |           JOIN qasg a ON p.cent_id = a.cent_id
       |           WHERE a.vec_id <> p.q_id),
       |sqdi AS (SELECT cd.q_id, cd.vec_id AS n_id,
       |           CAST(list_reduce(list_transform(list_zip(cq.qe, ct.qe),
       |                  z -> z[1] * z[2]), (ac, el) -> ac + el) AS BIGINT)
       |             AS dot
       |         FROM sqcand cd
       |         JOIN sc cq ON cq.vec_id = cd.q_id
       |         JOIN sc ct ON ct.vec_id = cd.vec_id)""".stripMargin

  /** Labeled IVF-candidate CTE chain (needs vecCte) ending in
    * `hcos(q_id, q_label, n_id, n_label, cos)` — replays
    * [[operators.Similarity.labeledCandCos]]: hash-min centroids,
    * nearest-centroid assignment, nprobe=2 query probes, candidate pairs,
    * both labels, exact cosine. Shared by the `q_hard_negatives` and
    * `q_triplets` oracles.
    */
  lazy val hardMineCtes: String =
    s"""${hashMinCte("hcents")},
       |hasg AS (SELECT vec_id, cent_id FROM (
       |           SELECT v.vec_id, c.cent_id,
       |                  row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |                    ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
       |                    c.cent_id) AS rn
       |           FROM v CROSS JOIN hcents c) WHERE rn = 1),
       |hprob AS (SELECT q_id, cent_id FROM (
       |            SELECT v.vec_id AS q_id, c.cent_id,
       |                   row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |                     ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
       |                     c.cent_id) AS rn
       |            FROM v CROSS JOIN hcents c WHERE v.vec_id % $panelStepSql = 0)
       |          WHERE rn <= 2),
       |hcand AS (SELECT p.q_id, a.vec_id FROM hprob p
       |          JOIN hasg a ON p.cent_id = a.cent_id
       |          WHERE a.vec_id <> p.q_id),
       |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label
       |        FROM embeddings),
       |hcos AS (SELECT c.q_id, ql.label AS q_label, c.vec_id AS n_id,
       |           nl.label AS n_label,
       |           ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
       |         FROM hcand c
       |         JOIN v q ON c.q_id = q.vec_id
       |         JOIN v t ON c.vec_id = t.vec_id
       |         JOIN lab ql ON c.q_id = ql.vec_id
       |         JOIN lab nl ON c.vec_id = nl.vec_id)""".stripMargin

  def l2sqSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), s -> (s[1] - s[2]) * (s[1] - s[2])), (x, y) -> x + y)"

  /** CTE chain replaying [[graft.operators.Clustering.kmeansCentroids]]
    * with 2 Lloyd iterations: hash-min seeds → integer-exact micro-unit
    * mean update → rebuilt centroid lists + left-fold norms, twice. Ends
    * in `kcents(cent_id, ce, cn)`. Every step (round, trunc-div, double
    * division, fold) is the bit-identical arithmetic the Spark loop runs.
    */
  lazy val kmeansCtes: String = {
    // Round-15 routed assignment: per iteration, the coarse prefix +
    // fine→coarse map re-derive from the CURRENT centroid table
    // ([[ivf2BaseCtesOver]]) and each vector routes top-1 coarse then
    // argmaxes within its cell ([[ivf2AsgCte]]) — replaying
    // [[graft.operators.Clustering.kmeansCentroids]]'s
    // `ivf2Assign(v, cents, coarsePrefix(cents, k1))` per iteration.
    def assign(prefix: String, cents: String, out: String) =
      s"""${ivf2BaseCtesOver(prefix, cents)},
         |${ivf2AsgCte(s"${out}i", prefix, cents)},
         |$out AS (SELECT a.cent_id, v.e
         |         FROM ${out}i a JOIN v ON v.vec_id = a.vec_id)""".stripMargin
    def update(asg: String, out: String) =
      s"""${out}q AS (SELECT cent_id, di.i - 1 AS dim,
         |            CAST(trunc(CAST(sum(CAST(round(e[di.i] * 1000000.0) AS BIGINT))
         |                             AS DOUBLE) / count(*)) AS BIGINT) AS cq
         |     FROM $asg CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) di
         |     GROUP BY 1, 2),
         |${out}l AS (SELECT cent_id, list(cq / 1000000.0 ORDER BY dim) AS ce
         |     FROM ${out}q GROUP BY 1),
         |$out AS (SELECT cent_id, ce, sqrt(${dotSql("ce", "ce")}) AS cn FROM ${out}l)""".stripMargin
    s"""${hashMinCte("seeds")},
       |${assign("s1", "seeds", "ka1")},
       |${update("ka1", "kc1")},
       |${assign("s2", "kc1", "ka2")},
       |${update("ka2", "kcents")}""".stripMargin
  }

  /** PQ/ADC CTE chain (needs vecCte): 16 hash-min codebook vectors, 8×8-dim
    * subspaces, L2² left-fold encode argmin, micro-unit integer ADC sums.
    * Ends in `adc(q_id, n_id, adc_q)`; shared by `q_pq_search` and the
    * `q_pq_recall` audit.
    */
  lazy val pqCtes: String =
    s"""${hashMinCte("cb", "16", "vec_id AS code, e AS cbe")},
       |mi AS (SELECT unnest(generate_series(0, 7)) AS m),
       |cbs AS (SELECT code, m, cbe[m * 8 + 1 : m * 8 + 8] AS cw
       |        FROM cb CROSS JOIN mi),
       |vs AS (SELECT vec_id, m, e[m * 8 + 1 : m * 8 + 8] AS sv
       |       FROM v CROSS JOIN mi),
       |codes AS (SELECT vec_id, m, code FROM (
       |            SELECT vs.vec_id, vs.m, cbs.code,
       |                   row_number() OVER (PARTITION BY vs.vec_id, vs.m
       |                     ORDER BY ${l2sqSql("vs.sv", "cbs.cw")}, cbs.code) AS rn
       |            FROM vs JOIN cbs ON vs.m = cbs.m) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id % $panelStepSql = 0),
       |qs AS (SELECT q_id, m, qe[m * 8 + 1 : m * 8 + 8] AS qsub
       |       FROM q CROSS JOIN mi),
       |dtab AS (SELECT q_id, qs.m, cbs.code,
       |                CAST(round(${l2sqSql("qs.qsub", "cbs.cw")} * 1000000.0)
       |                     AS BIGINT) AS dq
       |         FROM qs JOIN cbs ON qs.m = cbs.m),
       |adc AS (SELECT d.q_id, c.vec_id AS n_id, CAST(sum(d.dq) AS BIGINT) AS adc_q
       |        FROM codes c JOIN dtab d ON c.m = d.m AND c.code = d.code
       |        WHERE c.vec_id <> d.q_id GROUP BY 1, 2)""".stripMargin

  /** IVF probe-restriction CTE chain for the PQ∘IVF search (needs vecCte +
    * pqCtes): hash-min centroids, nearest-centroid assignment, nprobe=2
    * query probes, candidate (q_id, vec_id) pairs, and `adci` — the ADC
    * scoring of [[pqCtes]] restricted to each query's probed buckets.
    * Replays [[graft.operators.Similarity.pqIvfTopBuild]] exactly.
    */
  lazy val pqIvfCtes: String =
    s"""${hashMinCte("icents")},
       |iasg AS (SELECT vec_id, cent_id FROM (
       |           SELECT v.vec_id, c.cent_id,
       |                  row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |                    ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
       |                    c.cent_id) AS rn
       |           FROM v CROSS JOIN icents c) WHERE rn = 1),
       |iprobes AS (SELECT q_id, cent_id FROM (
       |              SELECT v.vec_id AS q_id, c.cent_id,
       |                     row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |                       ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
       |                       c.cent_id) AS rn
       |              FROM v CROSS JOIN icents c WHERE v.vec_id % $panelStepSql = 0)
       |            WHERE rn <= 2),
       |icand AS (SELECT p.q_id, a.vec_id FROM iprobes p
       |          JOIN iasg a ON p.cent_id = a.cent_id
       |          WHERE a.vec_id <> p.q_id),
       |adci AS (SELECT x.q_id, c.vec_id AS n_id,
       |                CAST(sum(d.dq) AS BIGINT) AS adc_q
       |         FROM icand x
       |         JOIN codes c ON x.vec_id = c.vec_id
       |         JOIN dtab d ON d.q_id = x.q_id AND d.m = c.m AND d.code = c.code
       |         GROUP BY 1, 2)""".stripMargin

  /** Per-subspace Lloyd training CTE chain (needs vecCte + pqCtes): 2
    * k-means iterations over each subspace's subvectors from the hash-min
    * seed codebook `cbs`, exact integer micro-unit means (the
    * [[kmeansCtes]] arithmetic applied per (m, code)). Ends in
    * `tcbs(code, m, cw)` plus the trained-codebook encode/ADC chain
    * `tadc(q_id, n_id, adc_q)`.
    */
  lazy val pqTrainCtes: String = {
    def assign(cbs: String, out: String) =
      s"""$out AS (SELECT m, code, sv FROM (
         |       SELECT vs.vec_id, vs.m, c.code, vs.sv,
         |              row_number() OVER (PARTITION BY vs.vec_id, vs.m
         |                ORDER BY ${l2sqSql("vs.sv", "c.cw")}, c.code) AS rn
         |       FROM vs JOIN $cbs c ON vs.m = c.m) WHERE rn = 1)""".stripMargin
    def update(asg: String, out: String) =
      s"""${out}q AS (SELECT m, code, di.i AS dim,
         |            CAST(trunc(CAST(sum(CAST(round(sv[di.i] * 1000000.0) AS BIGINT))
         |                             AS DOUBLE) / count(*)) AS BIGINT) AS cq
         |     FROM $asg CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS i) di
         |     GROUP BY 1, 2, 3),
         |$out AS (SELECT code, m, list(cq / 1000000.0 ORDER BY dim) AS cw
         |     FROM ${out}q GROUP BY 1, 2)""".stripMargin
    s"""${assign("cbs", "ta1")},
       |${update("ta1", "tcb1")},
       |${assign("tcb1", "ta2")},
       |${update("ta2", "tcbs")},
       |tcodes AS (SELECT vec_id, m, code FROM (
       |             SELECT vs.vec_id, vs.m, c.code,
       |                    row_number() OVER (PARTITION BY vs.vec_id, vs.m
       |                      ORDER BY ${l2sqSql("vs.sv", "c.cw")}, c.code) AS rn
       |             FROM vs JOIN tcbs c ON vs.m = c.m) WHERE rn = 1),
       |tdtab AS (SELECT q_id, qs.m, c.code,
       |                 CAST(round(${l2sqSql("qs.qsub", "c.cw")} * 1000000.0)
       |                      AS BIGINT) AS dq
       |          FROM qs JOIN tcbs c ON qs.m = c.m),
       |tadc AS (SELECT d.q_id, c.vec_id AS n_id, CAST(sum(d.dq) AS BIGINT) AS adc_q
       |         FROM tcodes c JOIN tdtab d ON c.m = d.m AND c.code = d.code
       |         WHERE c.vec_id <> d.q_id GROUP BY 1, 2)""".stripMargin
  }

  /** Trained PQ∘IVF scoring CTE (needs vecCte + pqCtes + pqIvfCtes +
    * pqTrainCtes): the [[pqIvfCtes]] bucket restriction with the trained
    * codes/ADC tables swapped in. Ends in `tadci(q_id, n_id, adc_q)`.
    * Replays [[graft.operators.Similarity.pqIvfTrainedTopBuild]] exactly.
    */
  lazy val pqIvfTrainedCte: String =
    s"""tadci AS (SELECT x.q_id, c.vec_id AS n_id,
       |                 CAST(sum(d.dq) AS BIGINT) AS adc_q
       |          FROM icand x
       |          JOIN tcodes c ON x.vec_id = c.vec_id
       |          JOIN tdtab d ON d.q_id = x.q_id AND d.m = c.m
       |            AND d.code = c.code
       |          GROUP BY 1, 2)""".stripMargin

  /** Residual-PQ (IVFADC) CTE chain (needs vecCte + pqCtes + pqIvfCtes):
    * per-vector residuals to the assigned hash-min centroid, a residual
    * codebook over the same sample ids, residual encode, per-(query,
    * probed-centroid) ADC tables, bucket-restricted scoring. Ends in
    * `radc(q_id, n_id, adc_q)`. Replays
    * [[graft.operators.Similarity.pqResidualTopFor]] exactly.
    */
  lazy val pqResCtes: String = {
    def sub(a: String, b: String) =
      s"list_transform(list_zip($a, $b), s -> s[1] - s[2])"
    s"""resv AS (SELECT a.vec_id, a.cent_id, ${sub("v.e", "c.ce")} AS rv
       |         FROM iasg a JOIN v ON a.vec_id = v.vec_id
       |         JOIN icents c ON a.cent_id = c.cent_id),
       |rcb AS (SELECT r.vec_id AS code, r.rv AS cbe
       |        FROM resv r JOIN cb ON r.vec_id = cb.code),
       |rcbs AS (SELECT code, m, cbe[m * 8 + 1 : m * 8 + 8] AS cw
       |         FROM rcb CROSS JOIN mi),
       |rvs AS (SELECT vec_id, cent_id, m, rv[m * 8 + 1 : m * 8 + 8] AS sv
       |        FROM resv CROSS JOIN mi),
       |rcodes AS (SELECT vec_id, cent_id, m, code FROM (
       |             SELECT rvs.vec_id, rvs.cent_id, rvs.m, rcbs.code,
       |                    row_number() OVER (PARTITION BY rvs.vec_id, rvs.m
       |                      ORDER BY ${l2sqSql("rvs.sv", "rcbs.cw")}, rcbs.code) AS rn
       |             FROM rvs JOIN rcbs ON rvs.m = rcbs.m) WHERE rn = 1),
       |qres AS (SELECT p.q_id, p.cent_id, ${sub("v.e", "c.ce")} AS qr
       |         FROM iprobes p JOIN v ON p.q_id = v.vec_id
       |         JOIN icents c ON p.cent_id = c.cent_id),
       |rqs AS (SELECT q_id, cent_id, m, qr[m * 8 + 1 : m * 8 + 8] AS qsub
       |        FROM qres CROSS JOIN mi),
       |rdtab AS (SELECT q_id, cent_id, rqs.m, rcbs.code,
       |                 CAST(round(${l2sqSql("rqs.qsub", "rcbs.cw")} * 1000000.0)
       |                      AS BIGINT) AS dq
       |          FROM rqs JOIN rcbs ON rqs.m = rcbs.m),
       |radc AS (SELECT x.q_id, c.vec_id AS n_id,
       |                CAST(sum(d.dq) AS BIGINT) AS adc_q
       |         FROM icand x JOIN rcodes c ON x.vec_id = c.vec_id
       |         JOIN rdtab d ON d.q_id = x.q_id AND d.cent_id = c.cent_id
       |                     AND d.m = c.m AND d.code = c.code
       |         GROUP BY 1, 2)""".stripMargin
  }

  val revenueE4 =
    """CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |         * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)""".stripMargin

  /** All 64 hyperplane sign terms — the q_lsh_cosine oracle's signature,
    * masked down to the [[lshPlanSql]] plan's planes by the band
    * expression exactly as the Spark side builds only 4·bits+extra terms;
    * the surplus
    * high bits never reach a band value, so the two signatures band
    * identically at every scale. Terms are emitted in ascending bit
    * order, so partial sums stay within BIGINT even with bit 63's
    * negative two's-complement literal (b = 63 is reachable only past
    * ~8.4M vectors, where both engines wrap identically).
    */
  lazy val sigTerms64Sql: String =
    Analytics.hyperplaneSigns.zipWithIndex.map { case (row, b) =>
      val lits = row.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN ${dotSql("e", lits)} > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END)"
    }.mkString(" + ")

  lazy val lshCosineSql: String = {
    // `sb` replays the round-15 salted sub-bucket budget on (k, band_val)
    // buckets — the [[subBucketCte]] mechanism over a composite bucket
    // key (hash of k:band_val:vec_id, ties → min vec_id, width-B split).
    s"""WITH $vecCte,
       |bb AS (SELECT $lshPlanSql AS bj),
       |sig AS (SELECT vec_id, e, nrm, CAST($sigTerms64Sql AS BIGINT) AS sig FROM v),
       |bands AS (SELECT vec_id, sig, k,
       |            ${lshBandValSql()} AS band_val
       |          FROM sig CROSS JOIN bb
       |          CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) ks),
       |sb AS (SELECT vec_id, k, band_val,
       |           (bcr - 1) // ${graft.operators.Dedup.PairCapB} AS sub
       |    FROM (
       |    SELECT vec_id, k, band_val,
       |           row_number() OVER (PARTITION BY k, band_val ORDER BY
       |             ${Tables.portableHashSql(
                       "CAST(k AS VARCHAR) || ':' || CAST(band_val AS VARCHAR)" +
                         " || ':' || CAST(vec_id AS VARCHAR)")},
       |             vec_id) AS bcr
       |    FROM bands)),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |         FROM sb a JOIN sb b
       |           ON a.k = b.k AND a.band_val = b.band_val
       |          AND a.sub = b.sub AND a.vec_id < b.vec_id)
       |SELECT * FROM (
       |  SELECT c.vec_a, c.vec_b,
       |         ${dotSql("va.e", "vb.e")} / (va.nrm * vb.nrm) AS cos
       |  FROM cand c
       |  JOIN v va ON c.vec_a = va.vec_id
       |  JOIN v vb ON c.vec_b = vb.vec_id)
       |WHERE cos >= 0.45 ORDER BY vec_a, vec_b""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
}
