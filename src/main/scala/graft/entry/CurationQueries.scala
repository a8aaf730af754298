package graft
package entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables
import OracleCtes._

/** Query + oracle registry: training-data curation: splits, sampling, decontamination, mixtures, packing, training order.
  *
  * Split out of the former SparkEntry monolith (round 9); merged back into
  * the driver contract by [[graft.SparkEntry]]. Key sets of [[queries]] and
  * [[oracles]] stay aligned — EntryRegistrySpec enforces it.
  */
object CurationQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // training-data curation
    "q_split_assign" -> ((s, d) => Curation.splitAssign(s, d)),
    "q_stratified_sample" -> ((s, d) => Curation.stratifiedSample(s, d)),
    "q_decontaminate" -> ((s, d) => Curation.decontaminate(s, d)),
    "q_source_mixture" -> ((s, d) => Curation.sourceMixture(s, d)),
    "q_token_budget" -> ((s, d) => Curation.tokenBudget(s, d)),
    "q_curation_funnel" -> ((s, d) => Curation.curationFunnel(s, d)),
    "q_source_drift" -> ((s, d) => Corpus.sourceDrift(s, d)),
    "q_pack_bins" -> ((s, d) => Corpus.packBins(s, d)),
    "q_weighted_sample" -> ((s, d) => Curation.weightedSample(s, d)),
    "q_train_order" -> ((s, d) => Curation.trainOrder(s, d)),
    // ninth wave: easy-first curriculum phases, shard reproducibility
    // manifest
    "q_curriculum" -> ((s, d) => Curation.curriculum(s, d)),
    "q_shard_manifest" -> ((s, d) => Curation.shardManifest(s, d)),
    "q_mixture_budget" -> ((s, d) => Curation.mixtureBudget(s, d)),
    "q_pack_sequences" -> ((s, d) => Curation.packSequences(s, d)),
    "q_pack_greedy" -> ((s, d) => Curation.packGreedy(s, d)),
    "q_exemplars" -> ((s, d) => Curation.exemplars(s, d)),
    "q_dsir_select" -> ((s, d) => Curation.dsirSelect(s, d)),
    // tenth wave: batch composition of the funnel's artifact chain
    "q_shard_tokens" -> ((s, d) => Curation.shardTokens(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "q_split_assign" ->
      s"""SELECT doc_id, source, bucket,
         |       CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM (SELECT doc_id, source,
         |        ${Tables.portableHashSql("'split:' || doc_id")} % 100 AS bucket
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,
    "q_stratified_sample" ->
      s"""WITH d AS (
         |  SELECT source,
         |         CASE WHEN source = 'src0' THEN 500
         |              WHEN source = 'src1' THEN 250
         |              ELSE 100 END AS threshold_permille,
         |         ${Tables.portableHashSql("'samp:' || doc_id")} % 1000 AS h
         |  FROM documents)
         |SELECT source, CAST(threshold_permille AS BIGINT) AS threshold_permille,
         |       count(*) AS n_total,
         |       CAST(sum(CASE WHEN h < threshold_permille THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_sampled
         |FROM d GROUP BY 1, 2 ORDER BY source""".stripMargin,
    "q_decontaminate" ->
      s"""WITH $docShCtes,
         |bh AS (SELECT DISTINCT shingle FROM shc WHERE doc_id % 37 = 0),
         |cont AS (SELECT DISTINCT s.doc_id FROM shc s JOIN bh USING (shingle)
         |         WHERE s.doc_id % 37 <> 0)
         |SELECT d.doc_id,
         |       CAST(CASE WHEN d.doc_id % 37 = 0 THEN 1 ELSE 0 END AS BIGINT)
         |         AS is_benchmark,
         |       CAST(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |         AS contaminated,
         |       CAST(CASE WHEN d.doc_id % 37 <> 0 AND c.doc_id IS NULL
         |            THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM documents d LEFT JOIN cont c ON d.doc_id = c.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // Temperature-0.5 source mixture: ⌊√n⌋ weights (IEEE sqrt of exact
    // integers is correctly rounded in both engines), half-corpus budget,
    // hash-threshold sampling.
    "q_source_mixture" ->
      s"""WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
         |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
         |             CAST(sum(CAST(floor(sqrt(n_docs)) AS BIGINT)) AS BIGINT)
         |               AS w_total
         |      FROM s),
         |r AS (SELECT s.source, s.n_docs,
         |        CAST(floor(sqrt(s.n_docs)) AS BIGINT) AS weight,
         |        CAST((t.n_total // 2) * CAST(floor(sqrt(s.n_docs)) AS BIGINT)
         |             // t.w_total AS BIGINT) AS alloc,
         |        t.n_total, t.w_total
         |      FROM s CROSS JOIN t),
         |r2 AS (SELECT source, n_docs, weight, alloc,
         |         least(1000, alloc * 1000 // n_docs) AS rate_permille
         |       FROM r),
         |smp AS (SELECT d.source, count(*) AS n_sampled
         |        FROM documents d JOIN r2 ON d.source = r2.source
         |        WHERE ${Tables.portableHashSql("'mix:' || d.doc_id")} % 1000
         |              < r2.rate_permille
         |        GROUP BY 1)
         |SELECT r2.source, r2.n_docs, r2.weight, r2.alloc,
         |       CAST(r2.rate_permille AS BIGINT) AS rate_permille,
         |       coalesce(smp.n_sampled, 0) AS n_sampled
         |FROM r2 LEFT JOIN smp ON r2.source = smp.source
         |ORDER BY r2.source""".stripMargin,
    // Tokens under the learned BPE vocab (bpeCtes), not whitespace words.
    "q_token_budget" ->
      s"""WITH $bpeCtes,
         |d AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS n_tokens
         |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |            FROM documents) dwx JOIN tok USING (word)
         |      GROUP BY doc_id),
         |b AS (SELECT CAST(sum(n_tokens) * 6 // 10 AS BIGINT) AS budget FROM d),
         |c AS (SELECT doc_id, n_tokens,
         |        CAST(sum(n_tokens) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |          AS cum_tokens
         |      FROM d)
         |SELECT doc_id, n_tokens, cum_tokens FROM c CROSS JOIN b
         |WHERE cum_tokens <= budget ORDER BY doc_id""".stripMargin,
    // The four gates composed (quality → exact-dedup canon → decontaminate
    // → split), replaying each gate's individually-checked semantics.
    "q_curation_funnel" ->
      s"""WITH $docShCtes,
         |qdw AS (SELECT doc_id, length(text) AS nc, string_split(text, ' ') AS w
         |        FROM documents),
         |qtf AS (SELECT doc_id, t, count(*) AS n
         |        FROM (SELECT doc_id, unnest(w) AS t FROM qdw) GROUP BY 1, 2),
         |qtp AS (SELECT doc_id, max(n) AS top_n FROM qtf GROUP BY 1),
         |qm AS (SELECT doc_id, len(w) AS n_words, nc - len(w) + 1 AS word_chars,
         |         len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of'
         |                              OR x = 'and')) AS stopword_n
         |       FROM qdw),
         |qr AS (SELECT qm.doc_id,
         |         CASE WHEN n_words < 20 THEN 0
         |              WHEN n_words > 90 THEN 0
         |              WHEN (10 * word_chars) // n_words < 30
         |                OR (10 * word_chars) // n_words > 80 THEN 0
         |              WHEN (100 * top_n) // n_words > 15 THEN 0
         |              WHEN stopword_n = 0 THEN 0 ELSE 1 END AS keep
         |       FROM qm JOIN qtp ON qm.doc_id = qtp.doc_id),
         |d AS (SELECT doc_id, md5(text) AS cmd5 FROM documents),
         |qd AS (SELECT d.doc_id, d.cmd5 FROM d
         |       JOIN qr ON d.doc_id = qr.doc_id WHERE qr.keep = 1),
         |canon AS (SELECT min(doc_id) AS doc_id FROM qd GROUP BY cmd5),
         |bh AS (SELECT DISTINCT shingle FROM shc WHERE doc_id % 37 = 0),
         |cont AS (SELECT DISTINCT s.doc_id FROM shc s JOIN bh USING (shingle)
         |         WHERE s.doc_id % 37 <> 0),
         |flags AS (SELECT qr.keep,
         |            CASE WHEN c2.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_canon,
         |            CASE WHEN d.doc_id % 37 <> 0 AND ct.doc_id IS NULL
         |                 THEN 1 ELSE 0 END AS clean,
         |            CASE WHEN ${Tables.portableHashSql("'split:' || d.doc_id")}
         |                   % 100 < 80 THEN 1 ELSE 0 END AS train
         |          FROM d
         |          JOIN qr ON d.doc_id = qr.doc_id
         |          LEFT JOIN canon c2 ON d.doc_id = c2.doc_id
         |          LEFT JOIN cont ct ON d.doc_id = ct.doc_id)
         |SELECT count(*) AS n_total,
         |       CAST(sum(keep) AS BIGINT) AS n_quality,
         |       CAST(sum(keep * is_canon) AS BIGINT) AS n_unique,
         |       CAST(sum(keep * is_canon * clean) AS BIGINT) AS n_clean,
         |       CAST(sum(keep * is_canon * clean * train) AS BIGINT) AS n_train
         |FROM flags""".stripMargin,
    "q_source_drift" ->
      """WITH d AS (SELECT source,
        |             least(len(string_split(text, ' ')) // 8, 15) AS bucket
        |           FROM documents),
        |bs AS (SELECT source, bucket, count(*) AS c_sb FROM d GROUP BY 1, 2),
        |st AS (SELECT source, count(*) AS n_s FROM d GROUP BY 1),
        |ba AS (SELECT bucket, count(*) AS c_b FROM d GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM d),
        |grid AS (SELECT st.source, st.n_s, ba.bucket, ba.c_b, n.n
        |         FROM st CROSS JOIN ba CROSS JOIN n)
        |SELECT g.source, g.n_s AS n_docs,
        |       CAST(sum(abs(1000 * coalesce(bs.c_sb, 0) // g.n_s
        |                    - 1000 * g.c_b // g.n)) AS BIGINT)
        |         AS drift_permille
        |FROM grid g LEFT JOIN bs
        |  ON g.source = bs.source AND g.bucket = bs.bucket
        |GROUP BY g.source, g.n_s ORDER BY g.source""".stripMargin,
    "q_pack_bins" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |r AS (SELECT doc_id, n_tokens,
        |        row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
        |      FROM d),
        |b AS (SELECT (rn - 1) % 16 AS shard, count(*) AS n_docs,
        |        CAST(sum(n_tokens) AS BIGINT) AS shard_tokens
        |      FROM r GROUP BY 1),
        |t AS (SELECT CAST(sum(shard_tokens) AS BIGINT) AS total FROM b)
        |SELECT shard, n_docs, shard_tokens,
        |       16 * 1000 * shard_tokens // total AS share_permille16
        |FROM b CROSS JOIN t ORDER BY shard""".stripMargin,
    "q_weighted_sample" ->
      s"""WITH p AS (
         |  SELECT doc_id, source, n_chars,
         |         ${Tables.portableHashSql("'wsmp:' || CAST(doc_id AS VARCHAR)")}
         |           // greatest(n_chars, 1) AS priority
         |  FROM documents),
         |r AS (
         |  SELECT source, doc_id, n_chars, priority,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY priority, doc_id) AS BIGINT) AS rk
         |  FROM p)
         |SELECT source, rk, doc_id, n_chars, priority
         |FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin,
    "q_train_order" ->
      """WITH h AS (SELECT doc_id,
        |             CAST('0x' || substr(md5('order:r8:' || doc_id), 1, 15)
        |                  AS BIGINT) AS hk
        |           FROM documents),
        |r AS (SELECT doc_id, hk,
        |        row_number() OVER (ORDER BY hk, doc_id) AS pos,
        |        count(*) OVER () AS n
        |      FROM h)
        |SELECT doc_id, hk, pos, (pos - 1) * 16 // n AS shard
        |FROM r ORDER BY pos""".stripMargin,
    "q_mixture_budget" ->
      s"""WITH d AS (SELECT doc_id, source,
         |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |           FROM documents),
         |bs AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS src_tokens
         |       FROM d GROUP BY 1),
         |t AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS tok_total,
         |             CAST(sum(CAST(floor(sqrt(src_tokens)) AS BIGINT))
         |                  AS BIGINT) AS w_total
         |      FROM bs),
         |b AS (SELECT bs.source, bs.src_tokens,
         |        CAST(floor(sqrt(bs.src_tokens)) AS BIGINT) AS weight,
         |        CAST((t.tok_total // 2)
         |             * CAST(floor(sqrt(bs.src_tokens)) AS BIGINT)
         |             // t.w_total AS BIGINT) AS budget_tokens
         |      FROM bs CROSS JOIN t),
         |o AS (SELECT doc_id, source, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source
         |          ORDER BY ${Tables.portableHashSql("'mixb:' || doc_id")},
         |                   doc_id
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |      FROM d),
         |k AS (SELECT o.source, count(*) AS n_kept,
         |        CAST(sum(o.n_tokens) AS BIGINT) AS kept_tokens
         |      FROM o JOIN b ON o.source = b.source
         |      WHERE o.cum_tokens <= b.budget_tokens GROUP BY 1)
         |SELECT b.source, b.src_tokens, b.weight, b.budget_tokens,
         |       coalesce(k.n_kept, 0) AS n_kept,
         |       coalesce(k.kept_tokens, 0) AS kept_tokens
         |FROM b LEFT JOIN k ON b.source = k.source
         |ORDER BY b.source""".stripMargin,
    "q_pack_sequences" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |        CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM d)
        |SELECT doc_id, n_tokens, cum - n_tokens AS start_off,
        |       (cum - n_tokens) // 2048 AS seq_first,
        |       (cum - 1) // 2048 AS seq_last,
        |       (cum - 1) // 2048 - (cum - n_tokens) // 2048 + 1 AS n_seqs
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_pack_greedy" ->
      """WITH RECURSIVE t AS MATERIALIZED (
        |  SELECT doc_id, doc_id % 16 AS shard,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |         row_number() OVER (PARTITION BY doc_id % 16
        |                            ORDER BY doc_id) AS rn
        |  FROM documents),
        |r AS (
        |  SELECT shard, rn, doc_id, n_tokens,
        |         CAST(0 AS BIGINT) AS bin_id, n_tokens AS fill
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.shard, t.rn, t.doc_id, t.n_tokens,
        |         CASE WHEN r.fill + t.n_tokens <= 2048 THEN r.bin_id
        |              ELSE r.bin_id + 1 END,
        |         CASE WHEN r.fill + t.n_tokens <= 2048
        |              THEN r.fill + t.n_tokens ELSE t.n_tokens END
        |  FROM r JOIN t ON t.shard = r.shard AND t.rn = r.rn + 1)
        |SELECT doc_id, shard, bin_id FROM r ORDER BY doc_id""".stripMargin,
    "q_exemplars" ->
      s"""SELECT source, rk, doc_id, n_chars FROM (
         |  SELECT source, doc_id, n_chars,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY ${Tables.portableHashSql("'ex:' || doc_id")} % 10000,
         |                    doc_id) AS BIGINT) AS rk
         |  FROM documents)
         |WHERE rk <= 3 ORDER BY source, rk""".stripMargin,
    // Replays the hashed-unigram DSIR scoring: 256 portable-hash buckets,
    // add-one-smoothed target(en)/raw permille ratios, per-doc integer
    // mean ratio, top-100 by (score DESC, doc_id).
    "q_dsir_select" ->
      s"""WITH tb AS (SELECT doc_id, lang,
         |              ${Tables.portableHashSql("w")} % ${Curation.DsirB} AS b
         |            FROM (SELECT doc_id, lang,
         |                    unnest(string_split(text, ' ')) AS w
         |                  FROM documents)),
         |bc AS (SELECT b, CAST(count(*) AS BIGINT) AS cnt_r,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
         |           AS BIGINT) AS cnt_t
         |       FROM tb GROUP BY 1),
         |tot AS (SELECT CAST(sum(cnt_r) AS BIGINT) AS tot_r,
         |               CAST(sum(cnt_t) AS BIGINT) AS tot_t FROM bc),
         |wts AS (SELECT b,
         |          CAST((cnt_t + 1) * (tot_r + ${Curation.DsirB}) * 1000 //
         |               ((cnt_r + 1) * (tot_t + ${Curation.DsirB}))
         |            AS BIGINT) AS w_pm
         |        FROM bc, tot),
         |ds AS (SELECT tb.doc_id, tb.lang,
         |         CAST(count(*) AS BIGINT) AS n_toks,
         |         CAST(sum(w_pm) AS BIGINT) AS sw
         |       FROM tb JOIN wts ON tb.b = wts.b GROUP BY 1, 2)
         |SELECT doc_id, lang, n_toks,
         |       CAST(sw // n_toks AS BIGINT) AS score_pm
         |FROM ds ORDER BY score_pm DESC, doc_id LIMIT 100""".stripMargin,
    // Replays the curriculum cut: lexical-diversity permille, global rank
    // (dp, doc_id), equal-rank quartile phases, per-phase summary.
    "q_curriculum" ->
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w
         |           FROM documents),
         |m AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
         |        CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
         |      FROM d),
         |r AS (SELECT doc_id, n_words,
         |        n_distinct * 1000 // n_words AS dp,
         |        row_number() OVER (ORDER BY n_distinct * 1000 // n_words,
         |                           doc_id) AS rn,
         |        count(*) OVER () AS n
         |      FROM m)
         |SELECT CAST((rn - 1) * ${operators.Curation.CurrPhases} // n
         |            AS BIGINT) AS phase,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_words) AS BIGINT) AS sum_tokens,
         |       CAST(min(dp) AS BIGINT) AS min_dp,
         |       CAST(max(dp) AS BIGINT) AS max_dp
         |FROM r GROUP BY 1 ORDER BY phase""".stripMargin,
    // Replays the per-shard manifest over the train-order permutation:
    // bounded mod-1000003 content checksums, contiguity via pos range.
    "q_shard_manifest" ->
      s"""WITH h AS (SELECT doc_id,
         |             CAST('0x' || substr(md5('order:r8:' || doc_id), 1, 15)
         |                  AS BIGINT) AS hk
         |           FROM documents),
         |r AS (SELECT doc_id, hk,
         |        row_number() OVER (ORDER BY hk, doc_id) AS pos,
         |        count(*) OVER () AS n
         |      FROM h),
         |o AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |        (pos - 1) * 16 // n AS shard FROM r),
         |d AS (SELECT doc_id,
         |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |        ${Tables.portableHashSql("text")} % 1000003 AS thm
         |      FROM documents)
         |SELECT CAST(shard AS BIGINT) AS shard,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_words) AS BIGINT) AS sum_tokens,
         |       CAST(sum(thm) % 1000003 AS BIGINT) AS checksum,
         |       CAST(min(pos) AS BIGINT) AS min_pos,
         |       CAST(max(pos) AS BIGINT) AS max_pos
         |FROM o JOIN d USING (doc_id)
         |GROUP BY shard ORDER BY shard""".stripMargin,
    // Replays the funnel's batch artifact chain: PII planting + 4-family
    // scrub (as q_pii_scrub), per-word merge replay from bpeCtes' t1..t8
    // winners (the same fold bpeTokenCountExpr ships), portable-hash
    // shard routing — then 16-key aggregation.
    "q_shard_tokens" -> {
      val scrubChain = Scrub.Families.foldLeft("dirty") {
        case (c, (_, re, tok)) => s"regexp_replace($c, '$re', '$tok', 'g')"
      }
      val mergeChain = (1 to TextAnalysis.BpeMergeRounds).foldLeft(
        "regexp_replace(word, '(.)', '<\\1>', 'g')") { (acc, k) =>
        s"replace($acc, t$k.pat, t$k.rep)"
      }
      val tList = (1 to TextAnalysis.BpeMergeRounds)
        .map(k => s"t$k").mkString(", ")
      s"""WITH $bpeCtes,
         |dirty0 AS (
         |  SELECT doc_id,
         |    text ||
         |    CASE WHEN doc_id % 3 = 0 THEN ' reach user' ||
         |      CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
         |    CASE WHEN doc_id % 5 = 0 THEN ' call 800-555-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
         |    CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' ||
         |      CAST(doc_id % 256 AS VARCHAR) || '.' ||
         |      CAST(doc_id % 250 + 1 AS VARCHAR) ELSE '' END ||
         |    CASE WHEN doc_id % 11 = 0 THEN ' token sk-' ||
         |      substr(md5('key:' || CAST(doc_id AS VARCHAR)), 1, 16)
         |      ELSE '' END AS dirty
         |  FROM documents),
         |scr AS (SELECT doc_id, $scrubChain AS text FROM dirty0),
         |wds AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM scr),
         |encw AS (SELECT doc_id,
         |           CAST(len(regexp_extract_all($mergeChain,
         |             '<([a-z0-9]+)>', 1)) AS BIGINT) AS wt
         |         FROM wds, $tList),
         |ntd AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS nt
         |        FROM encw GROUP BY 1),
         |shx AS (SELECT doc_id, nt,
         |          ${Tables.portableHashSql(
                      "'order:r8:' || CAST(doc_id AS VARCHAR)")} % 16 AS shard
         |        FROM ntd)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(nt) AS BIGINT) AS n_tokens,
         |       CAST(sum(nt) // count(*) AS BIGINT) AS tokens_per_doc
         |FROM shx GROUP BY 1 ORDER BY 1""".stripMargin
    },
  )
}
