package graft
package entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables
import OracleCtes._

/** Query + oracle registry: text analysis: language-ID, quality, tokens, BPE, chunking, fingerprints, PII scrub.
  *
  * Split out of the former SparkEntry monolith (round 9); merged back into
  * the driver contract by [[graft.SparkEntry]]. Key sets of [[queries]] and
  * [[oracles]] stay aligned — EntryRegistrySpec enforces it.
  */
object TextQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // text analysis
    "text_stats" -> ((s, d) => TextAnalysis.textStats(s, d)),
    "lang_id" -> ((s, d) => TextAnalysis.langId(s, d)),
    "token_count" -> ((s, d) => TextAnalysis.tokenCount(s, d)),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.docFingerprint(s, d)),
    "q_quality_filter" -> ((s, d) => TextAnalysis.qualityFilter(s, d)),
    "q_zipf_terms" -> ((s, d) => TextAnalysis.zipfTerms(s, d)),
    "q_top_ngrams" -> ((s, d) => Analytics.topNgrams(s, d)),
    "q_bigram_pmi" -> ((s, d) => TextAnalysis.bigramPmi(s, d)),
    "q_heavy_hitters" -> ((s, d) => Relational.qHeavyHitters(s, d)),
    "q_tfidf_top_term" -> ((s, d) => Analytics.tfidfTopTerm(s, d)),
    "q_edit_distance" -> ((s, d) => Analytics.editDistance(s, d)),
    "q_doc_fluency" -> ((s, d) => TextAnalysis.docFluency(s, d)),
    "q_lang_confusion" -> ((s, d) => TextAnalysis.langConfusion(s, d)),
    "q_len_percentiles" -> ((s, d) => TextAnalysis.lengthPercentiles(s, d)),
    "q_chunk_docs" -> ((s, d) => TextAnalysis.chunkDocs(s, d)),
    "q_bpe_pairs" -> ((s, d) => TextAnalysis.bpePairs(s, d)),
    "q_bpe_encode" -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
    "q_pii_scrub" -> ((s, d) => Scrub.piiScrub(s, d)),
    "q_cms_hitters" -> ((s, d) => TextAnalysis.cmsHitters(s, d)),
    // ninth wave: BM25 keyword retrieval, per-language tokenizer fertility,
    // fluency-vs-rules calibration, dataset card
    "q_bm25" -> ((s, d) => Analytics.bm25Search(s, d)),
    "q_bpe_fertility" -> ((s, d) => TextAnalysis.bpeFertility(s, d)),
    "q_quality_calib" -> ((s, d) => TextAnalysis.qualityCalib(s, d)),
    "q_dataset_card" -> ((s, d) => Corpus.datasetCard(s, d)),
    "q_chunk_embed" -> ((s, d) => TextAnalysis.chunkEmbedIndex(s, d)),
    // tenth wave: the learned merge table as a driver-checked artifact
    "q_bpe_merges" -> ((s, d) => TextAnalysis.bpeMerges(s, d)),
  )

  /** Shared quality-rule CTE chain ending at `qrule (doc_id, n_words,
    * mwl10, top_pct, stopword_n, fail_reason)` — replays
    * [[graft.operators.TextAnalysis.qualityFilter]]; consumed by
    * `q_quality_filter`, `q_quality_calib`, and `q_dataset_card`.
    */
  private lazy val qualRuleCtes: String =
    """qdw AS (SELECT doc_id, length(text) AS nc, string_split(text, ' ') AS w
      |        FROM documents),
      |qtf AS (SELECT doc_id, t, count(*) AS n
      |        FROM (SELECT doc_id, unnest(w) AS t FROM qdw) GROUP BY 1, 2),
      |qtp AS (SELECT doc_id, max(n) AS top_n FROM qtf GROUP BY 1),
      |qm AS (SELECT doc_id, len(w) AS n_words, nc - len(w) + 1 AS word_chars,
      |              len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of'
      |                                   OR x = 'and')) AS stopword_n
      |       FROM qdw),
      |qj AS (SELECT qm.doc_id, CAST(n_words AS BIGINT) AS n_words,
      |              CAST((10 * word_chars) // n_words AS BIGINT) AS mwl10,
      |              CAST((100 * top_n) // n_words AS BIGINT) AS top_pct,
      |              CAST(stopword_n AS BIGINT) AS stopword_n
      |       FROM qm JOIN qtp USING (doc_id)),
      |qrule AS (SELECT *, CASE WHEN n_words < 20 THEN 'too_short'
      |                        WHEN n_words > 90 THEN 'too_long'
      |                        WHEN mwl10 < 30 OR mwl10 > 80 THEN 'word_len'
      |                        WHEN top_pct > 15 THEN 'repetition'
      |                        WHEN stopword_n = 0 THEN 'no_stopword'
      |                        ELSE 'ok' END AS fail_reason
      |         FROM qj)""".stripMargin

  /** Shared corpus-LM fluency CTE chain ending at `flu (doc_id, n_bigrams,
    * sum_score, mean_score)` — replays
    * [[graft.operators.TextAnalysis.docFluency]]; consumed by
    * `q_doc_fluency` and `q_quality_calib`.
    */
  private lazy val fluencyCtes: String =
    """fdw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |fdb AS (SELECT doc_id, w[i] AS a, w[i + 1] AS b
      |        FROM fdw, unnest(generate_series(1, len(w) - 1)) AS t(i)
      |        WHERE len(w) >= 2),
      |fbg AS (SELECT a, b, count(*) AS n_ab FROM fdb GROUP BY 1, 2),
      |fuc AS (SELECT t, count(*) AS n
      |        FROM (SELECT unnest(w) AS t FROM fdw) GROUP BY 1),
      |ftot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM fuc),
      |fsc AS (SELECT fdb.doc_id,
      |          CAST(fbg.n_ab * ftot.n_total * 100
      |               // (ua.n * ub.n) AS BIGINT) AS s
      |        FROM fdb JOIN fbg ON fdb.a = fbg.a AND fdb.b = fbg.b
      |             JOIN fuc ua ON fdb.a = ua.t
      |             JOIN fuc ub ON fdb.b = ub.t
      |             CROSS JOIN ftot),
      |flu AS (SELECT doc_id, count(*) AS n_bigrams,
      |          CAST(sum(s) AS BIGINT) AS sum_score,
      |          CAST(sum(s) // count(*) AS BIGINT) AS mean_score
      |        FROM fsc GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_stats" ->
      """WITH dw AS (SELECT doc_id, n_chars, length(text) AS n_chars_calc,
        |                   string_split(text, ' ') AS w
        |            FROM documents)
        |SELECT doc_id, n_chars, CAST(n_chars_calc AS BIGINT) AS n_chars_calc,
        |       CAST(len(w) AS BIGINT) AS n_words,
        |       CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words,
        |       CAST(list_reduce(list_transform(w, x -> length(x)),
        |                        (a, b) -> greatest(a, b)) AS BIGINT) AS max_word_len,
        |       CAST(len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of'
        |                                 OR x = 'and')) AS BIGINT) AS stopword_n,
        |       CAST((100 * len(list_distinct(w))) // len(w) AS BIGINT) AS quality_pct
        |FROM dw ORDER BY doc_id""".stripMargin,
    "lang_id" ->
      s"""WITH $langIdCtes
         |SELECT doc_id, lang, pred_lang,
         |       CAST(pred_lang = lang AS BIGINT) AS is_match
         |FROM pr ORDER BY doc_id""".stripMargin,
    "token_count" ->
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens,
        |       CAST(length(text) AS BIGINT) AS n_chars,
        |       CAST(length(text) // greatest(len(regexp_extract_all(text, '[a-z0-9]+')), 1)
        |            AS BIGINT) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      s"""WITH $docShCtes, $simhashCtes,
         |grams AS (SELECT doc_id, unnest(
         |            CASE WHEN len(w) >= 5 THEN
         |              list_transform(generate_series(1, len(w) - 4),
         |                             i -> array_to_string(w[i:i+4], ' '))
         |            ELSE [array_to_string(w, ' ')] END) AS g
         |          FROM dw),
         |ming AS (SELECT doc_id,
         |           min(CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)) AS min_gram_hash
         |         FROM grams GROUP BY 1),
         |pre AS (SELECT doc_id,
         |          CAST('0x' || substr(md5(array_to_string(w[1:8], ' ')), 1, 15) AS BIGINT)
         |            AS prefix_hash
         |        FROM dw)
         |SELECT m.doc_id, min_gram_hash, simhash, prefix_hash
         |FROM ming m JOIN sim USING (doc_id) JOIN pre USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q_quality_filter" ->
      s"""WITH $qualRuleCtes
         |SELECT doc_id, n_words, mwl10, top_pct, stopword_n, fail_reason,
         |       CAST(fail_reason = 'ok' AS BIGINT) AS keep
         |FROM qrule ORDER BY doc_id""".stripMargin,
    "q_zipf_terms" ->
      """WITH f AS (SELECT t AS term, count(*) AS freq
        |           FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |           GROUP BY 1),
        |r AS (SELECT term, freq,
        |        CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank
        |      FROM f)
        |SELECT rank, term, freq, rank * freq AS rank_x_freq
        |FROM r WHERE rank <= 30 ORDER BY rank""".stripMargin,
    "q_top_ngrams" ->
      s"""WITH $docShCtes
         |SELECT shingle, count(*) AS df FROM sh
         |GROUP BY 1 ORDER BY df DESC, shingle LIMIT 20""".stripMargin,
    "q_bigram_pmi" ->
      """WITH dw AS (SELECT string_split(text, ' ') AS w FROM documents),
        |bi AS (SELECT w[i] AS a, w[i + 1] AS b
        |       FROM dw CROSS JOIN LATERAL
        |         (SELECT unnest(generate_series(1, len(w) - 1)) AS i) gs),
        |bc AS (SELECT a, b, count(*) AS n_ab FROM bi GROUP BY 1, 2),
        |uni AS (SELECT t, count(*) AS n
        |        FROM (SELECT unnest(w) AS t FROM dw) GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM uni)
        |SELECT a || ' ' || b AS bigram, n_ab, ua.n AS n_a, ub.n AS n_b,
        |       CAST(n_ab * (SELECT n_total FROM tot) * 100
        |            // (ua.n * ub.n) AS BIGINT) AS score
        |FROM bc JOIN uni ua ON bc.a = ua.t JOIN uni ub ON bc.b = ub.t
        |ORDER BY score DESC, bigram LIMIT 20""".stripMargin,
    "q_heavy_hitters" ->
      """WITH u AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS total,
        |             count(*) AS n_users FROM u)
        |SELECT user_id, n_events,
        |       CAST(n_events * 1000 // (SELECT total FROM t) AS BIGINT)
        |         AS permille
        |FROM u
        |WHERE n_events * (SELECT n_users FROM t) * 10 > (SELECT total FROM t) * 12
        |ORDER BY user_id""".stripMargin,
    "q_tfidf_top_term" ->
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |               FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |s AS (SELECT doc_id, term, tf, df, tf * 1000000 // df AS score,
        |             row_number() OVER (PARTITION BY doc_id
        |                ORDER BY tf * 1000000 // df DESC, term) AS rk
        |      FROM tf JOIN df USING (term))
        |SELECT doc_id, term, tf, df, score FROM s WHERE rk = 1
        |ORDER BY doc_id""".stripMargin,
    "q_edit_distance" ->
      """SELECT doc_id,
        |       CAST(levenshtein(substr(text, 1, 32),
        |                        'the quick brown fox jumps over') AS BIGINT)
        |         AS edit_dist
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Mean integer bigram-PMI per doc — the corpus-grounded fluency gate.
    "q_doc_fluency" ->
      s"""WITH $fluencyCtes
         |SELECT doc_id, n_bigrams, sum_score, mean_score
         |FROM flu ORDER BY doc_id""".stripMargin,
    // Replays the fluency-vs-rules calibration: inner join on fluency
    // coverage, global rank by (mean_score, doc_id), equal-rank deciles.
    "q_quality_calib" ->
      s"""WITH $fluencyCtes,
         |$qualRuleCtes,
         |rk AS (SELECT flu.doc_id, mean_score,
         |         CAST(fail_reason = 'ok' AS BIGINT) AS keep,
         |         row_number() OVER (ORDER BY mean_score, flu.doc_id) AS rn,
         |         count(*) OVER () AS n
         |       FROM flu JOIN qrule USING (doc_id))
         |SELECT CAST((rn - 1) * 10 // n AS BIGINT) AS decile,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(keep) AS BIGINT) AS n_keep,
         |       CAST(sum(keep) * 1000 // count(*) AS BIGINT)
         |         AS keep_permille,
         |       CAST(min(mean_score) AS BIGINT) AS min_score,
         |       CAST(max(mean_score) AS BIGINT) AS max_score
         |FROM rk GROUP BY 1 ORDER BY decile""".stripMargin,
    // Replays the dataset card: md5 exact-dup groups, quality keeps,
    // per-source token shares and language coverage.
    "q_dataset_card" ->
      s"""WITH $qualRuleCtes,
         |cd AS (SELECT doc_id, source, lang,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |         md5(text) AS cmd5
         |       FROM documents),
         |dup AS (SELECT cmd5, CAST(1 AS BIGINT) AS is_dup
         |        FROM cd GROUP BY cmd5 HAVING count(*) >= 2),
         |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |          CAST(sum(cd.n_words) AS BIGINT) AS n_tokens,
         |          CAST(sum(CASE WHEN fail_reason = 'ok' THEN 1 ELSE 0 END)
         |               AS BIGINT) AS n_keep,
         |          CAST(sum(coalesce(is_dup, 0)) AS BIGINT) AS n_dup_member,
         |          CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |        FROM cd LEFT JOIN dup USING (cmd5)
         |        JOIN qrule USING (doc_id)
         |        GROUP BY source),
         |tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot FROM per)
         |SELECT source, n_docs, n_tokens,
         |       CAST(n_tokens * 1000 // tot AS BIGINT)
         |         AS token_share_permille,
         |       CAST(n_keep * 1000 // n_docs AS BIGINT)
         |         AS quality_keep_permille,
         |       CAST(n_dup_member * 1000 // n_docs AS BIGINT)
         |         AS dup_member_permille,
         |       n_langs
         |FROM per CROSS JOIN tt ORDER BY source""".stripMargin,
    // Replays the feature-hash chunk embedding + IVF assignment: signed
    // token hashing into 64 buckets (exact int sums), hash-min centroid
    // sample, sparse integer dots, cosine argmax with (cent_id) tie-break.
    "q_chunk_embed" ->
      s"""WITH dw AS (SELECT doc_id, string_split(text, ' ') AS w
         |            FROM documents),
         |st AS (SELECT doc_id, w,
         |          unnest(generate_series(1, greatest(len(w) - 10, 1), 30))
         |            AS s
         |       FROM dw),
         |ck AS (SELECT doc_id, CAST((s - 1) // 30 AS BIGINT) AS chunk_idx,
         |          doc_id * ${TextAnalysis.ChunkIdSpan}
         |            + CAST((s - 1) // 30 AS BIGINT) AS cid,
         |          w[s : s + 39] AS cw
         |       FROM st),
         |tk AS (SELECT cid, unnest(cw) AS w FROM ck),
         |ft AS (SELECT cid,
         |          ${Tables.portableHashSql("'fh:' || w")} % ${TextAnalysis.FhDims}
         |            AS b,
         |          CAST(sum(CASE WHEN ${Tables.portableHashSql("'fs:' || w")}
         |                          % 2 = 1
         |                        THEN 1 ELSE -1 END) AS BIGINT) AS v
         |       FROM tk GROUP BY 1, 2),
         |n2 AS (SELECT cid, CAST(sum(v * v) AS BIGINT) AS n2
         |       FROM ft GROUP BY 1),
         |cents AS (SELECT cid AS cent_id FROM (SELECT DISTINCT cid FROM ft)
         |          ORDER BY ${Tables.portableHashSql("CAST(cid AS VARCHAR)")},
         |            cid
         |          LIMIT ${TextAnalysis.FhCentroids}),
         |cf AS (SELECT cent_id, b, v AS cv
         |       FROM ft JOIN cents ON ft.cid = cents.cent_id),
         |dots AS (SELECT f.cid, c.cent_id,
         |           CAST(sum(f.v * c.cv) AS BIGINT) AS dot
         |         FROM ft f JOIN cf c USING (b) GROUP BY 1, 2),
         |asg AS (SELECT cid, cent_id, dot, n2q FROM (
         |          SELECT d.cid, d.cent_id, d.dot, q.n2 AS n2q,
         |                 row_number() OVER (PARTITION BY d.cid ORDER BY
         |                   d.dot / (sqrt(q.n2) * sqrt(c.n2)) DESC,
         |                   d.cent_id) AS rk
         |          FROM dots d JOIN n2 q ON d.cid = q.cid
         |          JOIN n2 c ON d.cent_id = c.cid) WHERE rk = 1)
         |SELECT ck.doc_id, ck.chunk_idx, asg.cid, asg.cent_id, asg.dot,
         |       asg.n2q
         |FROM asg JOIN ck ON asg.cid = ck.cid
         |ORDER BY asg.cid""".stripMargin,
    // Per-class confusion matrix of the lang-id heuristic (replays the
    // same marker-vote CTEs) with permille class shares.
    "q_lang_confusion" ->
      s"""WITH $langIdCtes,
         |cm AS (SELECT lang, pred_lang, count(*) AS n FROM pr GROUP BY 1, 2),
         |tot AS (SELECT lang, count(*) AS n_lang FROM pr GROUP BY 1)
         |SELECT cm.lang, cm.pred_lang, cm.n,
         |       CAST(cm.n * 1000 // tot.n_lang AS BIGINT) AS share_permille
         |FROM cm JOIN tot ON cm.lang = tot.lang
         |ORDER BY cm.lang, cm.pred_lang""".stripMargin,
    "q_len_percentiles" ->
      """WITH d AS (SELECT source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |           FROM documents),
        |c AS (SELECT source, count(*) AS n FROM d GROUP BY 1),
        |r AS (SELECT source, n_words,
        |        row_number() OVER (PARTITION BY source ORDER BY n_words) AS rn
        |      FROM d)
        |SELECT r.source, CAST(min(c.n) AS BIGINT) AS n_docs,
        |       CAST(min(CASE WHEN rn = (n + 1) // 2 THEN n_words END) AS BIGINT)
        |         AS p50_words,
        |       CAST(min(CASE WHEN rn = (9 * n + 9) // 10 THEN n_words END)
        |            AS BIGINT) AS p90_words,
        |       CAST(sum(n_words) AS BIGINT) AS total_words
        |FROM r JOIN c ON r.source = c.source
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_chunk_docs" ->
      s"""WITH dw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |st AS (SELECT doc_id, w,
         |              unnest(generate_series(1, greatest(len(w) - 10, 1), 30)) AS s
         |       FROM dw)
         |SELECT doc_id, CAST((s - 1) // 30 AS BIGINT) AS chunk_idx,
         |       CAST(s AS BIGINT) AS start_word,
         |       CAST(len(w[s : s + 39]) AS BIGINT) AS n_words,
         |       ${Tables.portableHashSql("array_to_string(w[s : s + 39], ' ')")}
         |         AS chunk_hash
         |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_bpe_pairs" ->
      """WITH wrd AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |pr AS (SELECT unnest(list_transform(generate_series(1, length(word) - 1),
        |                                    i -> substr(word, i, 2))) AS pair
        |       FROM wrd WHERE length(word) >= 2)
        |SELECT pair, count(*) AS n_pairs FROM pr
        |GROUP BY 1 ORDER BY n_pairs DESC, pair LIMIT 30""".stripMargin,
    "q_bpe_encode" ->
      s"""WITH $bpeCtes,
         |dwx AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(wl) AS BIGINT) AS n_char_tokens,
         |       CAST(sum(wt) AS BIGINT) AS n_bpe_tokens
         |FROM dwx JOIN tok USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The merge table IS the oracle's per-round argmax chain: bpeCtes
    // already derives t1..t8 (winning pat/rep per round); the query just
    // reads them out in order.
    "q_bpe_merges" ->
      s"""WITH $bpeCtes
         |SELECT * FROM (
         |  ${(1 to TextAnalysis.BpeMergeRounds).map(k =>
              s"SELECT CAST($k AS BIGINT) AS ord, pat, rep FROM t$k")
              .mkString("\n|  UNION ALL ")}
         |) ORDER BY ord""".stripMargin,
    // Replays the deterministic PII planting (doc_id mod 3/5/7/11 spans)
    // and the four-family regex scrub; n_residual re-scans the CLEAN text.
    "q_pii_scrub" -> {
      val clean = Scrub.Families.foldLeft("dirty") { case (c, (_, re, tok)) =>
        s"regexp_replace($c, '$re', '$tok', 'g')"
      }
      def cnt(src: String, re: String) =
        s"CAST(len(regexp_extract_all($src, '$re')) AS BIGINT)"
      def chars(re: String) =
        s"""CAST(coalesce(list_sum(list_transform(
           |  regexp_extract_all(dirty, '$re'), x -> len(x))), 0) AS BIGINT)"""
          .stripMargin
      val famCols = Scrub.Families.map { case (name, re, _) =>
        s"${cnt("dirty", re)} AS c_$name" }.mkString(",\n|    ")
      val charSum = Scrub.Families.map { case (_, re, _) => chars(re) }
        .mkString(" + ")
      val residSum = Scrub.Families.map { case (_, re, _) => cnt(clean, re) }
        .mkString(" + ")
      s"""WITH dirty0 AS (
         |  SELECT doc_id, source,
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
         |m AS (
         |  SELECT source,
         |    $famCols,
         |    $charSum AS c_chars,
         |    $residSum AS c_residual
         |  FROM dirty0)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(c_emails) AS BIGINT) AS n_emails,
         |       CAST(sum(c_phones) AS BIGINT) AS n_phones,
         |       CAST(sum(c_ips) AS BIGINT) AS n_ips,
         |       CAST(sum(c_keys) AS BIGINT) AS n_keys,
         |       CAST(sum(c_chars) AS BIGINT) AS chars_removed,
         |       CAST(sum(c_residual) AS BIGINT) AS n_residual
         |FROM m GROUP BY source ORDER BY source""".stripMargin
    },
    // Replays the 4×256 count-min build (salted portable hashes) and the
    // min-over-rows estimates for the exact top-20 tokens.
    "q_cms_hitters" ->
      s"""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS w
         |            FROM documents),
         |rs AS (SELECT unnest(generate_series(0, ${TextAnalysis.CmsD - 1}))
         |         AS r),
         |tb AS (SELECT rs.r,
         |         ${Tables.portableHashSql("'cms' || rs.r || ':' || tk.w")}
         |           % ${TextAnalysis.CmsW} AS b
         |       FROM tk CROSS JOIN rs),
         |sk AS (SELECT r, b, CAST(count(*) AS BIGINT) AS c
         |       FROM tb GROUP BY 1, 2),
         |top AS (SELECT w, CAST(count(*) AS BIGINT) AS n_exact
         |        FROM tk GROUP BY 1 ORDER BY n_exact DESC, w LIMIT 20),
         |est AS (SELECT t.w, t.n_exact, min(sk.c) AS n_est
         |        FROM top t CROSS JOIN rs
         |        JOIN sk ON sk.r = rs.r
         |          AND sk.b = ${Tables.portableHashSql(
                       "'cms' || rs.r || ':' || t.w")} % ${TextAnalysis.CmsW}
         |        GROUP BY 1, 2)
         |SELECT w, n_exact, CAST(n_est AS BIGINT) AS n_est,
         |       CAST((n_est - n_exact) * 1000 // n_exact AS BIGINT)
         |         AS over_permille
         |FROM est ORDER BY n_exact DESC, w""".stripMargin,
    // Replays the BM25 scoring pipeline: tf/df/dl stats, df-rank-11..15
    // query terms, the rational-idf x saturated-tf product in the same
    // IEEE double op order as the Spark side (e0 literals force DOUBLE,
    // not DECIMAL), floor-scaled to milli-units and int64-summed.
    "q_bm25" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |           FROM documents),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM w GROUP BY 1, 2),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM w GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
        |               CAST(sum(dl) AS BIGINT) AS tot FROM dl),
        |qt AS (SELECT term, df FROM (
        |         SELECT term, df,
        |                row_number() OVER (ORDER BY df DESC, term) AS r
        |         FROM df) WHERE r BETWEEN 11 AND 15),
        |sc AS (SELECT tf.doc_id,
        |         CAST(floor((((nd - qt.df) + 0.5e0) / (qt.df + 0.5e0)) *
        |           ((tf.tf * 2.2e0) /
        |             (tf.tf + 1.2e0 * (0.25e0 +
        |               0.75e0 * ((dl.dl * nd) / tot)))) *
        |           1000.0e0) AS BIGINT) AS s
        |       FROM tf JOIN qt USING (term) JOIN dl USING (doc_id)
        |       CROSS JOIN tot),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
        |               CAST(sum(s) AS BIGINT) AS score_milli
        |        FROM sc GROUP BY 1)
        |SELECT * FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY score_milli DESC, doc_id)
        |              AS BIGINT) AS rk,
        |         doc_id, n_hit_terms, score_milli
        |  FROM agg) WHERE rk <= 10 ORDER BY rk""".stripMargin,
    // Replays per-language fertility over the learned BPE vocab: the
    // q_bpe_encode per-doc relation joined to lang, aggregated per slice.
    "q_bpe_fertility" ->
      s"""WITH $bpeCtes,
         |dwx AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents),
         |enc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |          CAST(sum(wl) AS BIGINT) AS n_char_tokens,
         |          CAST(sum(wt) AS BIGINT) AS n_bpe_tokens
         |        FROM dwx JOIN tok USING (word) GROUP BY doc_id)
         |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_words) AS BIGINT) AS sum_words,
         |       CAST(sum(n_bpe_tokens) AS BIGINT) AS sum_bpe,
         |       CAST(sum(n_char_tokens) AS BIGINT) AS sum_chars,
         |       CAST(sum(n_bpe_tokens) * 1000 // sum(n_words) AS BIGINT)
         |         AS fertility_permille,
         |       CAST(sum(n_char_tokens) * 1000 // sum(n_bpe_tokens)
         |            AS BIGINT) AS chars_per_token_milli
         |FROM enc JOIN documents d USING (doc_id)
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
  )
}
