package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a batch DataFrame query over the parquet
  * tables in `sfDir`; [[oracleSql]] holds the equivalent DuckDB SQL run by
  * the driver over the same tables. Column names and row order are aligned
  * between the two by construction (explicit aliases + total ORDER BY), and
  * every expression is engine-portable (integer money, md5-based hashing,
  * left-fold float reductions — see Tables.scala).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ChainLink.chainLink(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7 step 5). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // relational staples
    "q1_pricing" -> ((s, d) => Relational.q1Pricing(s, d)),
    "q3_top_orders" -> ((s, d) => Relational.q3TopOrders(s, d)),
    "q5_nation_revenue" -> ((s, d) => Relational.q5NationRevenue(s, d)),
    "q_semi_high_qty" -> ((s, d) => Relational.qSemiHighQty(s, d)),
    "q_anti_no_orders" -> ((s, d) => Relational.qAntiNoOrders(s, d)),
    "q_window_top3" -> ((s, d) => Relational.qWindowTop3(s, d)),
    "q_events_tumbling" -> ((s, d) => Relational.qEventsTumbling(s, d)),
    "q_distinct_users" -> ((s, d) => Relational.qDistinctUsers(s, d)),
    "q_rollup_revenue" -> ((s, d) => Relational.qRollupRevenue(s, d)),
    "q_lag_events" -> ((s, d) => Relational.qLagEvents(s, d)),
    // training-data pipeline: dedup
    "dedup_exact" -> ((s, d) => Dedup.dedupExact(s, d)),
    "dedup_ngram" -> ((s, d) => Dedup.dedupNgram(s, d)),
    "q_incremental_dedup" -> ((s, d) => Dedup.incrementalDedup(s, d)),
    "dedup_minhash" -> ((s, d) => Dedup.dedupMinhash(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.dedupSimhash(s, d)),
    "dedup_embedding" -> ((s, d) => Dedup.dedupEmbedding(s, d)),
    "q_ann_recall" -> ((s, d) => Dedup.annRecall(s, d)),
    "q_ann_recall_kmeans" -> ((s, d) => Dedup.annRecallKmeans(s, d)),
    // similarity search
    "ann_topk" -> ((s, d) => Similarity.annTopk(s, d)),
    "ann_ivf" -> ((s, d) => Similarity.annIvf(s, d)),
    "ann_ivf_kmeans" -> ((s, d) => Similarity.annIvfKmeans(s, d)),
    "q_pq_search" -> ((s, d) => Similarity.pqSearch(s, d)),
    // text analysis
    "text_stats" -> ((s, d) => TextAnalysis.textStats(s, d)),
    "lang_id" -> ((s, d) => TextAnalysis.langId(s, d)),
    "token_count" -> ((s, d) => TextAnalysis.tokenCount(s, d)),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.docFingerprint(s, d)),
    "q_quality_filter" -> ((s, d) => TextAnalysis.qualityFilter(s, d)),
    "q_zipf_terms" -> ((s, d) => TextAnalysis.zipfTerms(s, d)),
    "q_bigram_pmi" -> ((s, d) => TextAnalysis.bigramPmi(s, d)),
    "q_heavy_hitters" -> ((s, d) => Relational.qHeavyHitters(s, d)),
    "q_vector_quantize" -> ((s, d) => Similarity.vectorQuantize(s, d)),
    "q_percent_rank" -> ((s, d) => Relational.qPercentRank(s, d)),
    // multimodal (frame_hashes array → CSV string for the driver compare;
    // Multimodal.mediaMeta keeps the typed ArrayType column)
    "media_meta" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Multimodal.mediaMeta(s, d)
        .withColumn("frame_hashes",
          concat_ws(",", transform(col("frame_hashes"), _.cast("string"))))
    }),
    "media_frames" -> ((s, d) => Multimodal.mediaFrames(s, d)),
    "media_dedup" -> ((s, d) => Multimodal.mediaDedup(s, d)),
    "media_type_stats" -> ((s, d) => Multimodal.mediaTypeStats(s, d)),
    // SQL personality
    "q_sql_segment_revenue" -> ((s, d) => SqlApi.revenueBySegment(s, d)),
    "q_sql_cosine_by_label" -> ((s, d) => SqlApi.sqlCosineByLabel(s, d)),
    "q_sql_small_qty" -> ((s, d) => SqlApi.smallQtyParts(s, d)),
    "q_sql_grouping_sets" -> ((s, d) => SqlApi.groupingSetsMarginals(s, d)),
    // clustering
    "q_kmeans_step" -> ((s, d) => Clustering.kmeansStep(s, d)),
    // second-wave analytics staples
    "q_asof_last_view" -> ((s, d) => Analytics.asofLastView(s, d)),
    "q_pivot_events" -> ((s, d) => Analytics.pivotEventCounts(s, d)),
    "q_percentiles" -> ((s, d) => Analytics.quantityPercentiles(s, d)),
    "q_promo_share" -> ((s, d) => Analytics.promoShare(s, d)),
    "q_top_ngrams" -> ((s, d) => Analytics.topNgrams(s, d)),
    "q_tfidf_top_term" -> ((s, d) => Analytics.tfidfTopTerm(s, d)),
    "q_lsh_cosine" -> ((s, d) => Analytics.lshCosine(s, d)),
    "q_overlap_count" -> ((s, d) => Analytics.overlapCount(s, d)),
    "q_funnel" -> ((s, d) => Analytics.funnelStages(s, d)),
    "q_corr_moments" -> ((s, d) => Analytics.corrMoments(s, d)),
    "q_edit_distance" -> ((s, d) => Analytics.editDistance(s, d)),
    "q_day_retention" -> ((s, d) => Analytics.dayRetention(s, d)),
    "q_iqr_outliers" -> ((s, d) => Analytics.iqrOutliers(s, d)),
    "q_markov_transitions" -> ((s, d) => Analytics.markovTransitions(s, d)),
    "q_rfm_segments" -> ((s, d) => Analytics.rfmSegments(s, d)),
    "q_pareto_share" -> ((s, d) => Analytics.paretoShare(s, d)),
    "q_gini_spend" -> ((s, d) => Analytics.giniSpend(s, d)),
    // training-data curation
    "q_split_assign" -> ((s, d) => Curation.splitAssign(s, d)),
    "q_stratified_sample" -> ((s, d) => Curation.stratifiedSample(s, d)),
    "q_decontaminate" -> ((s, d) => Curation.decontaminate(s, d)),
    "q_dedup_clusters" -> ((s, d) => Curation.dedupClusters(s, d)),
    "q_dup_rate_by_source" -> ((s, d) => Curation.dupRateBySource(s, d)),
    "q_approx_quantile" -> ((s, d) => Analytics.approxQuantile(s, d)),
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
    // fourth-wave: graph analytics, runtime filters, curation signals
    "q_pagerank" -> ((s, d) => Graph.pageRank(s, d)),
    "q_triangles" -> ((s, d) => Graph.triangles(s, d)),
    "q_streaks" -> ((s, d) => Analytics.activityStreaks(s, d)),
    "q_skyline" -> ((s, d) => Relational.qSkylineParts(s, d)),
    "q_props_k" -> ((s, d) => Relational.qPropsK(s, d)),
    "q_bloom_semi" -> ((s, d) => RuntimeFilter.bloomSemiRevenue(s, d)),
    "q_dup_ngrams" -> ((s, d) => TextAnalysis.dupNgramFraction(s, d)),
    "q_minhash_acc" -> ((s, d) => Dedup.minhashAccuracy(s, d)),
    "q_ivf_stats" -> ((s, d) => Similarity.ivfStats(s, d)),
    "q_unpivot_daily" -> ((s, d) => Relational.qUnpivotDaily(s, d)),
    "q_source_mixture" -> ((s, d) => Curation.sourceMixture(s, d)),
    "q_token_budget" -> ((s, d) => Curation.tokenBudget(s, d)),
    "q_mad_outliers" -> ((s, d) => Analytics.madOutliers(s, d)),
    "q_ab_lift" -> ((s, d) => Analytics.abLift(s, d)),
    "q_latency_log2" -> ((s, d) => Analytics.latencyLog2(s, d)),
    "q_type_jaccard" -> ((s, d) => Analytics.typeUserJaccard(s, d)),
    "q_dau_wau" -> ((s, d) => Analytics.dauWau(s, d)),
    "q_doc_fluency" -> ((s, d) => TextAnalysis.docFluency(s, d)),
    "q_time_to_convert" -> ((s, d) => Analytics.timeToConvert(s, d)),
    "q_hot_keys" -> ((s, d) => Skew.hotKeys(s, d)),
    "q_salted_join" -> ((s, d) => Skew.saltedJoinPriority(s, d)),
    "q_exemplars" -> ((s, d) => Curation.exemplars(s, d)),
    "q_rich_idle" -> ((s, d) => Relational.qRichIdleCustomers(s, d)),
    "q_lang_confusion" -> ((s, d) => TextAnalysis.langConfusion(s, d)),
    "q_ivf_purity" -> ((s, d) => Similarity.ivfLabelPurity(s, d)),
    "q_top_paths" -> ((s, d) => Analytics.topPaths(s, d)),
    "q_profile_events" -> ((s, d) => Relational.qProfileEvents(s, d)),
    "q_curation_funnel" -> ((s, d) => Curation.curationFunnel(s, d)),
    "q_len_percentiles" -> ((s, d) => TextAnalysis.lengthPercentiles(s, d)),
    "q_hourly_seasonality" -> ((s, d) => Relational.qHourlySeasonality(s, d)),
    "q_native_sessions" -> ((s, d) => ChainLink.nativeSessions(s, d)),
    "q_band_stats" -> ((s, d) => ChainLink.bandStats(s, d)),
    "q_peak_concurrency" -> ((s, d) => ChainLink.peakConcurrency(s, d)),
    "q_boilerplate_grams" -> ((s, d) => Corpus.boilerplateGrams(s, d)),
    "q_source_overlap" -> ((s, d) => Corpus.sourceOverlap(s, d)),
    "q_source_drift" -> ((s, d) => Corpus.sourceDrift(s, d)),
    "q_pack_bins" -> ((s, d) => Corpus.packBins(s, d)),
    "q_ngram_novelty" -> ((s, d) => Corpus.ngramNovelty(s, d)),
    "q_prefix_dups" -> ((s, d) => Corpus.prefixDups(s, d)),
    "q_para_dedup" -> ((s, d) => Corpus.paraDedup(s, d)),
    "q_pii_scrub" -> ((s, d) => Scrub.piiScrub(s, d)),
    "q_centroid_drift" -> ((s, d) => Clustering.centroidDrift(s, d)),
    "q_weighted_sample" -> ((s, d) => Curation.weightedSample(s, d)),
    // sixth wave: containment dedup, SCD2, chunking, BPE stats, zone maps,
    // PQ recall
    "q_containment" -> ((s, d) => Dedup.containmentPairs(s, d)),
    "q_scd2" -> ((s, d) => Relational.qScd2(s, d)),
    "q_zonemap_prune" -> ((s, d) => Relational.qZonemapPrune(s, d)),
    "q_chunk_docs" -> ((s, d) => TextAnalysis.chunkDocs(s, d)),
    "q_bpe_pairs" -> ((s, d) => TextAnalysis.bpePairs(s, d)),
    "q_bpe_encode" -> ((s, d) => TextAnalysis.bpeEncode(s, d)),
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
    "q_train_order" -> ((s, d) => Curation.trainOrder(s, d)),
    "q_mixture_budget" -> ((s, d) => Curation.mixtureBudget(s, d)),
    "q_embed_stats" -> ((s, d) => Similarity.embedStats(s, d)),
    "q_pack_sequences" -> ((s, d) => Curation.packSequences(s, d)),
    "q_pack_greedy" -> ((s, d) => Curation.packGreedy(s, d)),
  )

  private val msgsCte = Tables.msgsCte

  /** Gap-sessionization CTE chain (30-min break) shared by `q_sessions`
    * and `q_session_stats`; final relation `s(user_id, em, session_id,
    * event_id)`.
    */
  private val sessionsCtes: String =
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
  private val linksCte: String =
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
  private val langIdCtes: String =
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
  private val docShCtes: String =
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
  private val bpeCtes: String = {
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
  private val interCte: String =
    """inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  /** 63-bit simhash CTE chain over documents (needs dw from docShCtes). */
  private val simhashCtes: String =
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
  private val vecCte: String =
    """v AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS e,
      |         sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x * x),
      |                          (a, b) -> a + b)) AS nrm
      |  FROM embeddings)""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), s -> s[1] * s[2]), (x, y) -> x + y)"

  /** Hash-min sample CTE: the `k` vectors with the smallest portable
    * 60-bit hash of their id (ties -> min vec_id) -- the ONE home for the
    * deterministic selection every index oracle replays (IVF centroids,
    * k-means seeds, PQ codebooks), mirroring `Similarity.centroidsFor` /
    * `pqCodebookSub`. Drift in K, the hash, or the tie-break now touches
    * every consumer at once instead of silently desynchronizing one copy.
    */
  private def hashMinCte(name: String, k: Int,
      cols: String = "vec_id AS cent_id, e AS ce, nrm AS cn"): String =
    s"""$name AS (SELECT $cols FROM v
       |  ORDER BY CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)
       |                AS BIGINT), vec_id
       |  LIMIT $k)""".stripMargin

  /** Exact full-dimension cosine top-5 CTE chain (`ep` pairs → `ext`
    * top-5) — the recall-audit baseline replaying
    * [[operators.Similarity.annTopkFor]]; shared by every `*_recall`
    * oracle that compares an approximate index against the exact scan.
    */
  private val exactTopCtes: String =
    s"""ep AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
       |         ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
       |       FROM v q JOIN v t ON t.vec_id <> q.vec_id
       |       WHERE q.vec_id % 20 = 0),
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
  private val sqCtes: String =
    """vn AS (SELECT vec_id, list_transform(e, x -> x / nrm) AS en FROM v),
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
      |       WHERE q.vec_id % 20 = 0)""".stripMargin

  /** SQ8∘IVF CTE chain (needs vecCte + sqCtes): hash-min coarse centroids,
    * nearest-centroid assignment, nprobe=2 query probes, candidate pairs,
    * then integer-dot scores over the SQ8 codes (`sc`) — replaying
    * [[operators.Similarity.sqIvfTopBuild]]. Ends in
    * `sqdi(q_id, n_id, dot)`.
    */
  private lazy val sqIvfCtes: String =
    s"""${hashMinCte("qcents", 64)},
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
       |              FROM v CROSS JOIN qcents c WHERE v.vec_id % 20 = 0)
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

  private def l2sqSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), s -> (s[1] - s[2]) * (s[1] - s[2])), (x, y) -> x + y)"

  /** CTE chain replaying [[graft.operators.Clustering.kmeansCentroids]]
    * with 2 Lloyd iterations: hash-min seeds → integer-exact micro-unit
    * mean update → rebuilt centroid lists + left-fold norms, twice. Ends
    * in `kcents(cent_id, ce, cn)`. Every step (round, trunc-div, double
    * division, fold) is the bit-identical arithmetic the Spark loop runs.
    */
  private lazy val kmeansCtes: String = {
    def assign(cents: String, out: String) =
      s"""$out AS (SELECT cent_id, e FROM (
         |       SELECT v.vec_id, c.cent_id, v.e,
         |              row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                c.cent_id) AS rn
         |       FROM v CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    def update(asg: String, out: String) =
      s"""${out}q AS (SELECT cent_id, di.i - 1 AS dim,
         |            CAST(trunc(CAST(sum(CAST(round(e[di.i] * 1000000.0) AS BIGINT))
         |                             AS DOUBLE) / count(*)) AS BIGINT) AS cq
         |     FROM $asg CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) di
         |     GROUP BY 1, 2),
         |${out}l AS (SELECT cent_id, list(cq / 1000000.0 ORDER BY dim) AS ce
         |     FROM ${out}q GROUP BY 1),
         |$out AS (SELECT cent_id, ce, sqrt(${dotSql("ce", "ce")}) AS cn FROM ${out}l)""".stripMargin
    s"""${hashMinCte("seeds", 64)},
       |${assign("seeds", "ka1")},
       |${update("ka1", "kc1")},
       |${assign("kc1", "ka2")},
       |${update("ka2", "kcents")}""".stripMargin
  }

  /** PQ/ADC CTE chain (needs vecCte): 16 hash-min codebook vectors, 8×8-dim
    * subspaces, L2² left-fold encode argmin, micro-unit integer ADC sums.
    * Ends in `adc(q_id, n_id, adc_q)`; shared by `q_pq_search` and the
    * `q_pq_recall` audit.
    */
  private lazy val pqCtes: String =
    s"""${hashMinCte("cb", 16, "vec_id AS code, e AS cbe")},
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
       |q AS (SELECT vec_id AS q_id, e AS qe FROM v WHERE vec_id % 20 = 0),
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
  private lazy val pqIvfCtes: String =
    s"""${hashMinCte("icents", 64)},
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
       |              FROM v CROSS JOIN icents c WHERE v.vec_id % 20 = 0)
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
  private lazy val pqTrainCtes: String = {
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
  private lazy val pqIvfTrainedCte: String =
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
  private lazy val pqResCtes: String = {
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

  private val revenueE4 =
    """CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
      |         * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)""".stripMargin

  /** q_lsh_cosine oracle: the 16 hyperplane sign vectors are inlined as the
    * exact same ±1 literals the Spark side uses
    * ([[Analytics.hyperplaneSigns]]), so signatures agree bit-for-bit.
    */
  /** The 16-hyperplane SRP signature expression, inlining the exact same
    * ±1 literals the Spark side uses ([[Analytics.hyperplaneSigns]]) — ONE
    * home shared by the q_lsh_cosine and q_sql_cosine_by_label oracles.
    */
  private lazy val sigTermsSql: String =
    Analytics.hyperplaneSigns.zipWithIndex.map { case (row, b) =>
      val lits = row.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]")
      s"(CASE WHEN ${dotSql("e", lits)} > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")

  private lazy val lshCosineSql: String = {
    s"""WITH $vecCte,
       |sig AS (SELECT vec_id, e, nrm, CAST($sigTermsSql AS BIGINT) AS sig FROM v),
       |bands AS (SELECT vec_id, sig, k, (sig >> (4 * k)) & 15 AS band_val
       |          FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) ks),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |         FROM bands a JOIN bands b
       |           ON a.k = b.k AND a.band_val = b.band_val AND a.vec_id < b.vec_id)
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
  def oracleSql: Map[String, String] = Map(
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

    // The oracle asserts the sketch contract: Spark's HLL++ estimate must be
    // within 2% of the exact count (the flag is computed Spark-side from the
    // real estimate; the oracle pins it to 1, so an out-of-tolerance sketch
    // hash-mismatches).
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |       count(*) AS n, CAST(1 AS BIGINT) AS within_2pct
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

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
         |strict AS (
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

    // Replays dedupEmbedding's IVF index exactly: same centroid subset,
    // same nprobe=4 multi-probe assignment (double-fold cosines, ties →
    // min cent_id), same exact-cosine verification.
    "dedup_embedding" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents", 64)},
         |probes AS (SELECT vec_id, cent_id FROM (
         |             SELECT v.vec_id, c.cent_id,
         |                    row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                      ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                      c.cent_id) AS rn
         |             FROM v CROSS JOIN cents c) WHERE rn <= 8),
         |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |         FROM probes a JOIN probes b
         |           ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id),
         |p AS (SELECT c.vec_a, c.vec_b,
         |        ${dotSql("va.e", "vb.e")} / (va.nrm * vb.nrm) AS cos
         |      FROM cand c
         |      JOIN v va ON c.vec_a = va.vec_id
         |      JOIN v vb ON c.vec_b = vb.vec_id)
         |SELECT vec_a, vec_b, cos FROM p WHERE cos >= 0.40
         |ORDER BY 1, 2""".stripMargin,

    // Recall audit: exact all-pairs vs the IVF-restricted pair set, counted
    // both ways plus the permille recall — the index quality as a checked
    // number (replays both mechanisms).
    "q_ann_recall" ->
      s"""WITH $vecCte,
         |ex AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |       FROM v a JOIN v b ON a.vec_id < b.vec_id
         |       WHERE ${dotSql("a.e", "b.e")} / (a.nrm * b.nrm) >= 0.40),
         |${hashMinCte("cents", 64)},
         |probes AS (SELECT vec_id, cent_id FROM (
         |             SELECT v.vec_id, c.cent_id,
         |                    row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                      ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                      c.cent_id) AS rn
         |             FROM v CROSS JOIN cents c) WHERE rn <= 8),
         |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |         FROM probes a JOIN probes b
         |           ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id),
         |iv AS (SELECT c.vec_a, c.vec_b FROM cand c
         |       JOIN v va ON c.vec_a = va.vec_id
         |       JOIN v vb ON c.vec_b = vb.vec_id
         |       WHERE ${dotSql("va.e", "vb.e")} / (va.nrm * vb.nrm) >= 0.40),
         |n AS (SELECT (SELECT count(*) FROM ex) AS n_exact,
         |             (SELECT count(*) FROM iv) AS n_ivf,
         |             (SELECT count(*) FROM ex JOIN iv USING (vec_a, vec_b))
         |               AS n_common)
         |SELECT n_exact, n_ivf, n_common,
         |       CAST(CASE WHEN n_exact = 0 THEN 1000
         |            ELSE n_common * 1000 // n_exact END AS BIGINT)
         |         AS recall_permille
         |FROM n""".stripMargin,

    "ann_topk" ->
      s"""WITH $vecCte,
         |p AS (SELECT q.vec_id AS q_id, t.vec_id AS n_id,
         |        ${dotSql("q.e", "t.e")} / (q.nrm * t.nrm) AS cos
         |      FROM v q JOIN v t ON t.vec_id <> q.vec_id
         |      WHERE q.vec_id % 20 = 0)
         |SELECT q_id, n_id, cos, rk FROM (
         |  SELECT q_id, n_id, cos,
         |         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rk
         |  FROM p)
         |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,

    "ann_ivf" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents", 64)},
         |asg AS (SELECT vec_id, cent_id FROM (
         |          SELECT v.vec_id, c.cent_id,
         |                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                   ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                   c.cent_id) AS rn
         |          FROM v CROSS JOIN cents c) WHERE rn = 1),
         |q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn FROM v
         |      WHERE vec_id % 20 = 0),
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
         |       WHERE q.vec_id % 20 = 0),
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

    // Replays incremental IVF maintenance: shard (vec_id % 5 = 0) vs
    // persisted-quantizer assignment, per-bucket growth, integer-exact
    // member-mean drift, and the reindex/keep verdict.
    "q_incremental_ivf" ->
      s"""WITH $vecCte,
         |${hashMinCte("icents", 64)},
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
         |       WHERE q.vec_id % 20 = 0),
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
         |      WHERE vec_id % 20 = 0),
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

    // Side-by-side recall of the hash-min vs k-means-refined IVF indexes
    // against the exact all-pairs truth (both pair mechanisms replayed).
    "q_ann_recall_kmeans" ->
      s"""WITH $vecCte,
         |$kmeansCtes,
         |ex AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |       FROM v a JOIN v b ON a.vec_id < b.vec_id
         |       WHERE ${dotSql("a.e", "b.e")} / (a.nrm * b.nrm) >= 0.40),
         |hprobes AS (SELECT vec_id, cent_id FROM (
         |             SELECT v.vec_id, c.cent_id,
         |                    row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                      ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                      c.cent_id) AS rn
         |             FROM v CROSS JOIN seeds c) WHERE rn <= 8),
         |hcand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |          FROM hprobes a JOIN hprobes b
         |            ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id),
         |hm AS (SELECT c.vec_a, c.vec_b FROM hcand c
         |       JOIN v va ON c.vec_a = va.vec_id
         |       JOIN v vb ON c.vec_b = vb.vec_id
         |       WHERE ${dotSql("va.e", "vb.e")} / (va.nrm * vb.nrm) >= 0.40),
         |kprobes AS (SELECT vec_id, cent_id FROM (
         |             SELECT v.vec_id, c.cent_id,
         |                    row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                      ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                      c.cent_id) AS rn
         |             FROM v CROSS JOIN kcents c) WHERE rn <= 8),
         |kcand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |          FROM kprobes a JOIN kprobes b
         |            ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id),
         |km AS (SELECT c.vec_a, c.vec_b FROM kcand c
         |       JOIN v va ON c.vec_a = va.vec_id
         |       JOIN v vb ON c.vec_b = vb.vec_id
         |       WHERE ${dotSql("va.e", "vb.e")} / (va.nrm * vb.nrm) >= 0.40),
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

    "q_kmeans_step" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents", 64, "vec_id AS cluster_id, e AS ce, nrm AS cn")},
         |asg AS (SELECT vec_id, cluster_id, e FROM (
         |          SELECT v.vec_id, c.cluster_id, v.e,
         |                 row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |                   ${dotSql("v.e", "c.ce")} / (v.nrm * c.cn) DESC,
         |                   c.cluster_id) AS rn
         |          FROM v CROSS JOIN cents c) WHERE rn = 1),
         |pts AS (SELECT cluster_id, di.i - 1 AS dim,
         |               CAST(round(e[di.i] * 1000000.0) AS BIGINT) AS q
         |        FROM asg CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) di)
         |SELECT cluster_id, CAST(dim AS BIGINT) AS dim,
         |       CAST(trunc(CAST(sum(q) AS DOUBLE) / count(*)) AS BIGINT) AS centroid_q,
         |       count(*) AS n_members
         |FROM pts GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

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

    "media_meta" ->
      """SELECT doc_id,
        |       CASE WHEN source = 'src0' THEN 'image'
        |            WHEN source = 'src1' THEN 'audio'
        |            WHEN source = 'src2' THEN 'video'
        |            ELSE 'text' END AS media_type,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       CAST(octet_length(encode(text)) // 100 + 1 AS BIGINT) AS n_frames,
        |       CAST(64 + CAST('0x' || substr(md5('w' || doc_id), 1, 15) AS BIGINT) % 1920
        |            AS BIGINT) AS width,
        |       CAST(64 + CAST('0x' || substr(md5('h' || doc_id), 1, 15) AS BIGINT) % 1080
        |            AS BIGINT) AS height,
        |       array_to_string(list_transform(
        |         generate_series(0, CAST(least(octet_length(encode(text)) // 100, 3) AS BIGINT)),
        |         j -> CAST(CAST('0x' || substr(md5(text || '#' || j), 1, 15) AS BIGINT)
        |                   AS VARCHAR)), ',')
        |         AS frame_hashes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "media_type_stats" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CASE WHEN source = 'src0' THEN 'image'
        |              WHEN source = 'src1' THEN 'audio'
        |              WHEN source = 'src2' THEN 'video'
        |              ELSE 'text' END AS media_type,
        |         octet_length(encode(text)) AS blen, text,
        |         CAST(64 + CAST('0x' || substr(md5('w' || doc_id), 1, 15) AS BIGINT) % 1920
        |              AS BIGINT) AS wi,
        |         CAST(64 + CAST('0x' || substr(md5('h' || doc_id), 1, 15) AS BIGINT) % 1080
        |              AS BIGINT) AS he
        |  FROM documents),
        |base AS (
        |  SELECT media_type, count(*) AS n_docs,
        |         CAST(sum(blen) AS BIGINT) AS total_bytes,
        |         CAST(sum(blen // 100 + 1) AS BIGINT) AS total_frames,
        |         CAST(sum(wi) // count(*) AS BIGINT) AS avg_w,
        |         CAST(sum(he) // count(*) AS BIGINT) AS avg_h
        |  FROM m GROUP BY 1),
        |fh AS (
        |  SELECT media_type,
        |         CAST('0x' || substr(md5(text || '#' || j), 1, 15) AS BIGINT) AS fh
        |  FROM m, unnest(generate_series(0, CAST(least(blen // 100, 3) AS BIGINT)))
        |         AS t(j)),
        |dh AS (SELECT media_type, count(DISTINCT fh) AS n_distinct_frames
        |       FROM fh GROUP BY 1)
        |SELECT base.media_type, base.n_docs, base.total_bytes, base.total_frames,
        |       base.avg_w, base.avg_h, dh.n_distinct_frames
        |FROM base JOIN dh ON base.media_type = dh.media_type
        |ORDER BY base.media_type""".stripMargin,

    "media_frames" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CASE WHEN source = 'src0' THEN 'image'
        |              WHEN source = 'src1' THEN 'audio'
        |              WHEN source = 'src2' THEN 'video'
        |              ELSE 'text' END AS media_type,
        |         octet_length(encode(text)) AS blen, text,
        |         CAST(64 + CAST('0x' || substr(md5('w' || doc_id), 1, 15) AS BIGINT) % 1920
        |              AS BIGINT) AS width,
        |         CAST(64 + CAST('0x' || substr(md5('h' || doc_id), 1, 15) AS BIGINT) % 1080
        |              AS BIGINT) AS height
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, media_type, width, height, text,
        |         unnest(generate_series(0, CAST(least(blen // 100, 3) AS BIGINT)))
        |           AS frame_idx
        |  FROM m)
        |SELECT doc_id, media_type, CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST('0x' || substr(md5(text || '#' || frame_idx), 1, 15) AS BIGINT)
        |         AS frame_hash,
        |       width * 128 // greatest(width, height) AS thumb_w,
        |       height * 128 // greatest(width, height) AS thumb_h
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    // Replays mediaDedup's chunking exactly: 100-char chunks at the same
    // sample positions as media_frames, portable 60-bit hash.
    "media_dedup" ->
      s"""WITH m AS (
         |  SELECT doc_id, length(text) AS blen, text FROM documents),
         |f AS (
         |  SELECT doc_id,
         |         unnest(generate_series(0, CAST(least(blen // 100, 3) AS BIGINT)))
         |           AS j
         |  FROM m),
         |h AS (
         |  SELECT f.doc_id,
         |         ${Tables.portableHashSql("substr(m.text, CAST(f.j * 100 + 1 AS BIGINT), 100)")}
         |           AS frame_hash
         |  FROM f JOIN m ON f.doc_id = m.doc_id)
         |SELECT frame_hash, count(DISTINCT doc_id) AS n_docs,
         |       min(doc_id) AS keep_doc, count(*) AS n_frames
         |FROM h GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY frame_hash""".stripMargin,

    "q_quality_filter" ->
      """WITH dw AS (SELECT doc_id, length(text) AS nc, string_split(text, ' ') AS w
        |            FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS n
        |       FROM (SELECT doc_id, unnest(w) AS t FROM dw) GROUP BY 1, 2),
        |tp AS (SELECT doc_id, max(n) AS top_n FROM tf GROUP BY 1),
        |m AS (SELECT doc_id, len(w) AS n_words, nc - len(w) + 1 AS word_chars,
        |             len(list_filter(w, x -> x = 'the' OR x = 'a' OR x = 'of'
        |                                  OR x = 'and')) AS stopword_n
        |      FROM dw),
        |j AS (SELECT m.doc_id, CAST(n_words AS BIGINT) AS n_words,
        |             CAST((10 * word_chars) // n_words AS BIGINT) AS mwl10,
        |             CAST((100 * top_n) // n_words AS BIGINT) AS top_pct,
        |             CAST(stopword_n AS BIGINT) AS stopword_n
        |      FROM m JOIN tp USING (doc_id)),
        |r AS (SELECT *, CASE WHEN n_words < 20 THEN 'too_short'
        |                     WHEN n_words > 90 THEN 'too_long'
        |                     WHEN mwl10 < 30 OR mwl10 > 80 THEN 'word_len'
        |                     WHEN top_pct > 15 THEN 'repetition'
        |                     WHEN stopword_n = 0 THEN 'no_stopword'
        |                     ELSE 'ok' END AS fail_reason
        |      FROM j)
        |SELECT doc_id, n_words, mwl10, top_pct, stopword_n, fail_reason,
        |       CAST(fail_reason = 'ok' AS BIGINT) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

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

    "q_zipf_terms" ->
      """WITH f AS (SELECT t AS term, count(*) AS freq
        |           FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |           GROUP BY 1),
        |r AS (SELECT term, freq,
        |        CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT) AS rank
        |      FROM f)
        |SELECT rank, term, freq, rank * freq AS rank_x_freq
        |FROM r WHERE rank <= 30 ORDER BY rank""".stripMargin,

    "q_vector_quantize" ->
      s"""WITH $vecCte,
         |p AS (SELECT vec_id, di.i - 1 AS dim, e[di.i] AS x
         |      FROM v CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) di),
         |s AS (SELECT dim, max(abs(x)) AS maxabs FROM p GROUP BY 1)
         |SELECT vec_id, CAST(p.dim AS BIGINT) AS dim,
         |       CAST(round(x * 127.0 / maxabs) AS BIGINT) AS q
         |FROM p JOIN s ON p.dim = s.dim
         |ORDER BY vec_id, dim""".stripMargin,

    "q_percent_rank" ->
      """SELECT p_brand, p_partkey, price_cents,
        |       percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM (SELECT p_brand, p_partkey,
        |             CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
        |      FROM part)
        |WINDOW w AS (PARTITION BY p_brand ORDER BY price_cents, p_partkey)
        |ORDER BY p_brand, price_cents, p_partkey""".stripMargin,

    "q_sql_segment_revenue" ->
      s"""SELECT c_mktsegment, $revenueE4 AS revenue_e4, count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,

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

    "q_pivot_events" ->
      """SELECT user_id % 8 AS bucket,
        |       count(*) FILTER (WHERE event_type = 'click') AS click,
        |       count(*) FILTER (WHERE event_type = 'error') AS error,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |       count(*) FILTER (WHERE event_type = 'view') AS view
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

    "q_promo_share" ->
      s"""WITH t AS (
         |  SELECT p_type, $revenueE4 AS revenue_e4, count(*) AS n_items
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1)
         |SELECT p_type, revenue_e4, n_items,
         |       CAST(revenue_e4 * 1000 // sum(revenue_e4) OVER () AS BIGINT)
         |         AS share_permille
         |FROM t ORDER BY p_type""".stripMargin,

    "q_top_ngrams" ->
      s"""WITH $docShCtes
         |SELECT shingle, count(*) AS df FROM sh
         |GROUP BY 1 ORDER BY df DESC, shingle LIMIT 20""".stripMargin,

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

    "q_lsh_cosine" -> lshCosineSql,

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

    "q_edit_distance" ->
      """SELECT doc_id,
        |       CAST(levenshtein(substr(text, 1, 32),
        |                        'the quick brown fox jumps over') AS BIGINT)
        |         AS edit_dist
        |FROM documents ORDER BY doc_id""".stripMargin,

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

    "q_markov_transitions" ->
      """WITH t AS (
        |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
        |           ORDER BY epoch_ms(ts), event_id) AS from_type,
        |         event_type AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS n
        |FROM t WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_cohort_matrix" ->
      """WITH a AS (SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
        |           FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
        |SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
        |       count(*) AS n_active
        |FROM a JOIN c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

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

    // Transitive closure over the symmetric near-dup edge list (recursive
    // CTE) vs Spark's min-label-propagation fixpoint — two genuinely
    // different mechanisms agreeing on component labels.
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $docShCtes, $interCte,
         |pairs AS (
         |  SELECT doc_a, doc_b FROM inter
         |  JOIN sizes sa ON doc_a = sa.doc_id
         |  JOIN sizes sb ON doc_b = sb.doc_id
         |  WHERE inter * 3 >= sa.n_sh + sb.n_sh),
         |e AS (SELECT doc_a AS s, doc_b AS t FROM pairs
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
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY 1)
         |SELECT cl.doc_id, cl.cluster_id, sz.cluster_size
         |FROM cl JOIN sz USING (cluster_id)
         |ORDER BY cl.doc_id""".stripMargin,

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

    // Replays sqlCosineByLabel's SRP-LSH banding exactly (same inlined
    // hyperplane literals as q_lsh_cosine), restricted to equal labels.
    "q_sql_cosine_by_label" -> {
      s"""WITH $vecCte,
         |v2 AS (SELECT v.vec_id, e.label, v.e, v.nrm
         |       FROM v JOIN embeddings e ON v.vec_id = e.vec_id),
         |sig AS (SELECT vec_id, label, e, nrm, CAST($sigTermsSql AS BIGINT) AS sig
         |        FROM v2),
         |bands AS (SELECT vec_id, label, sig, k, (sig >> (4 * k)) & 15 AS band_val
         |          FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) ks),
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

    "q_props_k" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(min(k) AS BIGINT) AS min_k,
        |       CAST(max(k) AS BIGINT) AS max_k,
        |       CAST(sum(k) // count(*) AS BIGINT) AS avg_k
        |FROM (SELECT event_type, CAST(props ->> '$.k' AS BIGINT) AS k FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // The bloom prefilter is internal-only (false positives re-checked by
    // the exact semi-join), so the oracle is the plain EXISTS form.
    "q_bloom_semi" ->
      s"""SELECT l_returnflag, $revenueE4 AS revenue_e4, count(*) AS n_items
         |FROM lineitem l
         |WHERE EXISTS (SELECT 1 FROM orders o
         |              WHERE o.o_orderkey = l.l_orderkey
         |                AND o.o_orderpriority = '1-URGENT')
         |GROUP BY 1 ORDER BY 1""".stripMargin,

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
         |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
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

    // Replays the nprobe=1 assignment; per-bucket majority label + purity.
    "q_ivf_purity" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents", 64)},
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

    // Replays the ann_ivf nprobe=1 assignment; per-centroid bucket sizes.
    "q_ivf_stats" ->
      s"""WITH $vecCte,
         |${hashMinCte("cents", 64)},
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

    "q_hot_keys" ->
      """WITH c AS (SELECT l_orderkey, count(*) AS n_rows FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM c)
        |SELECT l_orderkey, n_rows,
        |       CAST(n_rows * 1000 // t.n_total AS BIGINT) AS share_permille
        |FROM c CROSS JOIN t
        |ORDER BY n_rows DESC, l_orderkey LIMIT 20""".stripMargin,

    // Oracle is the PLAIN join + aggregation — the salted join must be
    // result-identical, differing only in physical work distribution.
    "q_salted_join" ->
      """SELECT o.o_orderpriority, count(*) AS n_items,
        |       CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_exemplars" ->
      s"""SELECT source, rk, doc_id, n_chars FROM (
         |  SELECT source, doc_id, n_chars,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY ${Tables.portableHashSql("'ex:' || doc_id")} % 10000,
         |                    doc_id) AS BIGINT) AS rk
         |  FROM documents)
         |WHERE rk <= 3 ORDER BY source, rk""".stripMargin,

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

    // Native session_window checked against the INDEPENDENT windowed-lag
    // sessionization mechanism (native end = last event + gap).
    "q_native_sessions" ->
      s"""WITH $sessionsCtes
         |SELECT user_id, CAST(min(em) AS BIGINT) AS start_ms,
         |       CAST(max(em) + 1800000 AS BIGINT) AS end_ms,
         |       count(*) AS n_events
         |FROM s GROUP BY user_id, session_id
         |ORDER BY user_id, start_ms""".stripMargin,

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

    "q_hourly_seasonality" ->
      """SELECT (epoch_ms(ts) // 3600000) % 24 AS hour,
        |       count(*) AS n_events,
        |       count(DISTINCT event_type) AS n_types,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

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

    // Mean integer bigram-PMI per doc — the corpus-grounded fluency gate.
    "q_doc_fluency" ->
      """WITH dw AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |db AS (SELECT doc_id, w[i] AS a, w[i + 1] AS b
        |       FROM dw, unnest(generate_series(1, len(w) - 1)) AS t(i)
        |       WHERE len(w) >= 2),
        |bg AS (SELECT a, b, count(*) AS n_ab FROM db GROUP BY 1, 2),
        |ug AS (SELECT unnest(w) AS t FROM dw),
        |uc AS (SELECT t, count(*) AS n FROM ug GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM uc),
        |sc AS (SELECT db.doc_id,
        |         CAST(bg.n_ab * tot.n_total * 100
        |              // (ua.n * ub.n) AS BIGINT) AS s
        |       FROM db JOIN bg ON db.a = bg.a AND db.b = bg.b
        |            JOIN uc ua ON db.a = ua.t
        |            JOIN uc ub ON db.b = ub.t
        |            CROSS JOIN tot)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       CAST(sum(s) AS BIGINT) AS sum_score,
        |       CAST(sum(s) // count(*) AS BIGINT) AS mean_score
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,

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

    "q_bpe_encode" ->
      s"""WITH $bpeCtes,
         |dwx AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |        FROM documents)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(wl) AS BIGINT) AS n_char_tokens,
         |       CAST(sum(wt) AS BIGINT) AS n_bpe_tokens
         |FROM dwx JOIN tok USING (word)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

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

    "q_centroid_drift" ->
      s"""WITH $vecCte,
         |$kmeansCtes
         |SELECT s.cent_id,
         |       CAST(floor(1000.0 * ${dotSql("s.ce", "k.ce")}
         |                  / (s.cn * k.cn)) AS BIGINT) AS cos_permille
         |FROM seeds s JOIN kcents k ON s.cent_id = k.cent_id
         |ORDER BY s.cent_id""".stripMargin,

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
         |       WHERE q.vec_id % 20 = 0),
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
         |       WHERE q.vec_id % 20 = 0),
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

    "q_pack_greedy" ->
      """WITH RECURSIVE t AS (
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
  )
}
