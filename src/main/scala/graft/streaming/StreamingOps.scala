package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming variants of the training-data pipeline operators: the same
  * semantics as the batch queries in `graft.operators`, expressed over
  * unbounded inputs with watermark-bounded state — what a continuous
  * ingestion pipeline runs.
  *
  * Inputs are DataFrames with an `event_time` TimestampType column plus the
  * named payload columns, so any source (Kafka + from_json, files, rate,
  * MemoryStream) plugs in.
  */
object StreamingOps {

  /** Streaming exact dedup on content hash — first occurrence wins, state
    * dropped once the watermark passes (`dropDuplicatesWithinWatermark`:
    * bounded state, unlike plain dropDuplicates which grows forever).
    * Columns in: (doc_id, text, event_time).
    */
  def dedupExactStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("content_md5", md5(col("text")))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("content_md5")

  /** Streaming tumbling-window aggregation per event_type (the streaming
    * form of the batch `q_events_tumbling`); integer-cents values.
    * Columns in: (event_type, value, event_time).
    */
  def tumblingCounts(events: DataFrame, windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value_cents"))

  /** Streaming telemetry debounce — the continuous twin of the batch
    * `q_event_debounce` burst-leader rule: per (user, event_type), events
    * within 60 s of their predecessor merge into one session window
    * (native `session_window`, half-open [start, last+gap) — an event at
    * exactly +gap starts a new burst, matching the batch `gap >= 60000`
    * keep rule exactly), and each burst emits its LEADING event (min
    * (event_time, event_id)) plus the burst size once the watermark closes
    * it. State is one open burst per active (user, type).
    * Columns in: (user_id, event_type, event_id, event_time).
    */
  def debounceStream(events: DataFrame, gap: String = "60 seconds",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"),
        col("event_type"))
      .agg(min(struct(col("event_time"), col("event_id"))).as("lead"),
        count(lit(1)).as("n_in_burst"))
      .select(col("user_id"), col("event_type"),
        col("lead.event_id").as("lead_event_id"),
        col("lead.event_time").as("lead_time"), col("n_in_burst"))

  /** Streaming gap-based sessionization via Spark's native `session_window`:
    * per-user sessions close after `gap` of inactivity, emitted once the
    * watermark passes the session end — the streaming form of the batch
    * `q_sessions` query. State is one open session per active user, evicted
    * on emission (merging session windows is built into the operator).
    * Columns in: (user_id, event_time).
    */
  def sessionizeStream(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("event_time", watermark)
      .groupBy(col("user_id"), session_window(col("event_time"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Streaming changelog compaction (the streaming form of the batch
    * `q_latest_snapshot`): maintain the latest event per (user_id,
    * event_type), latest = max (event_time, event_id). Update output mode —
    * each micro-batch emits the keys whose snapshot changed, which is
    * exactly a CDC upsert feed for a downstream store. `max_by` keeps state
    * at one row per key regardless of input rate.
    * Columns in: (user_id, event_type, event_id, value, event_time).
    */
  def latestSnapshotStream(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(max_by(
        struct(col("event_id"), col("event_time"),
          round(col("value") * 100).cast("long").as("value_cents")),
        struct(col("event_time"), col("event_id"))).as("latest"))
      .select(col("user_id"), col("event_type"),
        col("latest.event_id").as("event_id"),
        col("latest.event_time").as("event_time"),
        col("latest.value_cents").as("value_cents"))

  /** Streaming per-document text stats/quality — stateless map, unbounded
    * throughput (the batch `text_stats` shape on a stream).
    * Columns in: (doc_id, text, event_time).
    */
  def textStatsStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("event_time"),
        split(col("text"), " ").as("w"),
        length(col("text")).cast("long").as("n_chars"))
      .select(col("doc_id"), col("event_time"), col("n_chars"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct_words"))
      .withColumn("quality_pct", expr("(100 * n_distinct_words) div n_words"))

  /** Stream-static enrichment: join a stream against a static dimension
    * with an explicit broadcast — Structured Streaming re-reads the static
    * side per micro-batch, so a slowly-refreshed dimension table (the
    * feature/lookup join) stays current without restarting the query.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Streaming IVF bucket assignment — the embedding-ingest path of the
    * ANN index: every arriving vector is routed to its nearest coarse
    * centroid from the STATIC fixed-K centroid table (the same relation
    * the batch index builds against, re-read per micro-batch like
    * [[enrichStream]]'s dimension).
    *
    * Completely stateless: the centroid table collapses to ONE broadcast
    * row holding the sorted (cent_id, ce, cn) struct array, and the
    * argmax is a fold over that array per input row — no shuffle, no
    * streaming state, unbounded throughput. Semantics are identical to
    * the batch `ivfAssign` (cosine desc, ties → min cent_id): the fold
    * visits centroids in cent_id order and only a strictly greater
    * cosine displaces the incumbent, so ties keep the smallest id, and
    * the cosines are the same codegen'd left-fold doubles.
    *
    * Input columns: (vec_id, e: array<double>). Output: (vec_id, cent_id).
    */
  def ivfAssignStream(stream: DataFrame, cents: DataFrame): DataFrame = {
    import graft.functions.VectorOps
    // routes through the SAME Similarity.multiProbe expression the batch
    // index build uses (nprobe=1) — cosine arithmetic and tie-break are
    // identical by construction, not by a hand-mirrored re-implementation
    graft.operators.Similarity.multiProbe(
      stream.withColumn("nrm", sqrt(VectorOps.dot(col("e"), col("e")))),
      cents, nprobe = 1)
  }

  /** Streaming IVF index maintenance — the continuous form of the batch
    * `q_incremental_ivf` growth side: arriving shard vectors are assigned
    * statelessly against the PERSISTED centroid table
    * ([[ivfAssignStream]] — the quantizer is NOT retrained), and a running
    * per-bucket count tracks how much each bucket has grown since the last
    * re-index — the signal a recurring crawl alerts on (run in
    * update/complete mode). State is one counter per bucket (K rows,
    * constant at any corpus size). The drift/verdict readout stays batch
    * ([[graft.operators.Similarity.incrementalIvf]]) because it needs the
    * corpus-side member means, not the stream.
    * Input columns: (vec_id, e: array<double>). Output: (cent_id, n_new).
    */
  def ivfGrowthStream(stream: DataFrame, cents: DataFrame): DataFrame =
    ivfAssignStream(stream, cents)
      .groupBy("cent_id").agg(count(lit(1)).as("n_new"))

  /** Streaming PQ∘IVF top-k serving — the continuous form of the batch
    * `q_pq_ivf_search`: each arriving query vector probes its `nprobe`
    * nearest coarse centroids, ADC-scores ONLY the PQ codes of vectors
    * assigned to those buckets, and emits its top-`k` neighbors.
    *
    * All index relations are STATIC (re-read per micro-batch like
    * [[enrichStream]]'s dimension): the centroid table and per-subspace
    * codebook collapse to one broadcast row each; the per-bucket member
    * codes join the probe stream on cent_id. Per query row the work is
    * nprobe·(N/C) candidate folds — the same O-shape as the batch
    * composition, with no shuffle of the stream beyond the final
    * per-query top-k aggregation (state: one top-k accumulator per
    * in-flight query key).
    *
    * The ADC table (128 integer micro-unit entries) is computed INSIDE the
    * query row from the broadcast codebook — bit-identical to the batch
    * `pqDtabFor` table (same slices, same codegen'd L2², same rounding), so
    * the scores and therefore the top-k agree exactly with the batch
    * search restricted to the same buckets (StreamingOpsSpec pins ≡). It
    * is carried as a MAP keyed by `code·8 + m` (collision-free: codes are
    * distinct ids, m < 8), so each candidate's 8-code fold is 8 O(1)
    * `element_at` lookups instead of a 128-entry array filter per code —
    * a 16× inner-loop saving on the op whose whole point is serving
    * latency.
    *
    * Input columns: (vec_id, e: array<double>). Statics: cents
    * (cent_id, ce, cn), memberCodes (cent_id, vec_id, vcodes) — the
    * PRE-GROUPED per-bucket member-code index
    * ([[graft.operators.Similarity.memberCodesFor]] memoizes it), so a
    * micro-batch pays only the probe join; grouping the corpus-sized
    * assign ⋈ codes inside the stream plan would re-shuffle the full
    * corpus EVERY batch — codebook (code, m, cw). Output: (q_id, topk:
    * array<struct<adc_q, n_id>>) — run in update/complete mode.
    */
  def pqServeStream(stream: DataFrame, cents: DataFrame,
      memberCodes: DataFrame, codebook: DataFrame,
      nprobe: Int = 2, k: Int = 5): DataFrame = {
    import graft.functions.VectorOps
    val cbArr = codebook.agg(
      array_sort(collect_list(struct(col("m"), col("code"), col("cw"))))
        .as("cbs"))
    // per-row ADC map: dq = round(1e6·L2²(query subvector, codeword)) —
    // computed ONCE per query row (before the probe fan-out duplicates it)
    val dtab = map_from_entries(transform(col("cbs"), c =>
      struct((c.getField("code") * 8 + c.getField("m")).as("key"),
        round(VectorOps.l2sq(
          slice(col("e"), c.getField("m") * 8 + 1, lit(8)), c.getField("cw"))
          * 1000000.0).cast("long").as("dq"))))
    val withDtab = stream
      .withColumn("nrm", sqrt(VectorOps.dot(col("e"), col("e"))))
      .crossJoin(broadcast(cbArr))
      .select(col("vec_id"), col("e"), col("nrm"), dtab.as("dtab"))
    // probe list via the SAME Similarity.multiProbe the batch composition
    // uses — not a hand-mirrored copy of its cosine/tie-break expression
    val probed = graft.operators.Similarity
      .multiProbe(withDtab, cents, nprobe, keep = Seq("dtab"))
      .select(col("vec_id").as("q_id"), col("dtab"), col("cent_id"))
    // memberCodes is corpus-sized, so NO broadcast hint: the cent_id
    // equi-join lets the planner shuffle bucket-sized slices (or broadcast
    // on its own when the index genuinely fits), same rule as the batch
    // composition where the codes relation is never broadcast.
    val scored = probed.join(memberCodes, "cent_id")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        aggregate(col("vcodes"), lit(0L), (acc, c) =>
          acc + element_at(col("dtab"),
            c.getField("code") * 8 + c.getField("m"))).as("adc_q"))
    scored.groupBy(col("q_id"))
      .agg(slice(array_sort(collect_list(struct(col("adc_q"), col("n_id")))),
        1, k).as("topk"))
  }

  /** Streaming SQ8∘IVF serving — the int8 twin of [[pqServeStream]]:
    * arriving query vectors are unit-normalized and quantized against the
    * BROADCAST per-dim scale artifact (the same scales the corpus codes
    * were built with — [[graft.operators.Similarity.sqScalesFor]]), probe
    * their nprobe nearest coarse buckets via the SAME
    * `Similarity.multiProbe` the batch composition uses, and score only
    * the PRE-GROUPED per-bucket SQ8 member codes
    * ([[graft.operators.Similarity.memberSqCodesFor]]) with the
    * codegen'd int64 dot. Per-batch work is the probe join + bucket
    * folds — O(nprobe·N/C) per query — and the int64 score is exact
    * under any execution order, so the topk agrees bit-for-bit with the
    * batch [[graft.operators.Similarity.sqIvfTopFor]] restricted to the
    * same queries (StreamingOpsSpec pins ≡).
    *
    * Input columns: (vec_id, e: array<double>). Statics: cents
    * (cent_id, ce, cn), memberSqCodes (cent_id, vec_id, qe), scales
    * (sarr: array<double>, ONE row). Output: (q_id, topk:
    * array<struct<negdot, n_id>>) — negdot = −dot so the ascending
    * array_sort yields dot-descending, n_id-ascending order; run in
    * update/complete mode.
    *
    * STATE CAVEAT (same honesty rule as the batch operators' scale notes):
    * the per-q_id collect_list aggregation has no watermark, so the state
    * store retains every scored candidate row for every query ever served —
    * O(queries_served × nprobe·N/C) growth, unbounded in a long-running
    * server. That is the right shape for this repo's bounded bench/spec
    * runs (exact ≡-batch comparisons need nothing evicted); a production
    * deployment must add an event-time column on queries plus
    * `withWatermark` (serving answers are complete one micro-batch after
    * arrival, so even a minimal delay bound evicts aggressively), turning
    * state into O(in-flight queries). [[pqServeStream]] shares this
    * property.
    */
  def sqServeStream(stream: DataFrame, cents: DataFrame,
      memberSqCodes: DataFrame, scales: DataFrame,
      nprobe: Int = 2, k: Int = 5): DataFrame = {
    import graft.functions.VectorOps
    val withQ = stream
      .withColumn("nrm", sqrt(VectorOps.dot(col("e"), col("e"))))
      .crossJoin(broadcast(scales))
      .withColumn("qq",
        zip_with(transform(col("e"), x => x / col("nrm")), col("sarr"),
          (x, s) => round(x * lit(127.0) / s).cast("long")))
    val probed = graft.operators.Similarity
      .multiProbe(withQ, cents, nprobe, keep = Seq("qq"))
      .select(col("vec_id").as("q_id"), col("qq"), col("cent_id"))
    // memberSqCodes is corpus-sized: no broadcast hint, same rule as the
    // PQ server — the cent_id equi-join moves bucket-sized slices only.
    val scoredSq = probed.join(memberSqCodes, "cent_id")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        VectorOps.ldot(col("qq"), col("qe")).as("dot"))
    scoredSq.groupBy(col("q_id"))
      .agg(slice(array_sort(collect_list(
        struct((-col("dot")).as("negdot"), col("n_id")))), 1, k).as("topk"))
  }

  /** Streaming embedding-health monitor — the continuous twin of
    * [[graft.operators.Similarity.embedStats]]: per-dimension running
    * count / micro-unit sum / sum-of-squares / max|x| over arriving
    * vectors, maintained in update/complete mode. State is EXACTLY 64
    * rows of int64 counters regardless of ingest volume, and because
    * every statistic is an integer sum or max — associative, commutative,
    * overflow-free to ~10⁹ vectors — the running values equal the batch
    * operator's bit-for-bit at every micro-batch boundary (no float
    * accumulation order to discipline). Input columns: (vec_id, e:
    * array<double>). Output: (dim, n, sum_micro, sumsq_micro2,
    * maxabs_micro).
    */
  def embedStatsStream(stream: DataFrame): DataFrame =
    stream
      .select(posexplode(col("e")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        round(col("x") * 1000000.0).cast("long").as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sum_micro"),
        sum(col("q") * col("q")).as("sumsq_micro2"),
        max(abs(col("q"))).as("maxabs_micro"))

  /** Streaming truncation dedup — the continuous companion of the batch
    * `q_prefix_dups` report: arriving documents are keyed by the 60-bit
    * hash of their first [[graft.operators.Corpus.PrefixKeyLen]] chars and
    * deduplicated within the watermark, so re-fetches of the same page at
    * different truncation lengths collapse to the first arrival. Documents
    * SHORTER than the key length are keyed by their own doc_id (never
    * deduped here — the batch report excludes them too; exact short-doc
    * dups belong to [[dedupExactStream]]).
    *
    * PRECISION CAVEAT, by design: the stream drops on the prefix key
    * alone — no containment verification and no corpus df cap (both need
    * more than one-key bounded state). Distinct pages sharing a ≥ 60-char
    * boilerplate header WILL collapse to one. On corpora where that
    * pattern exists, run this as a quarantine router (sink the dropped
    * side for the batch `q_prefix_dups`/df-capped pass to adjudicate),
    * not as a hard delete.
    * Columns in: (doc_id, text, event_time).
    */
  def prefixDedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs.withColumn("prefix_h",
        when(length(col("text")) >= graft.operators.Corpus.PrefixKeyLen,
          graft.sources.Tables.portableHash(
            substring(col("text"), 1, graft.operators.Corpus.PrefixKeyLen)))
          .otherwise(-col("doc_id") - 1)) // negative: disjoint from the 60-bit hash range
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("prefix_h")

  /** Streaming corpus-probe near-dup dedup — the streaming form of the
    * batch `q_incremental_dedup` corpus pass: each arriving document's
    * (df-capped) shingle hashes probe the STATIC corpus posting lists,
    * per-candidate intersections aggregate in an event-time window, and
    * docs with any Jaccard ≥ 0.5 corpus match emit on the DROP list once
    * the watermark closes their window. Emitting only dups (append mode)
    * keeps the hot path proportional to duplicate mass; uniques are the
    * stream minus the drop list at the sink.
    *
    * Input stream: one row per (doc, shingle hash) — (doc_id, h, n_sh,
    * event_time), `n_sh` being the doc's own capped shingle count (known
    * at ingest). Statics: `postings` (cand, h), the persisted corpus
    * inverted index, and `candSizes` (cand, n_c). The probe is a
    * STATELESS stream-static equi-join on the 8-byte hash (per-key
    * fan-out bounded by the index's df cap); the only state is the two
    * chained windowed aggregations, bounded by in-flight (doc ×
    * candidate) pairs inside the watermark. Same integer-exact Jaccard
    * test as the batch core, so verdicts agree exactly
    * (StreamingOpsSpec pins drop-set equality). Within-batch dups are
    * the separate stateful topology
    * ([[StreamingDedup.minhashDedupStream]]); this op is the corpus side.
    */
  def corpusProbeDedupStream(docShingles: DataFrame, postings: DataFrame,
      candSizes: DataFrame, windowLen: String = "1 minute",
      watermark: String = "10 minutes"): DataFrame =
    docShingles.withWatermark("event_time", watermark)
      .join(postings, Seq("h"))
      .groupBy(window(col("event_time"), windowLen), col("doc_id"),
        col("n_sh"), col("cand"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(candSizes), "cand")
      .where(col("inter") * 3 >= col("n_sh") + col("n_c"))
      .groupBy(col("window"), col("doc_id"))
      .agg(count(lit(1)).as("n_dup_cands"))
      .select(col("window.start").as("window_start"), col("doc_id"),
        col("n_dup_cands"))

  /** Streaming quality gate — the batch `q_quality_filter` verdict applied
    * at ingest: every arriving document gets the same integer metrics and
    * the same first-failing-rule verdict (the thresholds live in ONE place,
    * [[graft.operators.TextAnalysis.qualityVerdict]], so the personalities
    * cannot drift). A curation pipeline routes `keep=0` rows to a
    * quarantine sink instead of re-scanning the corpus later.
    *
    * Completely stateless: the batch form computes the top-term count with
    * a per-doc aggregation, the stream computes it as an array fold inside
    * the row (documents are bounded; the fold is O(distinct·words) per doc)
    * — no shuffle, no state, unbounded throughput.
    * Columns in: (doc_id, text, event_time).
    */
  def qualityGateStream(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    docs.select(Seq(col("doc_id"), col("event_time"),
        length(col("text")).cast("long").as("nc"),
        split(col("text"), " ").as("w")) ++ carry.map(col): _*)
      .select(Seq(col("doc_id"), col("event_time"),
        size(col("w")).cast("long").as("n_words"),
        (col("nc") - size(col("w")).cast("long") + 1L).as("word_chars"),
        size(filter(col("w"), x =>
          x === "the" || x === "a" || x === "of" || x === "and"))
          .cast("long").as("stopword_n"),
        array_max(transform(array_distinct(col("w")),
          x => size(filter(col("w"), y => y === x))))
          .cast("long").as("top_n")) ++ carry.map(col): _*)
      .withColumn("mwl10", expr("(10 * word_chars) div n_words"))
      .withColumn("top_pct", expr("(100 * top_n) div n_words"))
      .select(Seq(col("doc_id"), col("event_time"), col("n_words"),
        col("mwl10"), col("top_pct"), col("stopword_n"),
        graft.operators.TextAnalysis.qualityVerdict.as("fail_reason")) ++
        carry.map(col): _*)
      .withColumn("keep", (col("fail_reason") === "ok").cast("long"))

  /** Streaming shard router — the landing step of the streaming curation
    * pipeline (quality gate → dedup → ROUTE): every surviving document is
    * assigned a landing shard by `portableHash mod nShards` — a pure
    * per-row function: stateless, shuffle-free, identical under retry
    * and across engines, sizes balanced in expectation. It shares the
    * seeded hash with the batch [[graft.operators.Curation.trainOrder]]
    * permutation but NOT its shard ids: the batch operator cuts
    * contiguous equal-size ±1 blocks of the global hash order, which
    * needs corpus-wide positions a stream cannot know. The contract is
    * landing locality (stable, auditable routing at ingest); the
    * pre-training pass re-runs the batch permutation over the landed
    * corpus for the exact equal-size training shards.
    * Columns in: (doc_id, event_time). Out: + (hk, shard).
    */
  def shardRouteStream(docs: DataFrame, nShards: Int = 16): DataFrame =
    docs.withColumn("hk", graft.sources.Tables.portableHash(
        concat(lit("order:r8:"), col("doc_id").cast("string"))))
      .withColumn("shard", pmod(col("hk"), lit(nShards.toLong)))

  /** Streaming length-distribution drift monitor — the continuous form of
    * the batch `q_source_drift` report: per tumbling window and source,
    * the permille L1 distance between the window's token-length histogram
    * and a fixed 16-bucket reference distribution (permille shares,
    * computed offline by the batch report over a trusted corpus).
    *
    * The whole histogram lives INSIDE one windowed aggregation row as 16
    * conditional sums, so there is exactly one streaming aggregation (no
    * chained stateful operators) and the L1 fold is a stateless map over
    * the emitted row — the alert arrives as soon as the watermark closes
    * the window. State per (window, source) is 17 longs.
    *
    * Input columns: (source, text, event_time). Output: (window_start,
    * source, n_docs, drift_permille).
    */
  def sourceDriftStream(docs: DataFrame, baseline: Seq[Long],
      windowLen: String = "5 minutes", watermark: String = "10 minutes"): DataFrame = {
    require(baseline.length == 16, "baseline must carry 16 bucket shares")
    val bucketed = docs.select(col("source"), col("event_time"),
      least(expr("size(split(text, ' ')) div 8"), lit(15)).cast("long").as("bucket"))
    val hist = (0 until 16).map(b =>
      sum(when(col("bucket") === b, 1L).otherwise(0L)).as(s"c_$b"))
    val counts = bucketed.withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("source"))
      .agg(count(lit(1)).as("n_docs"), hist: _*)
    val drift = (0 until 16).map(b =>
      abs(expr(s"1000 * c_$b div n_docs") - lit(baseline(b)))).reduce(_ + _)
    counts.select(col("window.start").as("window_start"), col("source"),
      col("n_docs"), drift.as("drift_permille"))
  }

  /** Streaming DSIR scoring: arriving documents scored in-row against a
    * FROZEN trained weight table ([[graft.operators.Curation.dsirWeights]]
    * — the batch training pass's artifact, complete over all 256 buckets
    * so no token can miss). The 256-entry bucket→weight map collapses to
    * ONE broadcast row and each document's integer mean-ratio score is an
    * in-row array fold over its tokens — stateless, shuffle-free,
    * bit-identical to the batch [[graft.operators.Curation.dsirScores]]
    * arithmetic. The continuous form of the `q_dsir_select` scoring stage:
    * a router drops/keeps/weights documents at ingest by target-likeness.
    * Columns in: (doc_id, lang, text, event_time).
    */
  /** Streaming count-min sketch maintenance: the windowed form of the
    * `q_cms_hitters` counter build — every arriving token increments one
    * counter per hash row ([[graft.operators.TextAnalysis.cmsBucket]],
    * the SAME salted expression as batch), aggregated per event-time
    * window. State is purely additive int64 bounded by D·W rows per live
    * window (1024 longs here) regardless of token rate — the sketch
    * property that makes CMS the canonical streaming frequency structure.
    * Estimates are served exactly as in batch: min over the D counters of
    * a key's buckets. Columns in: (w, event_time).
    */
  def cmsStream(toks: DataFrame, windowLen: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame = {
    import graft.operators.TextAnalysis
    val rowIds = array((0 until TextAnalysis.CmsD).map(lit): _*)
    toks.withWatermark("event_time", watermark)
      .select(col("event_time"), explode(rowIds).as("r"), col("w"))
      .select(col("event_time"), col("r").cast("long").as("r"),
        TextAnalysis.cmsBucket(col("r"), col("w")).as("b"))
      .groupBy(window(col("event_time"), windowLen), col("r"), col("b"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("window_start"),
        col("r"), col("b"), col("c"))
  }

  def dsirScoreStream(stream: DataFrame, weights: DataFrame): DataFrame = {
    import graft.sources.Tables
    val wmap = weights.agg(
      map_from_entries(collect_list(struct(col("b"), col("w_pm")))).as("wm"))
    stream.crossJoin(broadcast(wmap))
      .select(col("doc_id"), col("lang"), col("event_time"),
        split(col("text"), " ").as("ws"), col("wm"))
      .select(col("doc_id"), col("lang"), col("event_time"),
        size(col("ws")).cast("long").as("n_toks"),
        aggregate(col("ws"), lit(0L), (acc, w) =>
          acc + element_at(col("wm"),
            Tables.portableHash(w) % graft.operators.Curation.DsirB)).as("sw"))
      .withColumn("score_pm", expr("sw div n_toks"))
      .drop("sw")
  }

  /** The COMPOSED streaming curation funnel — the continuous form of the
    * batch pipeline the individually-proven stages add up to:
    * quality gate (stateless) → PII scrub (stateless map, the SAME
    * [[graft.operators.Scrub.scrubbed]] regex fold as batch) →
    * exact-dedup first-occurrence on the CLEAN text (watermark-bounded
    * state) → shard route (stateless). Documents failing the gate are
    * dropped; later exact duplicates are dropped; survivors emerge with
    * their redaction count, content hash, and landing shard — the row a
    * continuous ingestion job writes to its landing table.
    *
    * Winner identity under ties follows ARRIVAL order (stream semantics;
    * the batch keep-first rule uses min doc_id), so the funnel's
    * equivalence contract is set-level: the surviving clean-content set,
    * the per-doc redaction counts, and the shard routing are all proven ≡
    * batch in NinthWaveSpec.
    *
    * `merges` is the learned BPE merge table
    * ([[graft.operators.TextAnalysis.bpeMergesFor]] — the tokenizer's
    * model artifact): it collapses to ONE broadcast row and every routed
    * survivor carries `n_tokens`, its token count under that tokenizer,
    * computed by the SAME per-word replace-fold the batch vocab replay
    * applies ([[graft.operators.TextAnalysis.bpeTokenCountExpr]]) —
    * stateless, so the token accounting a shard consumer needs rides the
    * ingest row instead of a later corpus pass.
    * Columns in: (doc_id, text, event_time).
    */
  def curationFunnelStream(docs: DataFrame, merges: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    import graft.operators.Scrub
    val msRow = merges.agg(array_sort(
      collect_list(struct(col("ord"), col("pat"), col("rep")))).as("ms"))
    val kept = qualityGateStream(docs, carry = Seq("text"))
      .where(col("keep") === 1)
    val scrubbed = kept.select(col("doc_id"), col("event_time"),
      Scrub.scrubbed(col("text")).as("text"),
      Scrub.Families.map { case (_, re, _) =>
        Scrub.matchCount(col("text"), re)
      }.reduce(_ + _).as("n_pii"))
    val unique = dedupExactStream(scrubbed, watermark)
    shardRouteStream(unique.select(col("doc_id"), col("event_time"),
      col("text"), col("n_pii"), col("content_md5"))
      .crossJoin(broadcast(msRow))
      .withColumn("n_tokens",
        graft.operators.TextAnalysis.bpeTokenCountExpr("text", "ms"))
      .drop("ms"))
  }

  /** Stateless streaming chunk embed+assign — the text-side ingest
    * embedder: each arriving document is cut into the SAME sliding chunk
    * windows as the batch [[graft.operators.TextAnalysis.chunkEmbedIndex]],
    * feature-hashed (signed token hashing, identical expressions), and
    * assigned to the nearest centroid of a PRECOMPUTED index — the
    * centroid feature table and its squared norms collapse to one
    * broadcast row of (cent_id → sparse features) structs. Per row the
    * work is a bounded fold (chunks × tokens × centroids); no state, no
    * shuffle.
    *
    * Emits (doc_id, chunk_idx, cid, cent_id, dot, n2q) per chunk —
    * proven row-identical to the batch assignment in NinthWaveSpec when
    * fed the same corpus against the batch-built centroids. The candidate
    * set is STRUCTURALLY the batch one: only centroids sharing ≥1 hit
    * feature bucket compete, and a chunk overlapping no centroid is
    * dropped (as the batch inner join on `b` drops it) — not an artifact
    * of test corpora where full overlap is near-certain.
    * Columns in: (doc_id, text, event_time). `centFeatures` columns:
    * (cent_id, b, cv) (the batch `cf` relation); `centNorms`:
    * (cent_id, n2c).
    */
  def chunkAssignStream(docs: DataFrame, centFeatures: DataFrame,
      centNorms: DataFrame): DataFrame = {
    import graft.operators.TextAnalysis.{ChunkLen, ChunkStride}
    import graft.sources.Tables
    // one broadcast row: per centroid, its 64-long dense vector rebuilt
    // from the sparse features (missing buckets -> 0), plus its norm
    val dense = centFeatures.groupBy("cent_id")
      .agg(map_from_entries(collect_list(struct(col("b"), col("cv"))))
        .as("fm"))
      .join(centNorms, "cent_id")
      // no sort: collect order is irrelevant (and structs holding maps
      // aren't orderable) — the final (−cos, cent_id) array_sort decides
      .agg(collect_list(struct(col("cent_id"), col("fm"), col("n2c")))
        .as("cents"))
    val chunks = docs
      .select(col("doc_id"), col("event_time"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("event_time"),
        posexplode(expr(
          s"""transform(
             |  sequence(1, greatest(size(w) - ${ChunkLen - ChunkStride}, 1),
             |           $ChunkStride),
             |  s -> slice(w, s, $ChunkLen))""".stripMargin)))
      .toDF("doc_id", "event_time", "chunk_idx", "cw")
      .select(col("doc_id"), col("event_time"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        (col("doc_id") * graft.operators.TextAnalysis.ChunkIdSpan
           + col("chunk_idx")).as("cid"), col("cw"))
    // sparse chunk features as a map: bucket -> signed count
    val fm = chunks.select(col("doc_id"), col("chunk_idx"), col("cid"),
      col("event_time"),
      aggregate(col("cw"),
        map().cast("map<bigint,bigint>"),
        (m, w) => {
          val b = Tables.portableHash(concat(lit("fh:"), w)) %
            graft.operators.TextAnalysis.FhDims
          val s = when(Tables.portableHash(concat(lit("fs:"), w)) % 2 === 1,
            1L).otherwise(-1L)
          map_concat(map_filter(m, (k, _) => k =!= b),
            map(b, coalesce(element_at(m, b), lit(0L)) + s))
        }).as("fm"))
    val n2q = aggregate(map_values(col("fm")), lit(0L), (a, v) => a + v * v)
    // per-chunk argmax entirely IN THE ROW (multiProbe's array_sort trick
    // on (−cos, cent_id) — no window, no aggregation, stream stays
    // stateless): score the bucket-overlapping candidates in one
    // transform, sort, take [1]
    fm.crossJoin(broadcast(dense))
      .withColumn("n2q", n2q)
      // STRUCTURAL contract with the batch assignment: a centroid is a
      // candidate iff it shares ≥1 hit feature bucket with the chunk
      // (the batch `dots` relation is an inner join on `b`, so a chunk
      // sharing no bucket with any centroid is ABSENT from batch output,
      // and a negative-cosine overlapping centroid must beat a cos-0
      // non-overlapping one). Bucket presence — not dot ≠ 0 — is the
      // test: both sides keep zero-sum buckets (ADVICE r9).
      .withColumn("cands", filter(col("cents"), c =>
        exists(map_keys(col("fm")), k =>
          element_at(c.getField("fm"), k).isNotNull)))
      .where(size(col("cands")) > 0)
      .withColumn("sc", transform(col("cands"), c => struct(
        aggregate(map_keys(col("fm")), lit(0L), (a, k) =>
          a + element_at(col("fm"), k) *
            coalesce(element_at(c.getField("fm"), k), lit(0L))).as("dot"),
        c.getField("cent_id").as("cent_id"),
        c.getField("n2c").as("n2c"))))
      .withColumn("best", element_at(array_sort(transform(col("sc"), s =>
        struct((-(s.getField("dot") /
          (sqrt(col("n2q")) * sqrt(s.getField("n2c"))))).as("negcos"),
          s.getField("cent_id").as("cent_id"),
          s.getField("dot").as("dot")))), 1))
      .select(col("doc_id"), col("chunk_idx"), col("cid"),
        col("best.cent_id").as("cent_id"), col("best.dot").as("dot"),
        col("n2q"))
  }

  /** Stateless streaming BM25 scorer: each arriving document is scored
    * against a PRECOMPUTED index-statistics artifact — the 5-term query
    * table and the (nd, tot) corpus stats from
    * [[graft.operators.Analytics.bm25StatsFor]] — exactly how a serving
    * tier scores fresh documents against a nightly-built index. Both
    * relations collapse to one broadcast row (a term→df map + two
    * scalars); per row the score is a bounded array scan (5 terms ×
    * doc length), no state, no shuffle, so throughput is input-bound at
    * any parallelism.
    *
    * Emits doc_id, dl, n_hit_terms, score_milli per document (zero-hit
    * documents carry 0/0). The arithmetic is
    * [[graft.operators.Analytics.bm25Milli]] — the SAME Column expression
    * the batch ranker uses — and StreamingBm25Spec proves the stream
    * output ≡ the batch scored relation row-for-row on the test corpus.
    */
  def bm25ScoreStream(stream: DataFrame, qt: DataFrame, tot: DataFrame)
      : DataFrame = {
    val qmap = qt.agg(
      map_from_entries(collect_list(struct(col("term"), col("df"))))
        .as("qm"))
    val scores = transform(map_entries(col("qm")), e =>
      struct(
        size(filter(col("ws"), w => w === e.getField("key"))).cast("long")
          .as("tf"),
        e.getField("value").as("df")))
    stream.crossJoin(broadcast(qmap)).crossJoin(broadcast(tot))
      .select(col("doc_id"), split(col("text"), " ").as("ws"),
        col("qm"), col("nd"), col("tot"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        scores.as("sc"), col("nd"), col("tot"))
      .select(col("doc_id"), col("dl"),
        size(filter(col("sc"), s => s.getField("tf") > 0)).cast("long")
          .as("n_hit_terms"),
        aggregate(col("sc"), lit(0L), (acc, s) =>
          acc + when(s.getField("tf") > 0,
            graft.operators.Analytics.bm25Milli(
              s.getField("tf"), s.getField("df"), col("dl"),
              col("nd"), col("tot"))).otherwise(0L))
          .as("score_milli"))
  }
}
