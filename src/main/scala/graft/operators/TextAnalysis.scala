package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Materialized, Tables}

/** Text-quality operators over `documents.parquet`: stats, quality scoring,
  * language-ID, tokenization, fingerprinting. All single-pass map + narrow
  * agg — embarrassingly parallel, no shuffle beyond the final (tiny) sort;
  * the 100 TB story is pure scan throughput with full column pruning.
  *
  * Outputs are integers (or single-op doubles) so they hash-compare exactly
  * against DuckDB.
  */
object TextAnalysis {

  /** Memoized per-document word bigram relation (doc_id, a, b) — the
    * shared intermediate behind the PMI collocations and the fluency gate
    * (the 100 TB deployment materializes this once per corpus snapshot).
    */
  private[graft] def docBigramsFor(spark: SparkSession, dir: String): DataFrame =
    Materialized.of(spark, s"doc_bigrams:$dir") {
      val w = split(col("text"), " ")
      Tables.load(spark, dir, "documents")
        .select(col("doc_id"),
          explode(when(size(w) >= 2,
            transform(sequence(lit(1), size(w) - 1),
              i => struct(element_at(w, i).as("a"), element_at(w, i + 1).as("b"))))
            .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("bi"))
        .select(col("doc_id"), col("bi.a").as("a"), col("bi.b").as("b"))
    }

  /** Memoized corpus unigram counts (t, n) — shared by Zipf, PMI, fluency. */
  private[graft] def unigramCountsFor(spark: SparkSession, dir: String): DataFrame =
    Materialized.of(spark, s"unigram_counts:$dir") {
      Tables.load(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("n"))
    }

  /** The stopword test, in ONE place: [[textStats]] and [[qualityFilter]]
    * both count hits against this set, so extending it cannot silently
    * diverge the two reports (the same single-home rule as
    * [[qualityVerdict]] for the gate thresholds).
    */
  private def stopwordHits(w: Column): Column =
    size(filter(w, x =>
      x === "the" || x === "a" || x === "of" || x === "and")).cast("long")

  /** Per-document statistics + quality score. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(col("doc_id"), col("n_chars"),
        length(col("text")).cast("long").as("n_chars_calc"),
        split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("n_chars"), col("n_chars_calc"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct_words"),
        aggregate(transform(col("w"), x => length(x)), lit(0),
          (acc, v) => greatest(acc, v)).cast("long").as("max_word_len"),
        stopwordHits(col("w")).as("stopword_n"))
      .withColumn("quality_pct",
        expr("(100 * n_distinct_words) div n_words"))
      .orderBy("doc_id")
  }

  /** Language-ID by marker-word voting. The marker profiles are "learned"
    * offline from per-language frequency stats (as real n-gram lang-id is);
    * prediction is an argmax with a fixed tie-break order, fully
    * deterministic.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    def hits(words: Seq[String]) = {
      val w = col("w")
      size(filter(w, x => words.map(x === _).reduce(_ || _))).cast("long")
    }
    d.select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("lang"),
        hits(Seq("the", "order", "table", "window")).as("s_en"),
        hits(Seq("slow", "agg", "merge", "vector")).as("s_es"),
        hits(Seq("scan", "data", "query", "small")).as("s_fr"),
        hits(Seq("customer", "hash", "join", "row")).as("s_de"),
        hits(Seq("join", "small", "customer", "column")).as("s_zh"))
      .withColumn("pred_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
          col("s_en") >= col("s_de") && col("s_en") >= col("s_zh"), "en")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_de") &&
            col("s_es") >= col("s_zh"), "es")
          .when(col("s_fr") >= col("s_de") && col("s_fr") >= col("s_zh"), "fr")
          .when(col("s_de") >= col("s_zh"), "de")
          .otherwise("zh"))
      .select(col("doc_id"), col("lang"), col("pred_lang"),
        (col("pred_lang") === col("lang")).cast("long").as("is_match"))
      .orderBy("doc_id")
  }

  /** Confusion matrix of the lang-id heuristic: per (true, predicted)
    * class counts with permille class shares — the evaluation readout a
    * classifier gate ships with. One aggregation over the prediction
    * relation; class totals broadcast.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val pr = langId(spark, dir).select("lang", "pred_lang")
    val cm = pr.groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
    // class totals fold over the (classes²-row) matrix, NOT a second scan
    // of the prediction relation — one pass over the corpus, not two
    val tot = cm.groupBy("lang").agg(sum(col("n")).as("n_lang"))
    cm.join(broadcast(tot), "lang")
      .select(col("lang"), col("pred_lang"), col("n"),
        expr("n * 1000 div n_lang").as("share_permille"))
      .orderBy("lang", "pred_lang")
  }

  /** Token counting: whitespace tokens vs a BPE-ish regex token stream
    * (`[a-z0-9]+` runs only — punctuation/uppercase characters are not
    * counted as tokens, they just split runs; right for this lowercase
    * synthetic corpus, and the DuckDB oracle replays the same regex).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("re_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("chars_per_token",
        expr("n_chars div greatest(re_tokens, 1)"))
      .orderBy("doc_id")
  }

  /** Gopher/C4-style quality gating: per-document integer metrics (word
    * count, mean word length ×10, top-word repetition share, stopword
    * presence) checked against fixed bounds, emitting keep/drop plus the
    * FIRST failing rule — the audit trail a curation pipeline needs (what
    * was dropped and why, per document). One scan + one tf aggregation for
    * the repetition gate; thresholds are integer-exact so the oracle
    * hash-matches.
    */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val tf = d.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(max(col("n")).as("top_n"))
    val metrics = d
      .select(col("doc_id"), length(col("text")).cast("long").as("nc"),
        split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        // words are single-space joined: total word chars = len − (n−1)
        (col("nc") - size(col("w")).cast("long") + 1L).as("word_chars"),
        stopwordHits(col("w")).as("stopword_n"))
      .withColumn("mwl10", expr("(10 * word_chars) div n_words"))
      .join(tf, "doc_id")
      .withColumn("top_pct", expr("(100 * top_n) div n_words"))
    metrics.select(col("doc_id"), col("n_words"), col("mwl10"),
        col("top_pct"), col("stopword_n"), qualityVerdict.as("fail_reason"))
      .withColumn("keep", (col("fail_reason") === "ok").cast("long"))
      .orderBy("doc_id")
  }

  /** First-failing-rule verdict over the metric columns (n_words, mwl10,
    * top_pct, stopword_n) — the single home of the gate thresholds, shared
    * by the batch filter and the streaming ingest gate so the two
    * personalities cannot drift.
    */
  private[graft] def qualityVerdict: org.apache.spark.sql.Column =
    when(col("n_words") < 20, "too_short")
      .when(col("n_words") > 90, "too_long")
      .when(col("mwl10") < 30 || col("mwl10") > 80, "word_len")
      .when(col("top_pct") > 15, "repetition")
      .when(col("stopword_n") === 0, "no_stopword")
      .otherwise("ok")

  /** Word count per chunk window. */
  private[graft] val ChunkLen = 40
  /** Words between consecutive chunk starts (overlap = ChunkLen − stride). */
  private[graft] val ChunkStride = 30

  /** Fixed-window document chunking with overlap — the map from curated
    * documents to training sequences: each document yields windows of
    * [[ChunkLen]] words starting every [[ChunkStride]] (10-word overlap so
    * no sentence is only ever seen split), the final window truncated at
    * the document end. Emits one row per chunk with its word offsets and
    * the portable hash of the chunk text (the key chunk-level exact dedup
    * and shard assignment run on downstream).
    *
    * Pure map-side generate — sequence + slice inside one projection, no
    * shuffle anywhere; at 100 TB this is scan-bandwidth work that pipelines
    * into the shard writer. Chunk indices are `(start−1)/stride`, so the
    * relation is deterministic and append-stable (re-chunking a grown
    * corpus never renumbers old chunks).
    */
  /** Shared chunk-window derivation (doc_id, chunk_idx, start_word, cw) —
    * consumed by [[chunkDocs]] and [[chunkEmbedIndex]].
    */
  private[graft] def chunkWindowsFor(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"),
        // starts run to len − (chunk − stride): the last window may be
        // truncated but always reaches the final word (stop at len − 39
        // would orphan up to stride−1 tail words whenever
        // (len − 1) mod stride lands past the bound)
        explode(sequence(lit(1),
          greatest(size(col("w")) - lit(ChunkLen - ChunkStride), lit(1)),
          lit(ChunkStride))).as("s"))
      .select(col("doc_id"),
        ((col("s") - 1) / ChunkStride).cast("long").as("chunk_idx"),
        col("s").cast("long").as("start_word"),
        slice(col("w"), col("s"), lit(ChunkLen)).as("cw"))

  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    chunkWindowsFor(spark, dir)
      .select(col("doc_id"), col("chunk_idx"), col("start_word"),
        size(col("cw")).cast("long").as("n_words"),
        Tables.portableHash(concat_ws(" ", col("cw"))).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")

  /** Chunk-id encoding span: cid = doc_id · span + chunk_idx. 1e6 bounds
    * documents at 1e6 chunks (≈30M words at stride [[ChunkStride]]) before
    * two documents' chunk ids could collide — the former 1000 span
    * collided at ~30k-word documents, silently merging feature vectors
    * across documents in [[chunkFeaturesFor]] (ADVICE r9). doc_id · 1e6
    * stays in int64 up to ~9.2e12 documents.
    */
  private[graft] val ChunkIdSpan = 1000000L

  /** Feature-hash buckets for [[chunkEmbedIndex]] chunk vectors. */
  private[graft] val FhDims = 64L

  /** Centroid-sample size for the chunk-vector index. */
  private[graft] val FhCentroids = 16

  /** The text→vector→index glue pass of a retrieval pipeline: every chunk
    * window is embedded by signed FEATURE HASHING (each token adds ±1 to
    * one of [[FhDims]] buckets — Weinberger et al. 2009's hashing trick, a
    * deterministic stand-in for a learned encoder the way the multimodal
    * decode is stubbed), and the chunk vectors are IVF-indexed against a
    * [[FhCentroids]]-chunk hash-min centroid sample with exact sparse
    * integer dot products. Emits every chunk with its assigned centroid,
    * the int64 dot, and the int64 squared norms — all corpus sums exact
    * and order-free, so the whole embed+index pipeline hash-verifies.
    *
    * Scale shape: feature extraction is one explode + a map-side-combined
    * (chunk, bucket) aggregation; the centroid side is [[FhCentroids]]
    * chunks' features (broadcast-sized); scoring joins on the bucket key
    * so the shuffle carries sparse features, never dense vectors; the
    * argmax is a per-chunk window over ≤ [[FhCentroids]] candidates.
    */
  /** Sparse signed feature-hash vectors per chunk — (cid, b, v).
    *
    * MEMOIZED since round 18 (the chunk-vector table is a persisted
    * retrieval-index artifact in production, like every other index memo
    * here): [[chunkEmbedIndex]] references this relation four times
    * (norms, centroid sample, centroid features, scoring join) and
    * [[chunkCentIndexFor]] twice more, and an un-memoized reference
    * recomputes the whole split→window-explode→word-explode→hash pipeline
    * per reference — the round-18 sf0.1 plan dump showed 7 documents
    * scans under one q_chunk_embed. As a memo each reference is a narrow
    * (cid, b, v) columnar scan; the corpus pipeline runs once
    * (`_build_chunk_ft` in the bench).
    */
  private[graft] def chunkFeaturesFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"chunkft:$dir") {
      chunkWindowsFor(spark, dir)
        .select((col("doc_id") * ChunkIdSpan + col("chunk_idx")).as("cid"), col("cw"))
        .select(col("cid"), explode(col("cw")).as("w"))
        .select(col("cid"),
          (Tables.portableHash(concat(lit("fh:"), col("w"))) % FhDims).as("b"),
          when(Tables.portableHash(concat(lit("fs:"), col("w"))) % 2 === 1, 1L)
            .otherwise(-1L).as("s"))
        .groupBy("cid", "b").agg(sum(col("s")).as("v"))
    }

  /** The chunk-vector index artifact: (centroid sparse features `(cent_id,
    * b, cv)`, centroid squared norms `(cent_id, n2c)`) — what the
    * streaming ingest embedder loads as its broadcast index.
    */
  private[graft] def chunkCentIndexFor(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val ft = chunkFeaturesFor(spark, dir)
    val cents = ft.select("cid").distinct()
      .orderBy(Tables.portableHash(col("cid").cast("string")), col("cid"))
      .limit(FhCentroids)
      .select(col("cid").as("cent_id"))
    val cf = ft.join(broadcast(cents), ft("cid") === cents("cent_id"))
      .select(col("cent_id"), col("b"), col("v").as("cv"))
    val n2c = ft.groupBy("cid").agg(sum(col("v") * col("v")).as("n2c"))
      .join(broadcast(cents), col("cid") === col("cent_id"))
      .select("cent_id", "n2c")
    (cf, n2c)
  }

  def chunkEmbedIndex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ft = chunkFeaturesFor(spark, dir)
    val n2 = ft.groupBy("cid").agg(sum(col("v") * col("v")).as("n2"))
    val cents = ft.select("cid").distinct()
      .orderBy(Tables.portableHash(col("cid").cast("string")), col("cid"))
      .limit(FhCentroids)
      .select(col("cid").as("cent_id"))
    val cf = ft.join(broadcast(cents), ft("cid") === cents("cent_id"))
      .select(col("cent_id"), col("b"), col("v").as("cv"))
    val dots = ft.join(broadcast(cf), "b")
      .groupBy("cid", "cent_id").agg(sum(col("v") * col("cv")).as("dot"))
    val wTop = Window.partitionBy(col("cid"))
      .orderBy((col("dot") / (sqrt(col("n2q")) * sqrt(col("n2c")))).desc,
        col("cent_id"))
    val n2c = n2.join(broadcast(cents), n2("cid") === cents("cent_id"))
      .select(col("cent_id"), col("n2").as("n2c"))
    dots
      .join(n2.select(col("cid"), col("n2").as("n2q")), "cid")
      .join(broadcast(n2c), "cent_id")
      .withColumn("rk", row_number().over(wTop)).where(col("rk") === 1)
      // (doc_id, chunk_idx) recovered arithmetically from the cid encoding
      // (cid = doc_id · ChunkIdSpan + chunk_idx, chunk_idx < ChunkIdSpan by
      // construction) — the former join back to the chunk-window relation
      // recomputed the whole windowing pipeline just to re-attach two
      // derivable columns.
      .select(expr(s"cid div $ChunkIdSpan").as("doc_id"),
        (col("cid") % ChunkIdSpan).as("chunk_idx"), col("cid"),
        col("cent_id"), col("dot"), col("n2q"))
      .orderBy("cid")
  }

  /** Adjacent byte-pair frequencies — the statistic the first BPE merge
    * step maximizes: over every corpus word, count all 2-char windows and
    * rank the top 30. The tokenizer-training primitive (each BPE round
    * recounts pairs over the current symbol sequence; this is round 0 over
    * characters, the dominant-cost round at corpus scale).
    *
    * One explode + one map-side-combined aggregation; the pair space is
    * bounded by charset² (≤ a few thousand keys), so the shuffle carries
    * per-partition partial counts of a tiny key set regardless of corpus
    * size, and top-k plans as TakeOrdered, never a global sort.
    */
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(word) - 1), i -> substr(word, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("pair")).limit(30)

  /** Number of BPE merge rounds [[bpeVocabFor]] learns and applies. Bounded
    * and fixed so the oracle can replay the training as a finite CTE chain;
    * production tokenizers run tens of thousands of rounds of the same
    * per-round shape.
    */
  private[graft] val BpeMergeRounds = 8

  /** Symbol-extraction regex shared by every merge round: a tokenized word
    * is its symbols each wrapped in angle brackets (`spark` →
    * `<s><p><a><r><k>`), characters the corpus never contains, so a literal
    * `replace` of `<a><b>` → `<ab>` can never match across a symbol
    * boundary, and left-to-right non-overlapping `replace` semantics (both
    * engines) are exactly greedy BPE merge application.
    */
  private[graft] val BpeSymRe = "<([a-z0-9]+)>"

  /** BPE training + application over the word-type table: [[BpeMergeRounds]]
    * rounds of (count adjacent symbol pairs weighted by word frequency →
    * take the most frequent pair, count-desc then pair-asc → merge it
    * everywhere), then the per-word token count under the learned vocab.
    * Output: word, n (corpus frequency), wl (chars), wt (BPE tokens).
    *
    * This is the step [[bpePairs]] is round 0 of — and the operator that
    * turns every downstream token-budget number from a whitespace proxy
    * into counts under an actual learned tokenizer ([[Curation.tokenBudget]]
    * consumes it).
    *
    * Scale shape: training runs on the TYPE table weighted by frequency
    * (vocab ≪ corpus — the standard trick), so each round is one
    * map-side-combined aggregation over the type relation plus a 1-row
    * TakeOrdered; the learned merge is a broadcast 1-row relation feeding a
    * codegen'd literal `replace` — the model parameter never touches the
    * driver. `localCheckpoint` per round keeps the 8-round lineage flat
    * (the [[Ranking]] precedent); a cluster deployment would persist the
    * round state to the shared memo store instead. Application to the
    * corpus is one join on the word key — shuffle-sized by the type table,
    * which AQE broadcasts when small.
    */
  /** The learned MERGE TABLE itself — (ord, pat, rep), one row per
    * training round in application order — memoized as its own artifact.
    * This is the tokenizer's model file: the streaming ingest funnel
    * broadcasts it and replays the same `replace` fold per arriving word
    * ([[graft.streaming.StreamingOps.curationFunnelStream]]), and
    * [[bpeVocabFor]] replays it over the type table. Training runs here
    * (the rounds are the cost; the vocab replay is one pass), and the
    * merges accumulate as a UNION of the per-round 1-row winners — the
    * model parameter never touches the driver.
    */
  private[graft] def bpeMergesFor(spark: SparkSession, dir: String): DataFrame =
    Materialized.of(spark, s"bpemerges:$dir") {
      var vocab = unigramCountsFor(spark, dir)
        .select(col("t").as("word"), col("n"),
          regexp_replace(col("t"), "(.)", "<$1>").as("st"))
        .localCheckpoint(true)
      var merges: DataFrame = null
      for (k <- 1 to BpeMergeRounds) {
        val pairs = vocab
          .select(col("n"),
            expr(s"regexp_extract_all(st, '$BpeSymRe', 1)").as("sy"))
          .where(size(col("sy")) >= 2)
          .select(col("n"), explode(expr(
            """transform(sequence(1, size(sy) - 1),
              |  i -> named_struct('pa', element_at(sy, i),
              |                    'pb', element_at(sy, i + 1)))""".stripMargin))
            .as("p"))
          .select(col("n"), col("p.pa").as("pa"), col("p.pb").as("pb"))
        val top = pairs.groupBy("pa", "pb").agg(sum(col("n")).as("np"))
          .orderBy(col("np").desc, col("pa"), col("pb")).limit(1)
          .select(lit(k.toLong).as("ord"),
            concat(lit("<"), col("pa"), lit("><"), col("pb"), lit(">")).as("pat"),
            concat(lit("<"), col("pa"), col("pb"), lit(">")).as("rep"))
          .localCheckpoint(true)
        merges = if (merges == null) top else merges.unionAll(top)
        vocab = vocab.crossJoin(broadcast(top.select("pat", "rep")))
          .withColumn("st", expr("replace(st, pat, rep)"))
          .select("word", "n", "st")
          .localCheckpoint(true)
      }
      // Refuse to serve a degenerate model: a corpus too small to yield a
      // pair in some round leaves that round's 1-row winner EMPTY, and the
      // two consumers then disagree — the vocab replay's per-round
      // crossJoin empties the vocab, while the array-fold encoder
      // ([[bpeTokenCountExpr]]) silently skips the absent round and keeps
      // counting. Fail loudly here (8 cheap checkpointed rows) instead of
      // letting batch and streaming token counts diverge downstream.
      val got = merges.count()
      require(got == BpeMergeRounds.toLong,
        s"BPE training produced $got of $BpeMergeRounds merge rounds — " +
          "corpus too small for the fixed-round model; vocab replay and " +
          "array-fold encoding would diverge on the absent rounds")
      merges
    }

  private[graft] def bpeVocabFor(spark: SparkSession, dir: String): DataFrame =
    Materialized.of(spark, s"bpevocab:$dir") {
      val merges = bpeMergesFor(spark, dir)
      // replay the learned merges in order over the type table — one
      // projection pass, 8 chained 1-row broadcast crossJoins; an absent
      // round (corpus too small to yield a pair) empties the vocab,
      // matching the former in-loop semantics exactly
      var vocab = unigramCountsFor(spark, dir)
        .select(col("t").as("word"), col("n"),
          regexp_replace(col("t"), "(.)", "<$1>").as("st"))
      for (k <- 1 to BpeMergeRounds) {
        vocab = vocab.crossJoin(broadcast(
            merges.where(col("ord") === k).select("pat", "rep")))
          .withColumn("st", expr("replace(st, pat, rep)"))
          .select("word", "n", "st")
      }
      vocab.select(col("word"), col("n"),
        length(col("word")).cast("long").as("wl"),
        size(expr(s"regexp_extract_all(st, '$BpeSymRe', 1)")).cast("long").as("wt"))
    }

  /** The learned merge table as a query surface: (ord, pat, rep) in
    * application order — the tokenizer model artifact itself, driver-
    * checked against the oracle's per-round argmax replay. K rows total
    * ([[BpeMergeRounds]]); the training cost lives in the memoized
    * [[bpeMergesFor]] build.
    */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMergesFor(spark, dir).orderBy("ord")

  /** Per-row BPE token count under a broadcast merge array — the SHARED
    * Column expression the streaming funnel and its batch twin both use:
    * split `textCol` on spaces, wrap each word's chars in symbol brackets,
    * left-fold the ordered merges with literal `replace` (exactly the
    * [[bpeVocabFor]] application), and count the resulting symbols.
    * `msCol` is an array<struct<ord,pat,rep>> column (one broadcast row
    * from [[bpeMergesFor]], ordered by `ord`).
    */
  private[graft] def bpeTokenCountExpr(textCol: String, msCol: String): org.apache.spark.sql.Column =
    expr(
      s"""aggregate(split($textCol, ' '), 0L, (acc, w) ->
         |  acc + size(regexp_extract_all(
         |    aggregate($msCol, regexp_replace(w, '(.)', '<$$1>'),
         |              (st, m) -> replace(st, m.pat, m.rep)),
         |    '$BpeSymRe', 1)))""".stripMargin)

  /** Per-document token counts under the learned BPE vocab: whitespace
    * words joined to [[bpeVocabFor]], so `n_bpe_tokens` is what the
    * 8-round tokenizer actually emits (chars = round-0 count shown beside
    * it). One explode + one key join + one aggregation.
    */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(bpeVocabFor(spark, dir).select("word", "wl", "wt"), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("wl")).as("n_char_tokens"),
        sum(col("wt")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Calibration of the corpus-LM fluency score against the rule-based
    * quality gate: documents ranked by [[docFluency]] mean score into
    * deciles (distributed global rank), each decile reporting how often
    * the [[qualityFilter]] rules say `keep`. The report that says whether
    * a learned/statistical quality score AGREES with the hand rules — and
    * where in the score range they diverge — before anyone swaps a
    * threshold for a classifier. Inner-joined on fluency coverage (docs
    * with ≥ 2 words); deciles via [[Ranking.withGlobalRowNumber]].
    */
  def qualityCalib(spark: SparkSession, dir: String): DataFrame = {
    val flu = docFluency(spark, dir).select(col("doc_id"), col("mean_score"))
    val keep = qualityFilter(spark, dir).select(col("doc_id"), col("keep"))
    val d = flu.join(keep, "doc_id")
    val (ranked, n) = Ranking.withGlobalRowNumber(
      d, "rn", col("mean_score"), col("doc_id"))
    ranked
      .withColumn("decile", expr(s"(rn - 1) * 10 div ${math.max(n, 1L)}"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_keep"),
        min(col("mean_score")).as("min_score"),
        max(col("mean_score")).as("max_score"))
      .withColumn("keep_permille", expr("n_keep * 1000 div n_docs"))
      .select("decile", "n_docs", "n_keep", "keep_permille",
        "min_score", "max_score")
      .orderBy("decile")
  }

  /** Tokenizer fertility by language — tokens-per-word and chars-per-token
    * from the LEARNED BPE vocab ([[bpeVocabFor]]), per language slice: the
    * standard multilingual-tokenizer equity report (a language whose
    * fertility runs high pays more sequence length for the same content,
    * and its token budget underestimates its text). Composes the
    * [[bpeEncode]] per-doc relation with the documents `lang` column; one
    * join + one languages-sized aggregation.
    */
  def bpeFertility(spark: SparkSession, dir: String): DataFrame =
    bpeEncode(spark, dir)
      .join(Tables.load(spark, dir, "documents").select("doc_id", "lang"),
        "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("sum_words"),
        sum(col("n_bpe_tokens")).as("sum_bpe"),
        sum(col("n_char_tokens")).as("sum_chars"))
      .withColumn("fertility_permille", expr("sum_bpe * 1000 div sum_words"))
      .withColumn("chars_per_token_milli",
        expr("sum_chars * 1000 div sum_bpe"))
      .orderBy("lang")

  /** Zipf rank–frequency table: corpus term frequencies ranked, with the
    * rank×frequency product (≈ constant under Zipf's law — the standard
    * corpus sanity check before training). One hash aggregation; the rank
    * window runs over the aggregated term relation (vocabulary-sized, tiny
    * by construction at any corpus scale).
    */
  def zipfTerms(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("term"))
    unigramCountsFor(spark, dir)
      .select(col("t").as("term"), col("n").as("freq"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("rank_x_freq", col("rank") * col("freq"))
      .where(col("rank") <= 30)
      .select("rank", "term", "freq", "rank_x_freq")
      .orderBy("rank")
  }

  /** Collocation mining: top word bigrams by an integer PMI proxy
    * `n_ab · N · 100 ÷ (n_a · n_b)` — monotone in pointwise mutual
    * information with no cross-engine float log. Two hash aggregations
    * (bigram and unigram counts) + joins on word keys; the top-k is a
    * TakeOrdered over the vocabulary²-bounded bigram relation, not a full
    * sort. (Integer range: safe while n_ab·N·100 < 2⁶³, i.e. corpora under
    * ~10⁹ tokens per partition-disjoint count — beyond that, scale the
    * constant down.)
    */
  def bigramPmi(spark: SparkSession, dir: String): DataFrame = {
    val bigrams = docBigramsFor(spark, dir)
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val unigrams = unigramCountsFor(spark, dir)
    val total = unigrams.agg(sum(col("n")).as("n_total"))
    bigrams
      .join(unigrams.select(col("t").as("a"), col("n").as("n_a")), "a")
      .join(unigrams.select(col("t").as("b"), col("n").as("n_b")), "b")
      .crossJoin(broadcast(total))
      .select(concat_ws(" ", col("a"), col("b")).as("bigram"),
        col("n_ab"), col("n_a"), col("n_b"),
        expr("n_ab * n_total * 100 div (n_a * n_b)").as("score"))
      .orderBy(col("score").desc, col("bigram"))
      .limit(20)
  }

  /** Document fingerprints: min rolling (5-gram) content hash — the
    * winnowing-style representative — plus the 63-bit simhash and a prefix
    * hash. Join any two of these to bucket candidate duplicates at scale.
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    // min gram hash as a pure array expression: array_min over per-gram
    // hashes — zero shuffle (the explode+groupBy form moved one row per
    // 5-gram through an aggregation for a per-doc min the map side can
    // compute alone). prefix_hash rides the same scan.
    val w = split(col("text"), " ")
    val gramArr = when(size(w) >= 5,
      transform(sequence(lit(1), size(w) - 4),
        i => concat_ws(" ", slice(w, i, lit(5)))))
      .otherwise(array(concat_ws(" ", w)))
    val mapSide = d.select(col("doc_id"),
      array_min(transform(gramArr, g => Tables.portableHash(g))).as("min_gram_hash"),
      Tables.portableHash(concat_ws(" ", slice(w, 1, 8))).as("prefix_hash"))
    val sim = Dedup.simhashesFor(spark, dir)
    mapSide.join(sim, "doc_id")
      .select("doc_id", "min_gram_hash", "simhash", "prefix_hash")
      .orderBy("doc_id")
  }

  /** Per-document fluency proxy from corpus bigram statistics: the mean
    * integer PMI score of the document's word bigrams (`n_ab·N·100 ÷
    * (n_a·n_b)` — the [[bigramPmi]] collocation score) — a tiny
    * corpus-grounded language model standing in for the LM-perplexity
    * quality gate of an LLM curation pipeline (low mean score = improbable
    * word transitions). Shuffle story: corpus unigram/bigram tables are
    * the same two aggregations bigramPmi builds; the per-doc score is one
    * join keyed by bigram + one groupBy(doc). Everything integer — the
    * oracle hash-matches.
    */
  def docFluency(spark: SparkSession, dir: String): DataFrame = {
    val docBigrams = docBigramsFor(spark, dir)
    val bigrams = docBigrams.groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val unigrams = unigramCountsFor(spark, dir)
    val total = unigrams.agg(sum(col("n")).as("n_total"))
    val scored = docBigrams
      .join(bigrams, Seq("a", "b"))
      .join(unigrams.select(col("t").as("a"), col("n").as("n_a")), "a")
      .join(unigrams.select(col("t").as("b"), col("n").as("n_b")), "b")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), expr("n_ab * n_total * 100 div (n_a * n_b)").as("s"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("sum_score"))
      .withColumn("mean_score", expr("sum_score div n_bigrams"))
      .orderBy("doc_id")
  }

  /** Per-source document-length percentiles (p50/p90 word counts) via the
    * exact rank-at-position technique — the corpus length report a
    * dataset card ships. One window partitioned by source.
    */
  def lengthPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_words"))
    val d = Tables.load(spark, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_words"))
    val counts = d.groupBy("source").agg(count(lit(1)).as("n"))
    d.withColumn("rn", row_number().over(w))
      .join(broadcast(counts), "source")
      .groupBy("source")
      .agg(min(col("n")).as("n_docs"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("n_words"))).as("p50_words"),
        min(when(col("rn") === expr("(9 * n + 9) div 10"), col("n_words"))).as("p90_words"),
        sum(col("n_words")).as("total_words"))
      .orderBy("source")
  }

  /** Gopher-style repetition signal: per-document duplicate 3-gram
    * fraction (plus duplicate-word fraction). Entirely map-side array
    * expressions — zero shuffle before the final order — so at 100 TB this
    * is pure scan throughput like the other text gates.
    */
  def dupNgramFraction(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val w = split(col("text"), " ")
    val grams = transform(sequence(lit(1), size(col("w")) - 2),
      i => concat_ws(" ", slice(col("w"), i, lit(3))))
    // sub-3-word docs stay in the report (dup_word_pct is well-defined
    // for them — "spam spam" is maximal repetition); their gram columns
    // are zero, with the pct guarded against the 0 denominator
    d.select(col("doc_id"), w.as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct_words"),
        when(size(col("w")) >= 3, grams)
          .otherwise(array().cast("array<string>")).as("g"))
      .select(col("doc_id"), col("n_words"), col("n_distinct_words"),
        size(col("g")).cast("long").as("n_grams"),
        (size(col("g")) - size(array_distinct(col("g")))).cast("long")
          .as("n_dup_grams"))
      .withColumn("dup_word_pct",
        expr("(100 * (n_words - n_distinct_words)) div n_words"))
      .withColumn("dup_gram_pct",
        when(col("n_grams") > 0, expr("(100 * n_dup_grams) div n_grams"))
          .otherwise(lit(0L)))
      .orderBy("doc_id")
  }

  /** Count-min sketch depth (independent hash rows) and width (counters
    * per row) — CONSTANTS: the sketch is D·W int64 counters at any corpus
    * size (production widens W to ~2⁄ε; 4×256 is sized to the test
    * corpus's token cardinality).
    */
  private[graft] val CmsD = 4
  private[graft] val CmsW = 256L

  /** Count-min sketch accuracy contract over corpus tokens: build the
    * D×W sketch (each token increments one counter per hash row, salted
    * portable hashes), then estimate the exact top-20 tokens' counts as
    * the MIN over their D counters and report the overestimate in
    * permille. The CMS guarantee — estimates never undercount, and
    * overcount by ≤ εN with high probability — becomes a hash-checked
    * number per heavy hitter, the `q_approx_distinct`/`q_approx_quantile`
    * accuracy-contract pattern applied to the one classic sketch the
    * family lacked.
    *
    * Scale shape: one token scan ×D (map-side-combined into ≤ D·W
    * counter rows), a distributed TakeOrdered for the exact top-20, and
    * broadcast joins of the 1024-row sketch — linear in corpus size,
    * constant-size state, trivially streamable (the counters are pure
    * additive state).
    */
  /** The salted CMS bucket expression — ONE home shared by the batch
    * sketch, the streaming counter twin, and (via portableHashSql) the
    * oracle, so the three cannot drift.
    */
  private[graft] def cmsBucket(r: Column, w: Column): Column =
    Tables.portableHash(concat(lit("cms"), r.cast("string"), lit(":"), w)) % CmsW

  def cmsHitters(spark: SparkSession, dir: String): DataFrame = {
    // Both legs ride the memoized unigram counts (round 19): the former
    // shape scanned + split() the corpus TWICE (once per `toks`
    // reference — sketch and exact top-20), and exploded every token
    // OCCURRENCE ×D into the sketch aggregation. Counter math is
    // identical on pre-aggregated counts — c(r, b) = Σ_w n(w)·[bucket_r(w)=b]
    // — so the sketch now aggregates |vocab|·D weighted rows off a
    // parquet memo instead of |tokens|·D exploded rows off two raw scans.
    val uni = unigramCountsFor(spark, dir)
      .select(col("t").as("w"), col("n"))
    val rowIds = array((0 until CmsD).map(lit): _*)
    val sketch = uni.select(explode(rowIds).as("r"), col("w"), col("n"))
      .select(col("r").cast("long").as("r"),
        cmsBucket(col("r"), col("w")).as("b"), col("n"))
      .groupBy("r", "b").agg(sum(col("n")).as("c"))
    val top = uni.select(col("w"), col("n").as("n_exact"))
      .orderBy(col("n_exact").desc, col("w")).limit(20)
    top.select(col("w"), col("n_exact"), explode(rowIds).as("r"))
      .select(col("w"), col("n_exact"), col("r").cast("long").as("r"))
      .withColumn("b", cmsBucket(col("r"), col("w")))
      .join(broadcast(sketch), Seq("r", "b"))
      .groupBy("w", "n_exact").agg(min(col("c")).as("n_est"))
      .select(col("w"), col("n_exact"), col("n_est"),
        expr("(n_est - n_exact) * 1000 div n_exact").as("over_permille"))
      .orderBy(col("n_exact").desc, col("w"))
  }
}
