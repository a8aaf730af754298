package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.core.{LinkedMsg, Msg}
import graft.operators._
import graft.sources.Tables
import graft.streaming.{Pipeline, StreamingChainLink}

/** The user-facing facade: everything a user of the reference pipeline
  * (`rongg10/SimPy--Kafka--Flink--Kafka`) runs today, plus the
  * training-data-pipeline extensions, behind one object.
  *
  * {{{
  * val spark = Engine.session()               // tuned local session
  * val linked = Engine.chainLink(spark, dir)  // batch call-graph enrichment
  * Engine.runKafkaJob(spark, "broker:9092", "/ckpt")  // the streaming job
  * }}}
  */
object Engine {

  /** A session tuned the way the engine expects (AQE, RocksDB state store
    * for transformWithState, UTC, custom SQL functions registered).
    */
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Join-strategy ladder (round 19): broadcast when a side fits the
      // auto threshold, SHUFFLED-HASH when a side's per-partition build
      // fits local memory, sort-merge only as the spill-safe fallback —
      // the standard "prefer hash, keep SMJ for the unbounded case"
      // configuration. Sort-merge pays a full sort of BOTH inputs; for
      // this engine's hot joins (candidate relations against the normed
      // corpus, 2-hop pair expansions) the big side's sort is pure
      // overhead the hash build avoids. The planner's size conditions
      // (autoBroadcastJoinThreshold × shuffle partitions) bound the hash
      // build per partition, so the 100 TB case degrades to SMJ exactly
      // where it must. Replaces per-call SHUFFLE_HASH hints, which
      // overrode the broadcast choice at small scales.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // Scan-split floor: Spark's split size is max(openCostInBytes,
      // totalBytes/parallelism) capped at maxPartitionBytes, and the 4 MiB
      // default floor leaves a snappy-parquet text/embedding table of a few
      // MiB — which decompresses and explodes into orders of magnitude more
      // work than its file size suggests — on 1-2 tasks. 128 KiB lets small
      // CPU-dense tables split down to their row groups while leaving large
      // tables governed by bytes-per-core exactly as before. The 100 TB
      // deployment tunes the same lever from the other end
      // (spark.sql.files.maxPartitionBytes, SCALING.md).
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      // AQE plans shuffles WIDE and coalesces them after seeing the real
      // sizes: 2× the static width as the starting partition count keeps
      // big intermediate shuffles (the link enrichment's 2·|links| fold,
      // the LSH band join) under the per-task memory that triggers
      // hash-agg spill at the sf10 decade, while small shuffles coalesce
      // right back — the standard scale lever, free when AQE is on. 8×
      // was tried and REJECTED: range-partitioned exchanges (global
      // ranks, packing, train order) paid ~0.6 s per query in sampling +
      // tiny-task overhead at sf0.1, a uniform 2.5× on six sub-second
      // window queries; 2× keeps the sf10 relief without the tax. A
      // 1000-executor deployment sizes this from bytes-per-partition
      // targets instead (SCALING.md).
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (shufflePartitions * 2).toString)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    graft.functions.GraftFunctions.register(s)
    s
  }

  // ---- reference surface: batch personality ----

  /** The messages table derived from a testdata dir (FIXTURES.md §3). */
  def msgs(spark: SparkSession, dir: String): DataFrame = Tables.msgs(spark, dir)

  /** Enrich messages with parents/children arrays (the reference's output). */
  def chainLink(spark: SparkSession, dir: String): DataFrame =
    ChainLink.chainLink(spark, dir)

  /** Raw parent→child link pairs (banded interval-containment self-join). */
  def linkPairs(msgs: DataFrame): DataFrame = ChainLink.links(msgs)

  // ---- reference surface: streaming personality ----

  /** Chain-link a stream of messages (any source). */
  def chainLinkStream(msgs: Dataset[Msg], maxOutOfOrder: String = "30 seconds")
      : Dataset[LinkedMsg] =
    StreamingChainLink.linked(msgs, maxOutOfOrder)

  /** Idle-flush personality (reference 60 s processing-time flush): bounded
    * replays emit their full tail; see [[streaming.ProcTimeChainLink]].
    */
  def chainLinkStreamIdleFlush(msgs: Dataset[Msg], maxOutOfOrderMs: Long = 30000L,
      idleFlushMs: Long = 60000L): Dataset[LinkedMsg] =
    streaming.ProcTimeChainLink.linked(msgs, maxOutOfOrderMs, idleFlushMs)

  /** The full Kafka→link→Kafka job (reference `simpy_kafka_reader.main`). */
  def runKafkaJob(spark: SparkSession, bootstrapServers: String,
      checkpointLocation: String): StreamingQuery =
    Pipeline.runKafkaJob(spark, bootstrapServers, checkpointLocation)

  /** The same topology over JSON-lines files (no broker needed). */
  def runFileJob(spark: SparkSession, inDir: String, outDir: String,
      checkpointLocation: String): StreamingQuery =
    Pipeline.runFileJob(spark, inDir, outDir, checkpointLocation)

  /** Lenient wire-format parse (reference `parse_message` semantics). */
  def parseMsgs(raw: Dataset[String]): Dataset[Msg] = Pipeline.parseMsgs(raw)

  // ---- training-data pipeline extensions ----

  /** Exact dedup survivors by content hash. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupExact(spark, dir)

  /** MinHash-LSH near-duplicate pairs (Jaccard ≥ 0.8, verified). */
  def nearDuplicates(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupMinhash(spark, dir)

  /** Incremental ingest dedup: incoming-shard docs classified against the
    * already-ingested corpus (corpus_dup / shard_dup / unique).
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.incrementalDedup(spark, dir)

  /** Exact top-k cosine neighbors for the sampled query set. */
  def annTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.annTopk(spark, dir)

  /** IVF-bucketed approximate nearest neighbors (the scale path). */
  def annIvf(spark: SparkSession, dir: String): DataFrame =
    Similarity.annIvf(spark, dir)

  /** Embedding near-dup pairs through the IVF index (cos ≥ 0.40). */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupEmbedding(spark, dir)

  /** Symmetric int8 scalar quantization of the embedding column. */
  def vectorQuantize(spark: SparkSession, dir: String): DataFrame =
    Similarity.vectorQuantize(spark, dir)

  /** Gopher/C4-style quality gates with per-doc first-failing-rule audit. */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.qualityFilter(spark, dir)

  /** Per-document stats, quality score, language id, fingerprints. */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.textStats(spark, dir)

  /** As-of join: purchases to the most recent prior view per user. */
  def asofLastView(spark: SparkSession, dir: String): DataFrame =
    Analytics.asofLastView(spark, dir)

  /** Exact per-group quantiles (engine-portable percentile_disc). */
  def quantityPercentiles(spark: SparkSession, dir: String): DataFrame =
    Analytics.quantityPercentiles(spark, dir)

  /** Random-hyperplane LSH cosine near-neighbor pairs (verified). */
  def lshCosine(spark: SparkSession, dir: String): DataFrame =
    Analytics.lshCosine(spark, dir)

  /** Banded interval-overlap partner counts per message. */
  def overlapCount(spark: SparkSession, dir: String): DataFrame =
    Analytics.overlapCount(spark, dir)

  /** Deterministic train/val/test split assignment (pure map, no shuffle). */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    operators.Curation.splitAssign(spark, dir)

  /** Benchmark n-gram decontamination flags per document. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    operators.Curation.decontaminate(spark, dir)

  /** Near-dup clusters (connected components over the Jaccard pair graph). */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    operators.Curation.dedupClusters(spark, dir)

  /** Two unrolled integer-PageRank iterations over the trace graph. */
  def pageRank(spark: SparkSession, dir: String): DataFrame =
    Graph.pageRank(spark, dir)

  /** Triangle participation per part over the order co-occurrence graph. */
  def triangles(spark: SparkSession, dir: String): DataFrame =
    Graph.triangles(spark, dir)

  /** Bloom-prefiltered exact semi-join (runtime-filter pattern). */
  def bloomSemiRevenue(spark: SparkSession, dir: String): DataFrame =
    RuntimeFilter.bloomSemiRevenue(spark, dir)

  /** Per-user longest consecutive-day activity streaks. */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame =
    Analytics.activityStreaks(spark, dir)

  /** Gopher-style duplicate n-gram / duplicate word repetition signals. */
  def dupNgramFraction(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.dupNgramFraction(spark, dir)

  /** MinHash sketch-accuracy report (estimate vs exact Jaccard per pair). */
  def minhashAccuracy(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashAccuracy(spark, dir)

  /** IVF index health: per-centroid bucket sizes and corpus share. */
  def ivfStats(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfStats(spark, dir)

  /** Temperature-scaled training-mixture resampling per source. */
  def sourceMixture(spark: SparkSession, dir: String): DataFrame =
    operators.Curation.sourceMixture(spark, dir)

  /** Corpus packing: documents kept up to a total token budget. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame =
    operators.Curation.tokenBudget(spark, dir)

  /** Streaming MinHash-LSH near-dup dedup: keep/drop verdicts for a
    * document stream (two-stage chained stateful topology; deterministic
    * (ts, doc_id)-order contract, checkpoint-recoverable).
    */
  def minhashDedupStream(docs: DataFrame, maxOutOfOrder: String = "30 seconds")
      : Dataset[graft.streaming.DedupVerdict] =
    graft.streaming.StreamingDedup.minhashDedupStream(docs, maxOutOfOrder)

  /** Idle-flush variant: bounded replays emit every verdict, no sentinel. */
  def minhashDedupStreamProcTime(docs: DataFrame, idleFlushMs: Long = 60000L)
      : Dataset[graft.streaming.DedupVerdict] =
    graft.streaming.StreamingDedup.minhashDedupStreamProcTime(docs, idleFlushMs)

  /** Streaming corpus-probe dedup: arriving docs' shingle hashes probe the
    * static corpus posting lists; emits the Jaccard ≥ 0.5 drop list.
    */
  def corpusProbeDedupStream(docShingles: DataFrame, postings: DataFrame,
      candSizes: DataFrame): DataFrame =
    graft.streaming.StreamingOps.corpusProbeDedupStream(
      docShingles, postings, candSizes)

  /** Corpus-grounded per-document fluency gate (mean bigram PMI). */
  def docFluency(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.docFluency(spark, dir)

  /** Hot-key diagnostics: top join keys with permille share. */
  def hotKeys(spark: SparkSession, dir: String): DataFrame =
    Skew.hotKeys(spark, dir)

  /** Stable per-source exemplar documents (dataset-card sampling). */
  def exemplars(spark: SparkSession, dir: String): DataFrame =
    operators.Curation.exemplars(spark, dir)

  /** Register all tables + the msgs view for arbitrary spark.sql. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    SqlApi.registerAll(spark, dir)

  /** Gap sessionization via the native merging session_window. */
  def nativeSessions(spark: SparkSession, dir: String): DataFrame =
    ChainLink.nativeSessions(spark, dir)

  /** What-if candidate-density report for a pinned band width. */
  def bandStats(spark: SparkSession, dir: String): DataFrame =
    ChainLink.bandStats(spark, dir)

  /** Peak concurrent calls per destination IP (sweep-line). */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame =
    ChainLink.peakConcurrency(spark, dir)

  /** The four curation gates composed into one survivors-per-stage report. */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame =
    operators.Curation.curationFunnel(spark, dir)

  /** Robust MAD outlier report per event type. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame =
    Analytics.madOutliers(spark, dir)

  /** Cluster-vs-label purity per IVF bucket. */
  def ivfLabelPurity(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfLabelPurity(spark, dir)

  /** IVF ANN over the k-means-refined centroid table (2 Lloyd steps). */
  def annIvfKmeans(spark: SparkSession, dir: String): DataFrame =
    Similarity.annIvfKmeans(spark, dir)

  /** Product-quantization ADC top-k search (8×8-dim codebooks). */
  def pqSearch(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqSearch(spark, dir)

  /** Side-by-side recall: hash-min vs k-means IVF vs exact truth. */
  def annRecallKmeans(spark: SparkSession, dir: String): DataFrame =
    Dedup.annRecallKmeans(spark, dir)

  /** Hot-key join with exact plain-join semantics, salted `salt` ways. */
  def saltedJoinPriority(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedJoinPriority(spark, dir)

  /** Streaming per-window source length-drift monitor vs a fixed
    * 16-bucket permille baseline (continuous form of `q_source_drift`).
    */
  def sourceDriftStream(docs: DataFrame, baseline: Seq[Long]): DataFrame =
    graft.streaming.StreamingOps.sourceDriftStream(docs, baseline)

  /** Streaming IVF bucket assignment against the static centroid table
    * (stateless per-row argmax; identical semantics to the batch build).
    */
  def ivfAssignStream(stream: DataFrame, cents: DataFrame): DataFrame =
    graft.streaming.StreamingOps.ivfAssignStream(stream, cents)

  /** Write a bucketed+sorted table: pay the shuffle once at ingest, then
    * every join/agg on the bucket key is Exchange-free.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    sources.Bucketing.writeBucketed(df, table, key, buckets)

  /** Per-source boilerplate (cross-document repeated n-gram) contamination. */
  def boilerplateGrams(spark: SparkSession, dir: String): DataFrame =
    operators.Corpus.boilerplateGrams(spark, dir)

  /** Pairwise cross-source n-gram containment (shared-upstream detection). */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    operators.Corpus.sourceOverlap(spark, dir)

  /** Per-source length-distribution drift vs the corpus (permille L1). */
  def sourceDrift(spark: SparkSession, dir: String): DataFrame =
    operators.Corpus.sourceDrift(spark, dir)

  /** LPT-striped packing into token-balanced training shards. */
  def packBins(spark: SparkSession, dir: String): DataFrame =
    operators.Corpus.packBins(spark, dir)

  /** Per-document n-gram novelty in corpus order. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame =
    operators.Corpus.ngramNovelty(spark, dir)

  /** Truncation-duplicate pairs (full-text prefix containment). */
  def prefixDups(spark: SparkSession, dir: String): DataFrame =
    operators.Corpus.prefixDups(spark, dir)

  /** Seed-vs-Lloyd-refined centroid drift (cosine permille per cell). */
  def centroidDrift(spark: SparkSession, dir: String): DataFrame =
    operators.Clustering.centroidDrift(spark, dir)

  /** Size-biased priority sample (weighted bottom-k) per source. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame =
    operators.Curation.weightedSample(spark, dir)

  /** Sub-document (asymmetric containment) duplicate pairs. */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    operators.Dedup.containmentPairs(spark, dir)

  /** SCD-2 validity intervals from the event changelog. */
  def scd2(spark: SparkSession, dir: String): DataFrame =
    operators.Relational.qScd2(spark, dir)

  /** Zone-map (data-skipping) statistics and pruning audit. */
  def zonemapPrune(spark: SparkSession, dir: String): DataFrame =
    operators.Relational.qZonemapPrune(spark, dir)

  /** Fixed-window training chunks with overlap, per document. */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    operators.TextAnalysis.chunkDocs(spark, dir)

  /** Adjacent byte-pair frequencies (the BPE round-0 statistic). */
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    operators.TextAnalysis.bpePairs(spark, dir)

  /** Recall@5 of the PQ/ADC search vs the exact top-5 baseline. */
  def pqRecall(spark: SparkSession, dir: String): DataFrame =
    operators.Similarity.pqRecall(spark, dir)

  /** Streaming quality gate (batch verdict at ingest; stateless). */
  def qualityGateStream(docs: DataFrame): DataFrame =
    streaming.StreamingOps.qualityGateStream(docs)

  /** All named queries (the driver contract). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = SparkEntry.queries
}
