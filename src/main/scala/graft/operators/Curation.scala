package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Training-data curation operators — the steps between "raw corpus" and
  * "training shards" that a 100 TB pipeline runs after dedup ([[Dedup]]) and
  * quality scoring ([[TextAnalysis]]): deterministic split assignment,
  * stratified sampling, benchmark decontamination, and near-duplicate
  * clustering (connected components over the near-dup pair graph).
  *
  * Everything is hash-deterministic (no `rand()`): assignments survive task
  * retry, re-runs, and engine changes, because they derive from
  * [[Tables.portableHash]] over stable ids — the property that makes a split
  * reproducible across the fleet and auditable by an external engine
  * (the DuckDB oracle reproduces every assignment bit-for-bit).
  */
object Curation {

  /** Per-source dedup report — the pipeline-health summary a curation run
    * publishes: document count, exact-duplicate docs (md5 group size > 1),
    * and near-duplicate docs (appearing in any Jaccard ≥ 0.5 pair) per
    * source. Composes [[Dedup]]'s memoized machinery; every count is one
    * hash aggregation over already-bounded relations.
    */
  def dupRateBySource(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    val dupGroups = d.groupBy("h").agg(count(lit(1)).as("copies"))
      .where(col("copies") > 1).select("h")
    val exactDup = d.join(dupGroups, "h").select("doc_id").distinct()
      .withColumn("is_exact", lit(1L))
    val pairs = Dedup.dedupNgram(spark, dir)
    val nearDup = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b")))
      .distinct().withColumn("is_near", lit(1L))
    d.select("doc_id", "source")
      .join(exactDup, Seq("doc_id"), "left")
      .join(nearDup, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_exact"), lit(0L))).as("n_exact_dup"),
        sum(coalesce(col("is_near"), lit(0L))).as("n_near_dup"))
      .orderBy("source")
  }

  /** Deterministic train/val/test assignment: bucket = portableHash
    * ("split:" ++ doc_id) mod 100 → <80 train, <90 val, else test.
    *
    * At scale this is a pure map — no shuffle, no state, no sampling step;
    * any worker can recompute any doc's split locally, which is what makes
    * the split stable under retries and incremental corpus growth (new docs
    * hash into splits at the same ratios without reshuffling old ones).
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        (Tables.portableHash(concat(lit("split:"), col("doc_id").cast("string")))
          % 100).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, lit("train"))
          .when(col("bucket") < 90, lit("val"))
          .otherwise(lit("test")))
      .orderBy("doc_id")

  /** Stratified deterministic sampling: per-source keep rates (src0 50%,
    * src1 25%, rest 10%) applied via hash-threshold — doc kept iff
    * portableHash("samp:" ++ doc_id) mod 1000 < threshold(source).
    * Returns per-stratum totals: (source, threshold_permille, n_total,
    * n_sampled).
    *
    * Hash-threshold sampling is the scale-correct form of stratified
    * sampling: one map + one partial-aggregated groupBy, no sort, no
    * per-stratum reservoir state, and the sample is a deterministic
    * function of the id (append-only corpora keep their old sample).
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val thr = when(col("source") === "src0", lit(500L))
      .when(col("source") === "src1", lit(250L))
      .otherwise(lit(100L))
    Tables.load(spark, dir, "documents")
      .select(col("source"), thr.as("threshold_permille"),
        (Tables.portableHash(concat(lit("samp:"), col("doc_id").cast("string")))
          % 1000).as("h"))
      .groupBy("source", "threshold_permille")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("h") < col("threshold_permille"), 1L).otherwise(0L))
          .as("n_sampled"))
      .orderBy("source")
  }

  /** Benchmark decontamination: docs with `doc_id % 37 = 0` form the held-out
    * benchmark set; a training doc is contaminated iff it shares at least one
    * word-3-gram shingle with any benchmark doc. Returns every doc with
    * (is_benchmark, contaminated, kept) flags.
    *
    * The overlap test is an inverted-index semi-join on the 60-bit shingle
    * hash (reusing the session-memoized shingle index built for the dedup
    * family): the benchmark side collapses to DISTINCT hashes — a small
    * relation that Catalyst broadcasts — so the scan side never shuffles.
    * This is how n-gram decontamination stays O(corpus) at 100 TB: the
    * benchmark's fingerprint set is tiny relative to the corpus and ships
    * to every executor once.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val shh = Dedup.shinglesHashedFor(spark, dir)
    val benchHashes = shh.where(col("doc_id") % 37 === 0)
      .select(col("h")).distinct()
    val contaminated = shh.where(col("doc_id") % 37 =!= 0)
      .join(benchHashes, "h")
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(1L))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 37 === 0, 1L).otherwise(0L).as("is_benchmark"))
      .join(contaminated, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_benchmark"),
        coalesce(col("contaminated"), lit(0L)).as("contaminated"))
      .withColumn("kept",
        when(col("is_benchmark") === 0 && col("contaminated") === 0, 1L)
          .otherwise(0L))
      .orderBy("doc_id")
  }

  /** Near-duplicate clusters: connected components over the n-gram Jaccard
    * ≥ 0.5 pair graph ([[Dedup.dedupNgram]]), labeling every doc with the
    * minimum doc_id reachable in its component. Returns
    * (doc_id, cluster_id, cluster_size) — singletons cluster with
    * themselves. Pair dedup keeps one doc per *pair*; cluster dedup is the
    * transitively-correct version (A~B, B~C ⇒ one survivor among {A,B,C}).
    *
    * Implementation is min-label propagation to fixpoint over the symmetric
    * edge list — the Pregel shape: each round is one shuffle
    * (edges ⋈ labels → min per node), and the driver only ever sees a
    * changed-label count, never row data. Rounds = component diameter; for
    * near-dup graphs that is small (near-dup clusters are dense cliques, not
    * chains). `localCheckpoint` truncates lineage each round so plans stay
    * flat. At 100 TB the same loop runs with the alternating large-star /
    * small-star optimization (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) — the fixpoint-and-min semantics here
    * are identical.
    */
  /** Memoized converged near-dup component labels — the min-label fixpoint
    * lives in [[Iterative.connectedComponents]] (shared with the mutual-kNN
    * clustering; plan-flattening localCheckpoint discipline documented
    * there) and runs ONCE per corpus, not once per consumer
    * (`q_dedup_clusters`, `q_cluster_canon`).
    */
  private[graft] def ccLabelsFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"cclab:$dir") {
      val pairs = Dedup.dedupNgram(spark, dir).select("doc_a", "doc_b")
      Iterative.connectedComponents(
        pairs.union(pairs.select(col("doc_b"), col("doc_a")))
          .toDF("src", "dst"))
    }

  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val labels = ccLabelsFor(spark, dir)
    val assigned = Tables.load(spark, dir, "documents").select("doc_id")
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
    val sizes = assigned.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, "cluster_id")
      .select("doc_id", "cluster_id", "cluster_size")
      .orderBy("doc_id")
  }

  /** The full curation funnel as ONE report — the composition proof that
    * the gates chain: quality filter → keep-first exact dedup (among
    * quality survivors) → decontamination → train split, with surviving
    * counts after each stage. Every stage reuses the exact operator
    * semantics the individually-checked queries pin (qualityFilter's
    * rules, dedupExact's min-id canonicalization, decontaminate's
    * fingerprint semi-join, splitAssign's hash threshold); the plan is
    * their joins plus one global aggregate.
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.qualityFilter(spark, dir)
      .select(col("doc_id"), col("keep"))
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), md5(col("text")).as("cmd5"))
    val qd = docs.join(quality.where(col("keep") === 1L).select("doc_id"), "doc_id")
    val canon = qd.groupBy("cmd5").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), lit(1L).as("is_canon"))
    val dec = decontaminate(spark, dir).select(col("doc_id"), col("kept").as("clean"))
    docs.join(quality, "doc_id")
      .join(canon, Seq("doc_id"), "left")
      .join(dec, "doc_id")
      .select(col("keep"), coalesce(col("is_canon"), lit(0L)).as("is_canon"),
        col("clean"),
        (Tables.portableHash(concat(lit("split:"), col("doc_id").cast("string")))
          % 100 < 80).cast("long").as("train"))
      .agg(count(lit(1)).as("n_total"),
        sum(col("keep")).as("n_quality"),
        sum(col("keep") * col("is_canon")).as("n_unique"),
        sum(col("keep") * col("is_canon") * col("clean")).as("n_clean"),
        sum(col("keep") * col("is_canon") * col("clean") * col("train"))
          .as("n_train"))
  }

  /** Deterministic per-group exemplars: the 3 documents per source with
    * the smallest sampling hash — the "show me a few examples from each
    * slice" operation (dataset cards, eyeball QA) as a stable query:
    * append-only corpora keep their exemplars. One user-keyed window over
    * the hash order; at scale the window input prunes to (source, hash,
    * doc_id) only.
    */
  def exemplars(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("h", "doc_id")
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        (Tables.portableHash(concat(lit("ex:"), col("doc_id").cast("string")))
          % 10000).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select("source", "rk", "doc_id", "n_chars")
      .orderBy("source", "rk")
  }

  /** Size-biased priority sample: the 5 documents per source with the
    * smallest `hash div weight` priority, weight = n_chars — the
    * distributed form of weighted bottom-k / priority sampling (Duffield–
    * Lund–Thorup): a document's chance of drawing a small priority grows
    * with its weight, so the sample leans to the long documents a curation
    * reviewer most wants to eyeball, while staying deterministic and
    * replayable from the doc_id alone ([[exemplars]] is the uniform
    * counterpart).
    *
    * Scale shape: the priority is a pure map; the per-source top-5 plans
    * as a rank-limit window, which Spark executes with WindowGroupLimit —
    * per-partition partial top-k BEFORE the exchange — so the shuffle
    * carries ≤ 5·partitions rows per source, not the corpus.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("priority", "doc_id")
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        Tables.portableHash(concat(lit("wsmp:"), col("doc_id").cast("string")))
          .as("ph"))
      .withColumn("priority", expr("ph div greatest(n_chars, 1)"))
      .drop("ph")
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 5)
      .select("source", "rk", "doc_id", "n_chars", "priority")
      .orderBy("source", "rk")
  }

  /** Temperature-scaled source mixture (the training-mixture resampling
    * step): per-source weights `⌊√n_s⌋` (τ = 0.5 — integer-exact: IEEE
    * sqrt of an exact integer is correctly rounded in every engine), a
    * half-corpus document budget allocated ∝ weight, converted to a
    * per-source permille keep-rate, and applied as the same deterministic
    * hash-threshold sampling as [[stratifiedSample]].
    *
    * Scale shape: the mixture math runs on the per-source aggregate (one
    * tiny relation), the rates broadcast back, and the sample itself is a
    * pure map — identical cost to stratifiedSample no matter how skewed
    * the source distribution.
    */
  def sourceMixture(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val bySource = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val total = bySource.agg(sum(col("n_docs")).as("n_total"),
      sum(floor(sqrt(col("n_docs"))).cast("long")).as("w_total"))
    val rates = bySource.crossJoin(broadcast(total))
      .withColumn("weight", floor(sqrt(col("n_docs"))).cast("long"))
      .withColumn("alloc", expr("(n_total div 2) * weight div w_total"))
      .withColumn("rate_permille",
        least(lit(1000L), expr("alloc * 1000 div n_docs")))
    val sampled = d.select(col("doc_id"), col("source"),
        (Tables.portableHash(concat(lit("mix:"), col("doc_id").cast("string")))
          % 1000).as("bucket"))
      .join(broadcast(rates.select("source", "rate_permille")), "source")
      .where(col("bucket") < col("rate_permille"))
      .groupBy("source").agg(count(lit(1)).as("n_sampled"))
    rates.join(sampled, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("weight"), col("alloc"),
        col("rate_permille"), coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
      .orderBy("source")
  }

  /** Corpus packing to a token budget (60% of total tokens): documents are
    * taken in doc_id order until the cumulative token count crosses the
    * budget — the "cut a training corpus at N tokens" operation.
    *
    * Tokens are counts under the LEARNED tokenizer
    * ([[TextAnalysis.bpeVocabFor]], 8 merge rounds), not the whitespace
    * proxy — the number a real budget cut is denominated in. One extra
    * word-key join against the type table before the prefix sum.
    *
    * The running sum is [[Ranking.withRunningTotal]] — range partitions
    * compute local prefix sums in parallel and a broadcast per-partition
    * offset pass supplies the carry, so no single task ever sees more
    * than one partition's rows. (The previous form carried across
    * `doc_id div 100` buckets through an UNPARTITIONED window — a
    * single-task relation that still grew linearly with the corpus.)
    */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    // `d` is referenced twice (budget scalar + running total), but both
    // references share the identical exchange-capped subtree (the
    // doc_id aggregate), which AQE's runtime exchange reuse serves from
    // one materialization — an explicit localCheckpoint here was tried
    // in round 19 and measured slightly SLOWER (1.04 -> 1.19 s at
    // sf0.1: the eager barrier costs more than the shared recompute).
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .join(TextAnalysis.bpeVocabFor(spark, dir).select("word", "wt"), "word")
      .groupBy("doc_id").agg(sum(col("wt")).as("n_tokens"))
    val budget = d.agg(expr("sum(n_tokens) * 6 div 10").as("budget"))
    Ranking.withRunningTotal(d, col("n_tokens"), "cum_tokens", col("doc_id"))
      .crossJoin(broadcast(budget))
      .where(col("cum_tokens") <= col("budget"))
      .select("doc_id", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
  }

  /** Temperature-weighted per-source TOKEN budgets, enforced — the
    * "assemble the training mix" step that composes [[sourceMixture]]'s
    * weighting idea with [[tokenBudget]]'s cut: each source gets
    * `(total/2) · weight_s / Σweight` tokens (weight = ⌊√src_tokens⌋, the
    * √-temperature that up-weights small sources relative to proportional
    * sampling), and docs fill the budget in seeded-hash order so the
    * selection is an unbiased, retry-stable sample of the source.
    *
    * The per-source running total is a window PARTITIONED by source —
    * sources fill in parallel; that is the right shape while no single
    * source dominates a partition's memory. If one source is itself
    * corpus-scale, swap in the [[Ranking.withRunningTotal]]
    * range-partitioned prefix sum per hot source (same numbers, two
    * passes) — the operator contract (hash order, budget arithmetic)
    * doesn't change.
    *
    * Output: one row per source — corpus tokens, weight, budget, and what
    * the greedy fill actually kept (n_kept, kept_tokens ≤ budget).
    */
  def mixtureBudget(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val bySource = d.groupBy("source").agg(sum("n_tokens").as("src_tokens"))
    val total = bySource.agg(
      sum(col("src_tokens")).as("tok_total"),
      sum(floor(sqrt(col("src_tokens"))).cast("long")).as("w_total"))
    val budgets = bySource.crossJoin(broadcast(total))
      .withColumn("weight", floor(sqrt(col("src_tokens"))).cast("long"))
      .withColumn("budget_tokens",
        expr("(tok_total div 2) * weight div w_total"))
      .select("source", "src_tokens", "weight", "budget_tokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("hk"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val kept = d
      .withColumn("hk", Tables.portableHash(
        concat(lit("mixb:"), col("doc_id").cast("string"))))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .join(broadcast(budgets.select("source", "budget_tokens")), "source")
      .where(col("cum_tokens") <= col("budget_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("n_tokens").as("kept_tokens"))
    budgets.join(kept, Seq("source"), "left")
      .select(col("source"), col("src_tokens"), col("weight"),
        col("budget_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  /** Fixed-length training-sequence packing, concat-and-chop style: the
    * corpus is one token stream in doc_id order, chopped every 2048
    * tokens — the standard GPT-pretraining packing (no padding waste;
    * documents may straddle sequence boundaries). Emits each document's
    * stream offset and first/last sequence ids, from which a writer
    * shards the actual token stream.
    *
    * The only corpus-wide computation is the exact prefix sum
    * ([[Ranking.withRunningTotal]], range-partitioned + broadcast
    * offsets); everything after is per-row int64 arithmetic (`div` on
    * non-negative operands, trunc ≡ floor in every engine). At 100 TB
    * the sequence ids arrive without any sequential pass — each doc
    * computes its own placement from the prefix sum, so the packed
    * layout is parallel to build AND parallel to audit.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2048L
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    Ranking.withRunningTotal(d, col("n_tokens"), "cum", col("doc_id"))
      .select(col("doc_id"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_off"),
        expr(s"(cum - n_tokens) div $cap").as("seq_first"),
        expr(s"(cum - 1) div $cap").as("seq_last"),
        (expr(s"(cum - 1) div $cap") - expr(s"(cum - n_tokens) div $cap")
          + 1).as("n_seqs"))
      .orderBy("doc_id")
  }

  /** Greedy NO-SPLIT bin packing — the SFT/finetuning variant of
    * [[packSequences]]: documents are never chopped; within each of 16
    * doc_id-hash shards, docs in doc_id order fill 2048-token bins and a
    * doc that would overflow opens the next bin (an oversize doc gets a
    * bin alone). Emits (doc_id, shard, bin_id).
    *
    * Greedy sequential fill is inherently order-stateful — bin breaks
    * depend on the whole prefix — so this is the one operator in the
    * curation family that legitimately drops to `mapPartitions`: hash-
    * repartition by shard, sort within partitions by (shard, doc_id),
    * then ONE sequential scan per partition with O(1) state (current
    * shard, bin, fill). Shards bound the sequential unit — at 100 TB you
    * run ~max-docs-per-shard sequential steps per task, in parallel
    * across shards, never a global scan. Deterministic under retry: the
    * shard hash, the sort, and the scan are all pure functions of the
    * data. The DuckDB oracle replays the fill with a recursive CTE
    * advancing one doc per shard per iteration.
    */
  def packGreedy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cap = 2048L
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 16).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var curShard = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (id, sh, n) =>
          if (sh != curShard) { curShard = sh; bin = 0L; fill = n }
          else if (fill + n <= cap) { fill += n }
          else { bin += 1; fill = n }
          (id, sh, bin)
        }
      }
      .toDF("doc_id", "shard", "bin_id")
      .orderBy("doc_id")
  }

  /** Deterministic global training-order shuffle + shard assignment: the
    * "shuffle the corpus before writing training shards" step. Order =
    * portableHash("order:r8:" ++ doc_id) with doc_id tie-break — a seeded
    * pseudo-random permutation any worker can recompute (no `rand()`, no
    * driver-side shuffle state); shard = contiguous 1/16 block of that
    * permuted order, so shards are equal-size ±1 and a shard's docs are
    * an unbiased corpus sample.
    *
    * The global position comes from [[Ranking.withGlobalRowNumber]] —
    * range-partitioned parallel sort + broadcast offsets — NOT an
    * unpartitioned window; at 100 TB this is the same distributed
    * sort-by-key Spark's own `sortBy` write path runs, and the shard
    * boundary arithmetic is pure int64 on the resulting position.
    */
  def trainOrder(spark: SparkSession, dir: String): DataFrame = {
    val nShards = 16
    val h = Tables.portableHash(
      concat(lit("order:r8:"), col("doc_id").cast("string")))
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), h.as("hk"))
    val (ranked, n) = Ranking.withGlobalRowNumber(
      d, "pos", col("hk"), col("doc_id"))
    ranked
      .select(col("doc_id"), col("hk"), col("pos"),
        expr(s"(pos - 1) * $nShards div ${math.max(n, 1L)}").as("shard"))
      .orderBy("pos")
  }

  /** Hashed-feature bucket count for [[dsirSelect]] — a CONSTANT: the
    * weight relation is `DsirB` rows at any corpus size (production uses
    * ~10⁴–10⁵ buckets; 256 is sized so the test corpus still gives every
    * bucket smoothed mass).
    */
  private[graft] val DsirB = 256L

  /** DSIR-style importance selection (hashed-n-gram importance resampling,
    * Xie et al. 2023): score every document by how target-like its token
    * distribution is, using hashed unigram features — the standard
    * "select pretraining data that looks like the domain you care about"
    * pass. Target here = the `lang = 'en'` slice of the corpus; raw = the
    * whole corpus.
    *
    * Tokens hash into [[DsirB]] buckets (portable 60-bit hash, oracle-
    * replayable); each bucket gets an add-one-smoothed target/raw
    * likelihood ratio in permille (pure int64 arithmetic — no float log,
    * so the oracle hash-matches every score); each document's score is
    * the integer mean ratio over its tokens. Emits the top-100 documents
    * by (score DESC, doc_id).
    *
    * Scale shape: one token scan → a 256-row weight aggregation
    * (map-side combinable) → broadcast weights joined back on the bucket
    * key → per-doc aggregation → distributed TakeOrdered top-100. Linear
    * in corpus size, constant-size broadcasts, no window over the corpus.
    */
  /** The trained DSIR weight table over the COMPLETE bucket domain
    * (0 until DsirB): buckets no corpus token hashed into still get their
    * add-one-smoothed weight, so a serving-time scorer
    * ([[graft.streaming.StreamingOps.dsirScoreStream]]) never sees a
    * missing key when a NEW document's token lands in a bucket the
    * training corpus left empty. Batch scoring is unaffected — corpus
    * tokens only ever hit observed buckets by construction.
    */
  private[graft] def dsirWeights(spark: SparkSession, docs: DataFrame): DataFrame = {
    val toks = docs.select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .withColumn("b", Tables.portableHash(col("w")) % DsirB)
    val bc = toks.groupBy("b").agg(
      count(lit(1)).as("cnt_r"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("cnt_t"))
    val tot = bc.agg(sum(col("cnt_r")).as("tot_r"), sum(col("cnt_t")).as("tot_t"))
    spark.range(DsirB).select(col("id").as("b"))
      .join(bc, Seq("b"), "left")
      .select(col("b"), coalesce(col("cnt_r"), lit(0L)).as("cnt_r"),
        coalesce(col("cnt_t"), lit(0L)).as("cnt_t"))
      .crossJoin(broadcast(tot))
      .select(col("b"),
        expr(s"(cnt_t + 1) * (tot_r + $DsirB) * 1000 div " +
          s"((cnt_r + 1) * (tot_t + $DsirB))").as("w_pm"))
  }

  /** Per-document DSIR scores (every doc, unselected) — the relation the
    * top-100 selection and the streaming scorer both agree with.
    */
  private[graft] def dsirScores(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val wts = dsirWeights(spark, docs)
    docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .withColumn("b", Tables.portableHash(col("w")) % DsirB)
      .join(broadcast(wts), "b")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_toks"), sum(col("w_pm")).as("sw"))
      .select(col("doc_id"), col("lang"), col("n_toks"),
        expr("sw div n_toks").as("score_pm"))
  }

  def dsirSelect(spark: SparkSession, dir: String): DataFrame =
    dsirScores(spark, dir)
      .orderBy(col("score_pm").desc, col("doc_id")).limit(100)

  /** Reproducibility manifest per training shard — the artifact a training
    * run pins so "the data changed" is detectable without re-reading it:
    * for each [[trainOrder]] shard, the doc count, token load, a
    * content checksum (sum of per-doc 60-bit text hashes mod 1 000 003 —
    * bounded so the int64 sum can never wrap, unlike summing raw hashes),
    * and the global-position range proving shard contiguity. Any document
    * edit, drop, or reorder changes exactly the affected shard's row.
    *
    * One join on doc_id + a 16-row aggregate over the already-ranked
    * permutation; the checksum is map-side-combinable.
    */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val ord = trainOrder(spark, dir).select("doc_id", "pos", "shard")
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        (Tables.portableHash(col("text")) % 1000003L).as("thm"))
    ord.join(docs, "doc_id")
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("sum_tokens"),
        (sum(col("thm")) % 1000003L).as("checksum"),
        min(col("pos")).as("min_pos"),
        max(col("pos")).as("max_pos"))
      .orderBy("shard")
  }

  /** Curriculum phases for [[curriculum]]. */
  private[graft] val CurrPhases = 4L

  /** Curriculum schedule: documents ranked easy→hard by lexical-diversity
    * permille (distinct words per 1000 words — low diversity reads easy,
    * high diversity is dense) and cut into [[CurrPhases]] equal-rank
    * phases, the shape a curriculum-ordered training run feeds phase by
    * phase (Bengio et al. 2009's easy-first schedule at corpus scale).
    * Emits the per-phase summary a schedule owner signs off on: doc count,
    * token budget, and the difficulty band.
    *
    * The global rank is [[Ranking.withGlobalRowNumber]] (range partition +
    * broadcast offsets), not a single-task window, so the phase cut
    * distributes like any sort at 100 TB; everything downstream is one
    * 4-row aggregate.
    */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"))
      .withColumn("dp", expr("n_distinct * 1000 div n_words"))
    val (ranked, n) = Ranking.withGlobalRowNumber(
      d, "rn", col("dp"), col("doc_id"))
    ranked
      .withColumn("phase",
        expr(s"(rn - 1) * $CurrPhases div ${math.max(n, 1L)}"))
      .groupBy("phase")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("sum_tokens"),
        min(col("dp")).as("min_dp"), max(col("dp")).as("max_dp"))
      .orderBy("phase")
  }

  /** Canonical-member selection per near-dup cluster — the step AFTER
    * clustering that [[dedupClusters]] stops short of: inside every
    * cluster, keep the LONGEST member (chars; ties → smallest doc_id), the
    * RefinedWeb/C4-style keep-longest rule (the longest duplicate is the
    * least-truncated crawl of the shared content). Emits every document
    * with its cluster, the cluster's canonical doc, and its own verdict —
    * the relation a rewrite pass joins against to drop non-canonicals.
    *
    * One window over clusters (partition key = cluster_id, group size =
    * cluster size — bounded by the dedup graph, not the corpus) on top of
    * the memo-backed cluster relation.
    */
  def clusterCanon(spark: SparkSession, dir: String): DataFrame = {
    val clusters = dedupClusters(spark, dir)
    val len = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val withLen = clusters.join(len, "doc_id")
    // keep-longest winner per cluster via a min-struct aggregate (map-side
    // combinable — no per-cluster sort): min(-n_chars, doc_id) == the
    // longest member, ties to the smallest id
    val canon = withLen.groupBy("cluster_id")
      .agg(min(struct((-col("n_chars")).as("neg"), col("doc_id"))).as("c"))
      .select(col("cluster_id"), col("c.doc_id").as("canon_doc"))
    withLen.join(canon, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("n_chars"), col("canon_doc"),
        when(col("doc_id") === col("canon_doc"), 1L).otherwise(0L)
          .as("is_canon"))
      .orderBy("doc_id")
  }

  /** Landing-shard token accounting — the BATCH composition of the
    * streaming curation funnel's artifact chain (scrub → BPE token count
    * → shard route), over the same planted-PII corpus as `q_pii_scrub`:
    * per landing shard, how many documents land there and how many BPE
    * tokens they carry under the learned merge table
    * ([[TextAnalysis.bpeMergesFor]] — the same broadcast fold the funnel
    * ships per row). The per-shard budget readout a training job reads
    * before scheduling shard consumers.
    *
    * Scale shape: the merge table collapses to one broadcast row, the
    * scrub+fold is map-only, and the aggregation has 16 keys — one
    * map-side-combined pass at any corpus size.
    */
  def shardTokens(spark: SparkSession, dir: String): DataFrame = {
    val msRow = TextAnalysis.bpeMergesFor(spark, dir)
      .agg(array_sort(collect_list(struct(col("ord"), col("pat"), col("rep"))))
        .as("ms"))
    Scrub.dirtyText(spark, dir)
      .select(col("doc_id"), Scrub.scrubbed(col("dirty")).as("text"))
      .crossJoin(broadcast(msRow))
      .select(col("doc_id"),
        TextAnalysis.bpeTokenCountExpr("text", "ms").as("nt"))
      .withColumn("shard", pmod(Tables.portableHash(
        concat(lit("order:r8:"), col("doc_id").cast("string"))), lit(16L)))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .withColumn("tokens_per_doc", expr("n_tokens div n_docs"))
      .orderBy("shard")
  }
}
