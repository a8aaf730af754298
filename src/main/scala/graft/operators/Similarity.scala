package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Two personalities:
  *   - [[annTopk]] — exact brute-force cosine top-k: the correctness
  *     baseline. O(Q·N) pair cosines; fine for a query *sample*, never for
  *     all-pairs at scale.
  *   - [[annIvf]] — IVF-style two-level search (the scale path): vectors are
  *     assigned to their nearest coarse centroid (one shuffle keyed by
  *     centroid), queries probe the `nprobe` nearest centroid lists only.
  *     Work drops from O(Q·N) to O(Q·N·nprobe/C). Centroids are a FIXED-K
  *     hash-min sample (the K vectors with the smallest portable hash of
  *     their id) so C stays constant as the corpus grows: assignment is
  *     O(N·K) with a constant-size broadcast, never O(N²/step) as a
  *     modulus subset would be. The selection is deterministic, so the
  *     DuckDB oracle replays the index build exactly; [[annIvfKmeans]]
  *     refines the same seeds with Lloyd iterations.
  *
  * All cosines are double-precision left folds (bit-identical to the oracle).
  * Queries are the deterministic panel `vec_id % panelStep(N) == 0`
  * (step 20 through sf0.1, then sized to cap the panel at ~100 queries).
  */
object Similarity {

  private val K = 5

  /** Memoized exact top-5 relation — the O(Q·N) baseline scan is paid once
    * per session and served to both the `ann_topk` query and the PQ recall
    * audit (the cache holds only 5·Q rows).
    */
  private[graft] def annTopkFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"anntopk:$dir")(annTopkBuild(spark, dir))

  /** Un-memoized exact top-5 builder — the operator structure the plan
    * audit inspects (the memoized relation is a parquet scan by design).
    */
  private[graft] def annTopkBuild(spark: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    val q = v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val pairs = broadcast(q).join(v, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        Dedup.cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    pairs.withColumn("rk", row_number().over(w)).where(col("rk") <= K)
  }

  /** Exact brute-force top-5 cosine neighbors per sampled query vector. */
  def annTopk(spark: SparkSession, dir: String): DataFrame =
    annTopkFor(spark, dir).orderBy("q_id", "rk")

  /** Symmetric int8 scalar quantization of the embedding column — the
    * standard 4× compression step before indexing/serving embeddings at
    * scale. Per-dimension max-abs scales (one narrow aggregation over the
    * posexploded relation, map-side combinable), then
    * `q = round(127·x / maxabs_dim)` per element. Output is the full
    * quantized relation (vec_id, dim, q) — integer-exact: the double
    * division and half-away-from-zero rounding are bit-identical in
    * DuckDB, so the oracle hash-matches every quantized value.
    */
  def vectorQuantize(spark: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
      .select(col("vec_id"), posexplode(col("e")).as(Seq("dim", "x")))
    val scales = v.groupBy("dim").agg(max(abs(col("x"))).as("maxabs"))
    v.join(broadcast(scales), "dim")
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        round(col("x") * 127.0 / col("maxabs")).cast("long").as("q"))
      .orderBy("vec_id", "dim")
  }

  /** Floor of the coarse-centroid count. K is corpus-ADAPTIVE above the
    * floor — [[centroidKFor]] grows it as ~1.4·√N — because the two costs
    * K trades between are assignment (O(N·K) broadcast cosines) and
    * within-bucket pair enumeration (Θ(nprobe²·N²/K)): K ∝ √N balances
    * them at Θ(N^1.5), the single-level-IVF optimum. A FIXED K (the
    * pre-round-10 design) silently turns every pair build quadratic —
    * measured at the sf1.0 decade as `_build_ivf_pairs` 2.5 s → 171 s
    * (last-decade exponent 1.83); with adaptive K AND the verify-before-
    * distinct pair shape ([[Dedup.ivfPairs]]) the same build measures
    * ~4 s at sf1.0 — a sub-linear last decade. The constant 1.4 is pinned so K stays
    * exactly 64 through sf0.1 (1.4·√2000 ≈ 63): every driver-checked
    * result at oracle scales is unchanged, and the oracle's literal
    * `LIMIT 64` remains the exact value of this formula there. Beyond
    * ~1e7 vectors the √N single-level table outgrows its broadcast; the
    * deploy path is the two-level quantizer (⚙ SCALING.md).
    */
  private[graft] val CentroidK = 64

  /** Corpus-adaptive centroid count: max([[CentroidK]], ⌈1.4·√N⌉). */
  private[graft] def centroidKFor(n: Long): Int =
    math.max(CentroidK, math.ceil(1.4 * math.sqrt(n.toDouble)).toInt)

  /** Memoized-per-session corpus row count (one parquet-metadata count per
    * (session, dir)) — feeds [[centroidKFor]] and [[panelStep]] so every
    * consumer derives the SAME sizes without re-counting. Lives in
    * [[graft.sources.Materialized.scalarOf]] (session-identity-keyed,
    * swept with the session), not a process-global map: the old
    * `identityHashCode(spark)`-keyed ConcurrentHashMap was never evicted,
    * could collide across sessions, and would serve a stale N to a new
    * session over a rewritten corpus — desyncing the adaptive index
    * formulas from the oracle's live counts.
    */
  private[graft] def corpusN(spark: SparkSession, dir: String): Long =
    graft.sources.Materialized.scalarOf(spark, s"corpusn:$dir")(
      Dedup.normedFor(spark, dir).count())

  /** Audit/serving query-panel stride: every `step`-th vector with
    * step = max(20, ⌈N/100⌉), capping the panel at ~100 queries. The old
    * fixed `% 20` grew the panel ∝ N, making every exact ground-truth
    * scan (the O(Q·N) baselines behind the recall/MRR audits) quadratic —
    * measured at sf1.0 as `_build_ann_topk` 1.0 s → 28 s. The max() keeps
    * step = 20 through sf0.1 (⌈2000/100⌉ = 20), so oracle-scale results
    * and the oracles' literal `% 20` are unchanged; beyond that the panel
    * is a fixed-size audit sample — the industry norm for index QA.
    */
  private[graft] def panelStep(n: Long): Long = math.max(20L, (n + 99L) / 100L)

  /** The deterministic query panel of `df` (rows keyed by vec_id), sized
    * by the corpus count of `dir`. ONE stride per corpus — every audit
    * family member must draw the same panel or their joins go vacuous.
    */
  private[graft] def queryPanel(spark: SparkSession, dir: String,
      df: DataFrame): DataFrame =
    df.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0)

  /** Deterministic coarse centroid relation: the [[centroidKFor]] vectors
    * with the smallest portable 60-bit hash of their id (ties → min
    * vec_id) — a uniform hash-min sample the DuckDB oracle replays with
    * the same `ORDER BY hash LIMIT K`. Spark plans this as a distributed
    * TakeOrdered (per-partition top-K, K-row driver merge), never a
    * global sort.
    */
  private[graft] def centroidsFor(v: DataFrame): DataFrame =
    v.select(col("vec_id").as("cent_id"), col("e").as("ce"), col("nrm").as("cn"),
        Tables.portableHash(col("vec_id").cast("string")).as("hk"))
      .orderBy(col("hk"), col("cent_id")).limit(centroidKFor(v.count()))
      .select("cent_id", "ce", "cn")

  /** Top-`nprobe` centroids per vector — MAP-ONLY. The centroid table
    * collapses to ONE broadcast row holding the (cent_id, ce, cn) struct
    * array; each vector row then computes all K cosines in a `transform`,
    * orders them with `array_sort` on (−cos, cent_id) — exactly the
    * window's (cos DESC, cent_id ASC), −x being a bare IEEE sign flip —
    * and keeps `nprobe`. No exchange and no window anywhere: at K=4096
    * this is N map rows, where the old crossJoin + row_number shape
    * shuffled N×K rows through a window exchange (the dominant cost of
    * the index build at corpus scale). Extra input columns listed in
    * `keep` ride along (e.g. the vector itself for a k-means update).
    */
  private[graft] def multiProbe(v: DataFrame, cents: DataFrame, nprobe: Int,
      keep: Seq[String] = Nil): DataFrame = {
    import graft.functions.VectorOps
    val arr = cents.agg(
      array_sort(collect_list(struct(col("cent_id"), col("ce"), col("cn"))))
        .as("cents"))
    val joined = v.crossJoin(broadcast(arr))
    // nprobe=1 (the IVF/k-means argmax — the corpus-sized passes) skips
    // the K log K sort: an O(K) `array_min` + first `array_position` over
    // the negcos array. Ties resolve identically — `cents` is sorted by
    // cent_id, so the FIRST position holding the min is the smallest
    // cent_id, exactly the sort's (negcos ASC, cent_id ASC) head. Higher-
    // order expressions are interpreted (no codegen), so dropping the
    // per-row sort of K structs is the difference between O(K) and
    // O(K log K) INTERPRETED comparator evals per vector — at the sf10
    // decade (K = 627) the sort dominated every index build's profile
    // (jstack: all executors in ArraySort's interpreted comparator).
    if (nprobe == 1) {
      val negs = transform(col("cents"), c =>
        -(VectorOps.dot(col("e"), c.getField("ce")) /
          (col("nrm") * c.getField("cn"))))
      val best = element_at(col("cents"),
        array_position(negs, array_min(negs)).cast("int"))
        .getField("cent_id")
      // empty centroid table: array_min/array_position go null, which
      // would emit a null cent_id row where the sort-slice-explode path
      // below emits ZERO rows — filter so both paths degrade identically
      joined.where(size(col("cents")) > 0)
        .select(col("vec_id") +: keep.map(col) :+ best.as("cent_id"): _*)
    } else {
      val probe = slice(array_sort(transform(col("cents"), c =>
        struct((-(VectorOps.dot(col("e"), c.getField("ce")) /
          (col("nrm") * c.getField("cn")))).as("negcos"),
          c.getField("cent_id").as("cent_id")))), 1, nprobe)
      joined
        .select(col("vec_id") +: keep.map(col) :+ explode(probe).as("p"): _*)
        .select(col("vec_id") +: keep.map(col) :+ col("p.cent_id").as("cent_id"): _*)
    }
  }

  /** Memoized hash-min centroid table for a dir — the persisted coarse-
    * quantizer artifact every IVF consumer shares. Without it, each
    * consumer re-plans the full-corpus TakeOrdered selection (the
    * residual-PQ build paid it twice in one job); with it, probes read a
    * 64-row parquet table. Doubles round-trip parquet bit-exactly
    * (MaterializedSpec), so results are unchanged.
    */
  private[graft] def centroidsMemoFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"cents:$dir")(
      centroidsFor(Dedup.normedFor(spark, dir)))

  /** IVF index build: every vector → its nearest centroid (ties → min
    * cent_id). Map-only via [[multiProbe]].
    */
  private[graft] def ivfAssign(v: DataFrame, cents: DataFrame): DataFrame =
    multiProbe(v, cents, nprobe = 1)

  /** Memoized IVF assignment for a dir — the index build, shared by
    * `ann_ivf`, `q_ivf_stats` and `q_ivf_purity` (one build per session,
    * the Materialized analog of a persisted ANN index at scale).
    */
  private[graft] def ivfAssignFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"ivfasg:$dir") {
      val v = Dedup.normedFor(spark, dir)
      ivfAssign(v, centroidsMemoFor(spark, dir))
    }

  /** Memoized IVF assignment over the k-means-refined centroid table — the
    * `kmasg` twin of [[ivfAssignFor]], shared by `ann_ivf_kmeans` (the
    * round-5 gap: the k-means index was rebuilt per consumer query while
    * the hash-min assignment rode the session memo).
    */
  private[graft] def kmAssignFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"kmasg2:$dir") {
      val v = Dedup.normedFor(spark, dir)
      ivfAssign(v, Clustering.kmeansCentroidsFor(spark, dir))
    }

  /** IVF-bucketed ANN: nprobe=2 over deterministic coarse centroids. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    val cents = centroidsMemoFor(spark, dir)
    val assign = ivfAssignFor(spark, dir)

    // query sample + its 2 nearest centroid lists (map-only probe)
    val q = v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val probes = multiProbe(v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0), cents, nprobe = 2)
      .withColumnRenamed("vec_id", "q_id")

    // search only the probed buckets
    val candidates = probes
      .join(assign, "cent_id")
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    candidates
      .join(broadcast(q), "q_id")
      .join(v, "vec_id")
      .select(col("q_id"), col("vec_id").as("n_id"),
        Dedup.cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= K)
      .orderBy("q_id", "rk")
  }

  /** IVF-bucketed ANN over the k-means-REFINED centroid table (2 Lloyd
    * iterations from the same hash-min seeds; see
    * [[Clustering.kmeansCentroids]]) — the production index build the
    * hash-min variant approximates. Search mechanics are identical to
    * [[annIvf]]; only the centroid table differs, which is exactly the
    * property that makes the IVF design swappable. Measured side by side
    * in `q_ann_recall_kmeans`.
    */
  def annIvfKmeans(spark: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    val cents = Clustering.kmeansCentroidsFor(spark, dir)
    val assign = kmAssignFor(spark, dir)

    val q = v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val probes = multiProbe(v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0), cents, nprobe = 2)
      .withColumnRenamed("vec_id", "q_id")

    val candidates = probes
      .join(assign, "cent_id")
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    candidates
      .join(broadcast(q), "q_id")
      .join(v, "vec_id")
      .select(col("q_id"), col("vec_id").as("n_id"),
        Dedup.cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= K)
      .orderBy("q_id", "rk")
  }

  // ---------------------------------------------------------------------
  // Two-level coarse quantizer (IVF²) — the 100 TB IVF bound, as code.
  // ---------------------------------------------------------------------

  /** Coarse cell count of the two-level quantizer: max(8, ⌈√K⌉) over the
    * K fine centroids — the cost-minimizing split of an exhaustive
    * two-level argmin (K1 + K/K1 comparisons per row is minimal at
    * K1 = √K). IEEE sqrt is correctly rounded, so the DuckDB oracle's
    * `ceil(sqrt(K))` replays this bit-exactly.
    */
  private[graft] def coarseKFor(k: Int): Int =
    math.max(8, math.ceil(math.sqrt(k.toDouble)).toInt)

  /** The coarse level: the [[coarseKFor]] fine centroids with the
    * smallest portable hash of their id — the SAME hash-min order as
    * [[centroidsFor]], so the coarse table is a PREFIX of the fine one
    * and derives from the cents memo in a K-row pass (no corpus scan).
    * At 100 TB the fine table itself is too large to broadcast whole
    * (K ~ 1.4√N is ~4.4M at 10¹³ vectors); the coarse level is what a
    * router broadcasts (√K ~ 2.1k rows), and each coarse cell's member
    * list is the shard-local structure.
    */
  private[graft] def coarseMemoFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"ivf2coarse:$dir") {
      coarsePrefix(centroidsMemoFor(spark, dir),
        coarseKFor(centroidKFor(corpusN(spark, dir))))
    }

  /** The hash-min coarse PREFIX of an arbitrary fine-centroid table —
    * the [[coarseMemoFor]] selection rule factored out so the k-means
    * quantizer gets its own coarse level (same cent_ids as the hash-min
    * coarse — the prefix ranks by id hash — but the REFINED vectors).
    */
  private[graft] def coarsePrefix(cents: DataFrame, k1: Int): DataFrame =
    cents.select(col("cent_id").as("co_id"), col("ce").as("oe"),
        col("cn").as("ocn"),
        Tables.portableHash(col("cent_id").cast("string")).as("hk"))
      .orderBy(col("hk"), col("co_id")).limit(k1)
      .select("co_id", "oe", "ocn")

  /** Coarse level over the Lloyd-refined centroid table — the k-means
    * twin of [[coarseMemoFor]], routing the `kmpairs` production pair
    * build since the round-14 migration.
    */
  private[graft] def kmCoarseMemoFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"ivf2kmcoarse2:$dir") {
      coarsePrefix(Clustering.kmeansCentroidsFor(spark, dir),
        coarseKFor(centroidKFor(corpusN(spark, dir))))
    }

  /** fine centroid → its coarse cell (nearest coarse, ties → min co_id):
    * a K-row map-only probe of the broadcast coarse table.
    */
  private[graft] def fineToCoarse(cents: DataFrame, coarse: DataFrame): DataFrame =
    multiProbe(
      cents.select(col("cent_id").as("vec_id"), col("ce").as("e"),
        col("cn").as("nrm")),
      coarse.select(col("co_id").as("cent_id"), col("oe").as("ce"),
        col("ocn").as("cn")),
      nprobe = 1)
      .select(col("vec_id").as("cent_id"), col("cent_id").as("co_id"))

  /** The per-cell member map — ONE broadcast row holding
    * co_id → sorted [(cent_id, ce, cn)] so the fine argmin below touches
    * only the vector's own cell. Arrays sort by cent_id (unique first
    * struct field), which is what makes the first-position-of-min tie
    * rule below identical to the oracle's (cos DESC, cent_id) window.
    */
  private def cellMap(cents: DataFrame, f2c: DataFrame): DataFrame =
    f2c.join(cents, "cent_id")
      .groupBy(col("co_id"))
      .agg(array_sort(collect_list(
        struct(col("cent_id"), col("ce"), col("cn")))).as("ms"))
      .agg(map_from_entries(collect_list(
        struct(col("co_id"), col("ms")))).as("cellmap"))

  /** Two-level IVF assignment — map-only like [[multiProbe]] but
    * O(K1 + K/K1) cosines per row instead of O(K): nearest coarse cell
    * over the broadcast K1-row coarse table, then nearest fine centroid
    * WITHIN that cell off the broadcast member map. With K ~ 1.4√N and
    * K1 = √K this turns the corpus-sized assignment pass from O(N·√N)
    * into O(N·N^¼) — the structural answer to "the fine centroid table
    * outgrows what a per-row transform can price" that SCALING.md cited
    * as the 100 TB IVF bound since round 6; it is now a measured build.
    *
    * The trade is recall at the CELL level, not correctness: a vector
    * whose true nearest fine centroid lives in a different coarse cell
    * gets its within-cell argmin instead (the classic IMI/two-level
    * trade). The contract is therefore bucket-presence, like every ANN
    * path here, and the oracle replays the SAME two-level decision
    * bit-for-bit, so the gate still hash-pins every row.
    *
    * Tie semantics mirror the single-level path at both levels:
    * ties → min id, via first-position-of-min over cent_id-sorted
    * arrays. A chosen cell is structurally non-empty (coarse ⊂ fine and
    * both sides break ties identically, so duplicate-vector centroids
    * collapse to the same min-id cell on both the member and the vector
    * side); the size guard degrades a pathological empty cell to zero
    * rows exactly like [[multiProbe]]'s empty-cents guard.
    */
  private[graft] def ivf2Assign(v: DataFrame, cents: DataFrame,
      coarse: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    import graft.functions.VectorOps
    val coarseAsC = coarse.select(col("co_id").as("cent_id"),
      col("oe").as("ce"), col("ocn").as("cn"))
    val cm = cellMap(cents, fineToCoarse(cents, coarse))
    val withCo = multiProbe(v, coarseAsC, nprobe = 1, keep = Seq("e", "nrm"))
      .withColumnRenamed("cent_id", "co_id")
    val withCell = withCo.crossJoin(broadcast(cm))
      .withColumn("cell", element_at(col("cellmap"), col("co_id")))
    val negs = transform(col("cell"), c =>
      -(VectorOps.dot(col("e"), c.getField("ce")) /
        (col("nrm") * c.getField("cn"))))
    val best = element_at(col("cell"),
      array_position(negs, array_min(negs)).cast("int"))
      .getField("cent_id")
    withCell.where(size(col("cell")) > 0)
      .select(col("vec_id") +: best.as("cent_id") +: keep.map(col): _*)
  }

  /** Memoized two-level assignment — the IVF² index build, the
    * `_build_ivf2_assign` bench entry (measured side by side with the
    * single-level `_build_ivf_assign` across all five decades).
    */
  private[graft] def ivf2AssignFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"ivf2asg:$dir") {
      ivf2Assign(Dedup.normedFor(spark, dir), centroidsMemoFor(spark, dir),
        coarseMemoFor(spark, dir))
    }

  /** Two-level-routed probe ids over the FULL corpus:
    * (vec_id, cent_id) rows where each vector routes through its
    * top-`coarseNprobe` coarse cells and probes the top-`finePerCell`
    * fine centroids within EACH routed cell — O(K1 + coarseNprobe·K/K1)
    * cosines per row instead of the single-level multiProbe's O(K).
    * Probed cells never duplicate (fine cells of distinct coarse cells
    * are disjoint: [[fineToCoarse]] is nprobe=1). Map-only like
    * [[multiProbe]]: both quantizer levels ride broadcasts. Feeds
    * [[Dedup.ivfHashminPairsFor]] (the production pair builds); the per-cell sort is bounded at ~√K structs.
    */
  private[graft] def ivf2ProbeIds(spark: SparkSession, dir: String,
      coarseNprobe: Int, finePerCell: Int,
      keep: Seq[String] = Nil): DataFrame =
    ivf2ProbeIdsOver(Dedup.normedFor(spark, dir),
      centroidsMemoFor(spark, dir), coarseMemoFor(spark, dir),
      coarseNprobe, finePerCell, keep)

  /** [[ivf2ProbeIds]] over an arbitrary (fine, coarse) quantizer pair —
    * the k-means production pair build routes with this since the
    * round-14 migration ([[kmCoarseMemoFor]] +
    * [[Clustering.kmeansCentroidsFor]]).
    */
  private[graft] def ivf2ProbeIdsOver(v: DataFrame, cents: DataFrame,
      coarse: DataFrame, coarseNprobe: Int, finePerCell: Int,
      keep: Seq[String] = Nil): DataFrame = {
    import graft.functions.VectorOps
    val coarseAsC = coarse.select(col("co_id").as("cent_id"),
      col("oe").as("ce"), col("ocn").as("cn"))
    val cm = cellMap(cents, fineToCoarse(cents, coarse))
    // `keep` rides the (map-only) probe pass through to the output: the
    // routing already holds every v column in hand, so a consumer that
    // needs e/nrm alongside the probed cent_id (the kNN seed build, the
    // labelProp query side) keeps them here instead of re-attaching them
    // with a corpus-sized join on vec_id afterwards (round 19 — that
    // join was a full shuffle+sort of the N·nprobe probe relation plus
    // the corpus at every scale past the broadcast threshold).
    multiProbe(v, coarseAsC, nprobe = coarseNprobe,
        keep = ("e" +: "nrm" +: keep).distinct)
      .withColumnRenamed("cent_id", "co_id")
      .crossJoin(broadcast(cm))
      .withColumn("cell", element_at(col("cellmap"), col("co_id")))
      .where(size(col("cell")) > 0)
      .select(col("vec_id") +: keep.map(col) :+
        explode(slice(array_sort(transform(col("cell"), c =>
          struct((-(VectorOps.dot(col("e"), c.getField("ce")) /
            (col("nrm") * c.getField("cn")))).as("negcos"),
            c.getField("cent_id").as("cent_id")))), 1, finePerCell)).as("p"): _*)
      .select(col("vec_id") +: keep.map(col) :+
        col("p.cent_id").as("cent_id"): _*)
  }

  /** IVF²-bucketed ANN: the query panel routes through its nearest
    * coarse cell, probes the top-2 fine centroids WITHIN that cell, and
    * exact-cosine top-5s the vectors of those fine buckets — the
    * two-level twin of [[annIvf]] (same panel, same output contract).
    * Query-side cost per panel row is O(K1 + K/K1) against the two
    * broadcast levels; candidate cost is bucket-restricted exactly as in
    * the single-level search.
    */
  def annIvf2(spark: SparkSession, dir: String): DataFrame =
    annIvf2Probe(spark, dir, coarseNprobe = 1)

  /** [[annIvf2]] with coarse-nprobe=2 — the recall dial the r13 audit
    * priced (`q_ivf2_recall`: 8 vs 11 hits /100 at sf1.0 for the
    * O(√N) → O(N^¼) routing saving): each query routes through its TOP-2
    * coarse cells and probes the top-2 fine centroids within each, so a
    * true neighbor whose fine bucket lives just across the coarse
    * boundary (the classic IMI edge loss) is back in scope. Probe cost
    * doubles — still O(N^¼)-shaped per query — and the candidate sets are
    * a strict superset of the nprobe=1 search's (top-1 coarse ∈ top-2,
    * same within-cell fine ranking), so recall is structurally ≥ the
    * base two-level search; whether it recovers the single-level search
    * is the measured `q_ivf2_recall` contract.
    */
  def annIvf2Np2(spark: SparkSession, dir: String): DataFrame =
    annIvf2Probe(spark, dir, coarseNprobe = 2)

  private def annIvf2Probe(spark: SparkSession, dir: String,
      coarseNprobe: Int): DataFrame = {
    import graft.functions.VectorOps
    val v = Dedup.normedFor(spark, dir)
    val cents = centroidsMemoFor(spark, dir)
    val coarse = coarseMemoFor(spark, dir)
    val assign = ivf2AssignFor(spark, dir)
    val coarseAsC = coarse.select(col("co_id").as("cent_id"),
      col("oe").as("ce"), col("ocn").as("cn"))
    val cm = cellMap(cents, fineToCoarse(cents, coarse))

    val panel = queryPanel(spark, dir, v)
    val q = panel.select(col("vec_id").as("q_id"), col("e").as("qe"),
      col("nrm").as("qn"))
    // one row per (query, routed coarse cell); the per-row top-2-fine
    // explode below then yields top-2 fine WITHIN EACH routed cell.
    // Fine cells of distinct coarse cells are disjoint (f2c is nprobe=1),
    // so probes — and hence candidates — never duplicate.
    val qco = multiProbe(panel, coarseAsC, nprobe = coarseNprobe,
        keep = Seq("e", "nrm"))
      .withColumnRenamed("cent_id", "co_id")
    // top-2 fine cells within the routed coarse cell (cell arrays are
    // ≤ ~K/K1 ≈ √K entries — a bounded per-row sort, the nprobe ≥ 2
    // shape), emitted NARROW so candidates enumerate without the query
    // vector riding the bucket join (the round-10 ivfPairs lesson)
    val probes = qco.crossJoin(broadcast(cm))
      .withColumn("cell", element_at(col("cellmap"), col("co_id")))
      .where(size(col("cell")) > 0)
      .select(col("vec_id").as("q_id"),
        explode(slice(array_sort(transform(col("cell"), c =>
          struct((-(VectorOps.dot(col("e"), c.getField("ce")) /
            (col("nrm") * c.getField("cn")))).as("negcos"),
            c.getField("cent_id").as("cent_id")))), 1, 2)).as("p"))
      .select(col("q_id"), col("p.cent_id").as("cent_id"))

    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    probes.join(assign, "cent_id")
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
      .join(broadcast(q), "q_id")
      .join(v, "vec_id")
      .select(col("q_id"), col("vec_id").as("n_id"),
        Dedup.cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= K)
      .orderBy("q_id", "rk")
  }

  /** Product-quantization ADC search — the memory-bound scale path for
    * embedding retrieval: vectors are stored as M=8 one-byte codes (one
    * per 8-dim subspace) instead of 64 doubles, and query distances are
    * asymmetric-distance-computation (ADC) sums of per-subspace L2²
    * lookups against a 16-entry codebook per subspace.
    *
    * Codebook: the subvectors of the 16 hash-min sample vectors (fixed
    * size, deterministic, oracle-replayable — a production build would
    * k-means each subspace, which changes only the codebook table).
    * Encoding is a per-(vector, subspace) argmin over 16 codewords using
    * the codegen'd [[graft.functions.L2Squared]]; the ADC table is the
    * same L2² against the query's subvectors, quantized to integer
    * micro-units so the 8-way sum is order-independent (bit-identical in
    * any engine, any shuffle order — a double sum would depend on
    * aggregation order).
    *
    * Scale shape: the codes relation is the index (8 small ints per
    * vector — the 64× compression that lets a 100 TB corpus's index fit
    * in cluster memory); the codebook and per-query ADC tables are
    * constant-size broadcasts; scoring is one map-side join + one
    * map-side-combined integer aggregation, no shuffle of the vectors
    * themselves. This full-scan form is the recall baseline; the serving
    * shape is [[pqIvfSearch]], which composes the same codes with the IVF
    * probe filter so each query scores its probed buckets, not the corpus.
    */
  def pqSearch(spark: SparkSession, dir: String): DataFrame =
    pqTopFor(spark, dir).orderBy("q_id", "rk")

  /** Memoized PQ top-5 relation (5·Q rows) — ADC scoring over the FULL
    * codes relation runs once per session, shared by `q_pq_search` and the
    * recall audit. The correctness baseline for the composed
    * [[pqIvfTopFor]]; O(Q·N) by construction.
    */
  private[graft] def pqTopFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqtop:$dir") {
      val wTop = Window.partitionBy(col("q_id")).orderBy(col("adc_q"), col("n_id"))
      pqCodesFor(spark, dir)
        .join(broadcast(pqDtabFor(spark, dir)), Seq("m", "code"))
        .where(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id").as("n_id"))
        .agg(sum(col("dq")).as("adc_q"))
        .withColumn("rk", row_number().over(wTop)).where(col("rk") <= K)
    }

  /** Long-format subvectors: (ids…, m, 8-dim slice), m = 0..7. Extra key
    * columns ride along (the residual encoder keys by (q_id, cent_id)).
    */
  private def pqSubs(df: DataFrame, ids: Seq[String], arr: String, out: String) =
    df.select(ids.map(col) :+ explode(array((0 to 7).map(m =>
        struct(lit(m).as("m"), slice(col(arr), m * 8 + 1, 8).as(out))): _*)).as("s"): _*)
      .select(ids.map(col) ++ Seq(col("s.m").as("m"), col(s"s.$out").as(out)): _*)

  /** Per-subspace codebook rows (code, m, cw): the subvectors of the 16
    * hash-min sample vectors — fixed size, deterministic, oracle-replayable.
    * `vecCol` selects the column to quantize (raw embeddings by default,
    * residuals for the IVFADC encoder) so every PQ variant shares ONE
    * sampling/tie-break/slicing implementation.
    */
  private[graft] def pqCodebookSub(v: DataFrame, vecCol: String = "e"): DataFrame = {
    val cb = v.select(col("vec_id").as("code"), col(vecCol).as("cbe"),
        Tables.portableHash(col("vec_id").cast("string")).as("hk"))
      .orderBy(col("hk"), col("code")).limit(16).select("code", "cbe")
    pqSubs(cb, Seq("code"), "cbe", "cw")
  }

  /** Memoized PQ codes relation (vec_id, m, code) — THE index: 8 one-byte
    * codes per vector, the 64× compression that lets a 100 TB corpus's
    * index fit in cluster memory. Shared by the full-scan and IVF-composed
    * searches.
    */
  private[graft] def pqCodesFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqcodes:$dir")(
      pqCodesBuild(spark, dir))

  /** Map-only PQ encode against an arbitrary per-subspace codebook:
    * nearest codeword per (vector, subspace), ties → min code. The 128-row
    * codebook collapses to ONE broadcast array row and the argmin is a
    * per-row fold (same shape as [[multiProbe]]; no N×8×16 shuffle through
    * a window), using the codegen'd [[graft.functions.L2Squared]]. Taking
    * the codebook as a parameter is the design property: the seed
    * (hash-min sample) and trained (Lloyd) codebooks encode through the
    * SAME operator, like the swappable IVF centroid tables.
    */
  private def pqEncode(vSub: DataFrame, cbSub: DataFrame): DataFrame = {
    import graft.functions.VectorOps.l2sq
    val cbArr = cbSub.agg(
      array_sort(collect_list(struct(col("m"), col("code"), col("cw"))))
        .as("cbs"))
    val best = slice(array_sort(transform(
      filter(col("cbs"), c => c.getField("m") === col("m")),
      c => struct(l2sq(col("sv"), c.getField("cw")).as("d"),
        c.getField("code").as("code")))), 1, 1)
    vSub.crossJoin(broadcast(cbArr))
      .select(col("vec_id"), col("m"),
        element_at(best, 1).getField("code").as("code"))
  }

  /** Per-query ADC table against an arbitrary per-subspace codebook:
    * (q_id, m, code, dq) in integer micro-units — Q×8×16 rows, a
    * constant-size broadcast per query batch. Integer units make the 8-way
    * sum order-independent (bit-identical in any engine, any shuffle
    * order — a double sum would depend on aggregation order).
    */
  private def pqAdcTable(q: DataFrame, cbSub: DataFrame): DataFrame = {
    import graft.functions.VectorOps.l2sq
    pqSubs(q, Seq("q_id"), "qe", "qs").join(broadcast(cbSub), "m")
      .select(col("q_id"), col("m"), col("code"),
        round(l2sq(col("qs"), col("cw")) * 1000000.0).cast("long").as("dq"))
  }

  /** Un-memoized encode builder (plan-audit surface): [[pqEncode]] against
    * the seed (hash-min sample) codebook.
    */
  private[graft] def pqCodesBuild(spark: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    pqEncode(pqSubs(v.select("vec_id", "e"), Seq("vec_id"), "e", "sv"),
      pqCodebookSub(v))
  }

  /** Memoized per-query ADC tables (q_id, m, code, dq) in integer
    * micro-units — Q×8×16 rows, a constant-size broadcast per query batch.
    * Integer units make the 8-way sum order-independent (bit-identical in
    * any engine, any shuffle order — a double sum would depend on
    * aggregation order).
    */
  private[graft] def pqDtabFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqdtab:$dir") {
      val v = Dedup.normedFor(spark, dir)
      val q = v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0)
        .select(col("vec_id").as("q_id"), col("e").as("qe"))
      pqAdcTable(q, pqCodebookSub(v))
    }

  /** K-means-TRAINED PQ codebook: `iters` Lloyd iterations in EACH of the
    * 8 subspaces, seeded by the hash-min sample codewords ([[pqCodebookSub]])
    * — the production codebook build the sampled codebook approximates
    * (mirrors [[Clustering.kmeansCentroids]] for the coarse quantizer).
    *
    * Assignment is the same map-only argmin the encoder uses (broadcast
    * codebook row, per-row fold, ties → min code); the update is an exact
    * integer micro-unit mean per (subspace, code, dim) — `sum div count`
    * over `round(x·1e6)` — so every iteration is bit-identical in DuckDB
    * and the oracle replays the whole loop. Codewords that lose all
    * members drop out deterministically in both engines. Cost per
    * iteration: one N·8-row map + one map-side-combined shuffle of
    * (m, code, dim) keyed rows — O(N·d); the codebook stays 8×16 at any
    * corpus size.
    */
  private[graft] def pqTrainedCodebookFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqcbtrain:$dir") {
      import graft.functions.VectorOps.l2sq
      val v = Dedup.normedFor(spark, dir)
      val vSub = pqSubs(v.select("vec_id", "e"), Seq("vec_id"), "e", "sv")
      var cbSub = pqCodebookSub(v)
      for (_ <- 1 to 2) {
        val cbArr = cbSub.agg(
          array_sort(collect_list(struct(col("m"), col("code"), col("cw"))))
            .as("cbs"))
        val best = slice(array_sort(transform(
          filter(col("cbs"), c => c.getField("m") === col("m")),
          c => struct(l2sq(col("sv"), c.getField("cw")).as("d"),
            c.getField("code").as("code")))), 1, 1)
        val assign = vSub.crossJoin(broadcast(cbArr))
          .select(col("m"), element_at(best, 1).getField("code").as("code"),
            col("sv"))
        val upd = assign
          .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("dim", "x")))
          .select(col("m"), col("code"), col("dim"),
            round(col("x") * 1000000.0).cast("long").as("q"))
          .groupBy("m", "code", "dim")
          .agg(expr("sum(q) div count(1)").as("cq"))
        cbSub = upd.groupBy("m", "code").agg(
          transform(array_sort(collect_list(struct(col("dim"), col("cq")))),
            s => s.getField("cq") / lit(1000000.0)).as("cw"))
      }
      cbSub.select("code", "m", "cw")
    }

  /** Recall@5 audit of the full seed/trained × full-scan/IVF matrix
    * against the exact brute-force top-5 — the "does codebook training buy
    * retrieval, and does it recover the probe loss" numbers side by side
    * (the PQ analog of `q_ann_recall_kmeans`, extended to the composed
    * serving shapes). One row: query count, per-variant hits, permille
    * recalls. Each comparison is a semi-join of two ≤ 5·Q-row relations,
    * so the audit costs nothing beyond the four searches it grades; at
    * 100 TB it runs on a query sample exactly like this one.
    */
  def pqRecallTrained(spark: SparkSession, dir: String): DataFrame = {
    val exact = annTopkFor(spark, dir).select(col("q_id"), col("n_id"))
    def hits(top: DataFrame, as: String) =
      exact.join(top.select("q_id", "n_id"), Seq("q_id", "n_id"), "left_semi")
        .agg(count(lit(1)).as(as))
    val nQ = exact.select("q_id").distinct().agg(count(lit(1)).as("n_queries"))
    nQ.crossJoin(hits(pqTopFor(spark, dir), "n_hits_seed"))
      .crossJoin(hits(pqIvfTopFor(spark, dir), "n_hits_seed_ivf"))
      .crossJoin(hits(pqTrainedTopFor(spark, dir), "n_hits_trained"))
      .crossJoin(hits(pqIvfTrainedTopFor(spark, dir), "n_hits_trained_ivf"))
      .select(col("n_queries"), col("n_hits_seed"), col("n_hits_seed_ivf"),
        col("n_hits_trained"), col("n_hits_trained_ivf"),
        expr("n_hits_seed * 1000 div (n_queries * 5)").as("recall_seed_permille"),
        expr("n_hits_seed_ivf * 1000 div (n_queries * 5)").as("recall_seed_ivf_permille"),
        expr("n_hits_trained * 1000 div (n_queries * 5)").as("recall_trained_permille"),
        expr("n_hits_trained_ivf * 1000 div (n_queries * 5)").as("recall_trained_ivf_permille"))
  }

  /** Memoized trained-codebook codes relation (vec_id, m, code):
    * [[pqEncode]] against [[pqTrainedCodebookFor]] — the trained index,
    * shared by the trained full-scan and trained∘IVF searches exactly as
    * [[pqCodesFor]] is by the seed-codebook pair.
    */
  private[graft] def pqTrainedCodesFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqtcodes:$dir") {
      val v = Dedup.normedFor(spark, dir)
      pqEncode(pqSubs(v.select("vec_id", "e"), Seq("vec_id"), "e", "sv"),
        pqTrainedCodebookFor(spark, dir))
    }

  /** Memoized trained-codebook per-query ADC tables — [[pqDtabFor]] with
    * the trained codewords swapped in.
    */
  private[graft] def pqTrainedDtabFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqtdtab:$dir") {
      val v = Dedup.normedFor(spark, dir)
      val q = v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0)
        .select(col("vec_id").as("q_id"), col("e").as("qe"))
      pqAdcTable(q, pqTrainedCodebookFor(spark, dir))
    }

  /** Memoized trained-codebook full-scan top-5 (5·Q rows): ADC over the
    * FULL trained codes relation — the same pipeline as [[pqTopFor]] with
    * the trained codewords swapped in (the swappability IS the design
    * property, like the IVF centroid tables).
    */
  private[graft] def pqTrainedTopFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqttop:$dir") {
      val wTop = Window.partitionBy(col("q_id")).orderBy(col("adc_q"), col("n_id"))
      pqTrainedCodesFor(spark, dir)
        .join(broadcast(pqTrainedDtabFor(spark, dir)), Seq("m", "code"))
        .where(col("vec_id") =!= col("q_id"))
        .groupBy(col("q_id"), col("vec_id").as("n_id"))
        .agg(sum(col("dq")).as("adc_q"))
        .withColumn("rk", row_number().over(wTop)).where(col("rk") <= K)
    }

  /** Per-bucket member codes (cent_id, vec_id, vcodes) — the serving-index
    * relation the streaming PQ∘IVF server probes per micro-batch: each
    * member vector's 8 (m, code) pairs pre-grouped into one sorted array
    * row, keyed by its coarse bucket.
    */
  private[graft] def memberCodes(assign: DataFrame, codes: DataFrame): DataFrame =
    assign.join(codes, "vec_id")
      .groupBy(col("cent_id"), col("vec_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("code")))).as("vcodes"))

  /** Memoized per-bucket member codes — grouping the corpus-sized
    * assign ⋈ codes ONCE per session (parquet memo) so each streaming
    * micro-batch pays only the probe join, not a full-corpus shuffle; the
    * Materialized analog of the serving index a deployed PQ∘IVF server
    * loads at startup.
    */
  private[graft] def memberCodesFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqmember:$dir")(
      memberCodes(ivfAssignFor(spark, dir), pqCodesFor(spark, dir)))

  /** PQ∘IVF composed search — the production serving shape at 100 TB: each
    * query ADC-scores ONLY the codes of vectors assigned to its `nprobe`
    * probed coarse buckets, dropping the scan from O(Q·N) to
    * O(Q·N·nprobe/C). The probe list comes from the same map-only
    * [[multiProbe]] the IVF search uses and the bucket restriction is an
    * equi-join on cent_id, so the full-corpus codes relation is touched
    * once, shuffled on its (small) join keys, never broadcast or
    * re-scored per query.
    */
  def pqIvfSearch(spark: SparkSession, dir: String): DataFrame =
    pqIvfTopFor(spark, dir).orderBy("q_id", "rk")

  /** Memoized PQ∘IVF top-5 relation (≤ 5·Q rows). */
  private[graft] def pqIvfTopFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqivftop:$dir")(
      pqIvfTopBuild(spark, dir))

  /** Un-memoized PQ∘IVF builder (plan-audit surface): probes ⋈ assignment
    * on cent_id → candidate (q_id, vec_id) pairs; candidates ⋈ codes on
    * vec_id; broadcast ADC-table join on (q_id, m, code); map-side-combined
    * integer aggregation; per-query top-`keep` (adc_q ASC, n_id). `keep`
    * defaults to the serving top-5; the exact-rerank refine stage widens it
    * to [[RerankC]] candidates per query.
    */
  private[graft] def pqIvfTopBuild(spark: SparkSession, dir: String,
      keep: Int = K): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    val assign = ivfAssignFor(spark, dir)
    val probes = multiProbe(v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0),
        centroidsMemoFor(spark, dir), nprobe = 2)
      .withColumnRenamed("vec_id", "q_id")
    val cand = probes.join(assign, "cent_id")
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("adc_q"), col("n_id"))
    cand.join(pqCodesFor(spark, dir), "vec_id")
      .join(broadcast(pqDtabFor(spark, dir)), Seq("q_id", "m", "code"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(sum(col("dq")).as("adc_q"))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= keep)
  }

  /** Trained-codebook PQ∘IVF search — the configuration every production
    * IVFPQ index actually ships: the Lloyd-trained codebook
    * ([[pqTrainedCodebookFor]]) supplies codes and ADC tables, and the IVF
    * probe restricts scoring to each query's nprobe buckets. Same
    * O(Q·N·nprobe/C) scan and join shape as [[pqIvfSearch]]; only the
    * codeword tables differ. [[pqRecallTrained]] reports seed/trained ×
    * full/IVF recall side by side — the audit that says whether codebook
    * training recovers the probe loss.
    */
  def pqIvfTrainedSearch(spark: SparkSession, dir: String): DataFrame =
    pqIvfTrainedTopFor(spark, dir).orderBy("q_id", "rk")

  /** Memoized trained-codebook PQ∘IVF top-5 relation (≤ 5·Q rows). */
  private[graft] def pqIvfTrainedTopFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqivfttop:$dir")(
      pqIvfTrainedTopBuild(spark, dir))

  /** Un-memoized trained PQ∘IVF builder (plan-audit surface): identical
    * join tree to [[pqIvfTopBuild]] — probes ⋈ assignment on cent_id;
    * candidates ⋈ codes on vec_id; broadcast ADC-table join on
    * (q_id, m, code); map-side-combined integer aggregation; per-query
    * top-5 — with the TRAINED codes/dtab relations swapped in.
    */
  private[graft] def pqIvfTrainedTopBuild(spark: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    val assign = ivfAssignFor(spark, dir)
    val probes = multiProbe(v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0),
        centroidsMemoFor(spark, dir), nprobe = 2)
      .withColumnRenamed("vec_id", "q_id")
    val cand = probes.join(assign, "cent_id")
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("adc_q"), col("n_id"))
    cand.join(pqTrainedCodesFor(spark, dir), "vec_id")
      .join(broadcast(pqTrainedDtabFor(spark, dir)), Seq("q_id", "m", "code"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(sum(col("dq")).as("adc_q"))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= K)
  }

  /** Recall@5 audit of BOTH PQ searches — the full-corpus ADC scan and the
    * PQ∘IVF composition — against the exact brute-force top-5 ([[annTopk]])
    * on the same query sample: the compression-loss AND probe-loss numbers
    * side by side (the `q_ann_recall` pattern applied to the PQ family).
    * One row: query count, per-variant top-5 hits, permille recalls. The
    * comparison is semi-joins of top-5 relations (≤ 5·Q rows each), so the
    * audit costs nothing beyond the searches it grades; at 100 TB it runs
    * on a query sample exactly like this one.
    */
  def pqRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = annTopkFor(spark, dir).select(col("q_id"), col("n_id"))
    val pq = pqTopFor(spark, dir).select(col("q_id"), col("n_id"))
    val pqi = pqIvfTopFor(spark, dir).select(col("q_id"), col("n_id"))
    val nQ = exact.select("q_id").distinct().agg(count(lit(1)).as("n_queries"))
    val nHit = exact.join(pq, Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    val nHitIvf = exact.join(pqi, Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits_ivf"))
    nQ.crossJoin(nHit).crossJoin(nHitIvf)
      .select(col("n_queries"), col("n_hits"), col("n_hits_ivf"),
        expr("n_hits * 1000 div (n_queries * 5)").as("recall_permille"),
        expr("n_hits_ivf * 1000 div (n_queries * 5)").as("recall_ivf_permille"))
  }

  /** Residual-PQ∘IVF top-5 (IVFADC proper): vectors are PQ-encoded on
    * their RESIDUAL to the assigned coarse centroid (`rv = e − ce`), and
    * each query builds one ADC table PER PROBED CENTROID from its own
    * residual (`qr = qe − ce`). On clustered corpora residuals
    * concentrate around the origin once the coarse offset is removed, so
    * the same 16-codeword budget quantizes them with less error than raw
    * vectors — this is the composition FAISS calls IVFADC and what
    * production embedding serving deploys. Whether it pays is
    * corpus-dependent, which is why [[pqResRecall]] measures it: on THIS
    * near-random synthetic corpus the coarse centroids explain almost no
    * variance, residuals are differences of near-orthogonal vectors
    * (≈√2 wider), and the measured recall DROPS (120‰ vs plain-PQ∘IVF
    * 192‰ at sf0.01) — the adversarial case the audit exists to catch.
    *
    * Scale shape: identical to [[pqIvfTopFor]] plus one broadcast centroid
    * join on each side; the per-query ADC table is nprobe× larger (one per
    * probed bucket) but still constant-size; scoring joins stay equi-keyed
    * on (vec_id, cent_id) / (q_id, cent_id, m, code). The residual
    * codebook reuses the hash-min sample ids, so the oracle replays the
    * whole build deterministically.
    */
  private[graft] def pqResidualTopFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqrtop:$dir") {
      import graft.functions.VectorOps.l2sq
      val v = Dedup.normedFor(spark, dir)
      val centsFull = centroidsMemoFor(spark, dir)
      val cents = centsFull.select(col("cent_id"), col("ce"))
      val assign = ivfAssignFor(spark, dir)
      val resv = v.join(assign, "vec_id").join(broadcast(cents), "cent_id")
        .select(col("vec_id"), col("cent_id"),
          zip_with(col("e"), col("ce"), (a, b) => a - b).as("rv"))
      val rcbSub = pqCodebookSub(resv, "rv")
      val rvSub = pqSubs(resv.select("vec_id", "rv"), Seq("vec_id"), "rv", "sv")
      val cbArr = rcbSub.agg(
        array_sort(collect_list(struct(col("m"), col("code"), col("cw"))))
          .as("cbs"))
      val best = slice(array_sort(transform(
        filter(col("cbs"), c => c.getField("m") === col("m")),
        c => struct(l2sq(col("sv"), c.getField("cw")).as("d"),
          c.getField("code").as("code")))), 1, 1)
      val codes = rvSub.crossJoin(broadcast(cbArr))
        .select(col("vec_id"), col("m"),
          element_at(best, 1).getField("code").as("code"))
        .join(assign, "vec_id")
      val qprobes = multiProbe(v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0),
          centsFull, nprobe = 2, keep = Seq("e"))
        .withColumnRenamed("vec_id", "q_id")
        .join(broadcast(cents), "cent_id")
        .select(col("q_id"), col("cent_id"),
          zip_with(col("e"), col("ce"), (a, b) => a - b).as("qr"))
      val qrSub = pqSubs(qprobes, Seq("q_id", "cent_id"), "qr", "qs")
      val rdtab = qrSub.join(broadcast(rcbSub), "m")
        .select(col("q_id"), col("cent_id"), col("m"), col("code"),
          round(l2sq(col("qs"), col("cw")) * 1000000.0).cast("long").as("dq"))
      val cand = qprobes.select("q_id", "cent_id").join(assign, "cent_id")
        .where(col("vec_id") =!= col("q_id"))
        .select("q_id", "cent_id", "vec_id")
      val wTop = Window.partitionBy(col("q_id")).orderBy(col("adc_q"), col("n_id"))
      cand.join(codes, Seq("vec_id", "cent_id"))
        .join(broadcast(rdtab), Seq("q_id", "cent_id", "m", "code"))
        .groupBy(col("q_id"), col("vec_id").as("n_id"))
        .agg(sum(col("dq")).as("adc_q"))
        .withColumn("rk", row_number().over(wTop)).where(col("rk") <= K)
    }

  /** The residual-PQ search as a driver query (q_id, n_id, adc_q, rk). */
  def pqResSearch(spark: SparkSession, dir: String): DataFrame =
    pqResidualTopFor(spark, dir).orderBy("q_id", "rk")

  /** Recall@5 of residual-PQ∘IVF vs plain PQ∘IVF against the exact top-5 —
    * the "does residual encoding pay for itself" number, measured per
    * corpus rather than assumed: it pays when the coarse quantizer
    * explains real variance (clustered embeddings) and costs recall when
    * it doesn't (this synthetic near-random corpus: 120‰ vs 192‰ at
    * sf0.01). A deployment flips between the raw and residual encoders on
    * exactly this audit.
    */
  def pqResRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = annTopkFor(spark, dir).select(col("q_id"), col("n_id"))
    val ivf = pqIvfTopFor(spark, dir).select(col("q_id"), col("n_id"))
    val res = pqResidualTopFor(spark, dir).select(col("q_id"), col("n_id"))
    val nQ = exact.select("q_id").distinct().agg(count(lit(1)).as("n_queries"))
    val nIvf = exact.join(ivf, Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits_ivf"))
    val nRes = exact.join(res, Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits_res"))
    nQ.crossJoin(nIvf).crossJoin(nRes)
      .select(col("n_queries"), col("n_hits_ivf"), col("n_hits_res"),
        expr("n_hits_ivf * 1000 div (n_queries * 5)").as("recall_ivf_permille"),
        expr("n_hits_res * 1000 div (n_queries * 5)").as("recall_res_permille"))
  }

  /** Cluster-vs-label agreement: per IVF bucket, the majority embedding
    * label and its permille purity — how well the unsupervised coarse
    * quantizer aligns with the labeled structure (the standard external
    * cluster-quality readout). One join + one aggregation + a window over
    * the per-bucket label counts (bounded by labels × centroids).
    */
  def ivfLabelPurity(spark: SparkSession, dir: String): DataFrame = {
    val asg = ivfAssignFor(spark, dir)
    val lab = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val cl = asg.join(lab, "vec_id")
      .groupBy("cent_id", "label").agg(count(lit(1)).as("n_lab"))
    val wTop = Window.partitionBy(col("cent_id"))
      .orderBy(col("n_lab").desc, col("label"))
    val wAll = Window.partitionBy(col("cent_id"))
    cl.withColumn("rk", row_number().over(wTop))
      .withColumn("n_total", sum(col("n_lab")).over(wAll))
      .where(col("rk") === 1)
      .select(col("cent_id"), col("label").as("majority_label"),
        col("n_lab").as("n_majority"), col("n_total"),
        expr("n_lab * 1000 div n_total").as("purity_permille"))
      .orderBy("cent_id")
  }

  /** IVF index health report: per-centroid bucket size and permille share
    * of the corpus. The number an ANN operator watches in production —
    * bucket imbalance is what turns nprobe into a latency lottery. One
    * groupBy over the assignment; the totals row is a broadcast scalar.
    */
  def ivfStats(spark: SparkSession, dir: String): DataFrame = {
    val counts = ivfAssignFor(spark, dir)
      .groupBy("cent_id").agg(count(lit(1)).as("n_vecs"))
    val total = counts.agg(sum(col("n_vecs")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col("cent_id"), col("n_vecs"),
        expr("n_vecs * 1000 div n_total").as("share_permille"))
      .orderBy("cent_id")
  }

  /** Incremental IVF index maintenance — the embedding-side analog of
    * [[Dedup.incrementalDedup]]'s recurring-crawl pass: an incoming shard
    * (vec_id % 5 = 0) is assigned against the PERSISTED coarse-centroid
    * table (the quantizer is NOT retrained — the same stateless
    * assignment [[graft.streaming.StreamingOps.ivfAssignStream]] runs
    * continuously), and the report says, per bucket, how much the shard
    * grew it and how far the merged bucket mean drifted from the
    * pre-shard mean — the `q_centroid_drift`-style readout a recurring
    * ingest keys its "retrain the quantizer?" decision on.
    *
    * Per bucket: pre-shard and shard member counts, permille growth,
    * the cosine (permille, floored; −1 when there is no pre-shard mean)
    * between the pre-shard member mean and the merged mean — means are
    * exact integer micro-unit `sum div count` per dimension, so DuckDB
    * replays them bit-for-bit — and the verdict: `reindex` when the
    * bucket is brand-new, grew ≥ 40%, or its mean moved below cos 950‰;
    * else `keep`.
    *
    * Scale shape: rides the memoized persisted assignment
    * ([[ivfAssignFor]]; shard membership is a predicate, so the old/new
    * split is a map over the index relation), one map-side-combined
    * (cent_id, dim) integer aggregation over member coordinates, and a
    * K-row report — shard-classification cost plus ONE scan of the
    * assignment, never corpus×corpus, exactly like the dedup twin.
    */
  def incrementalIvf(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps
    val v = Dedup.normedFor(spark, dir)
    val withV = ivfAssignFor(spark, dir).join(v.select("vec_id", "e"), "vec_id")
      .withColumn("is_new", col("vec_id") % 5 === 0)
    val growth = withV.groupBy("cent_id").agg(
      sum(when(col("is_new"), 0L).otherwise(1L)).as("n_old"),
      sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
    val sums = withV
      .select(col("cent_id"), col("is_new"), posexplode(col("e")).as(Seq("dim", "x")))
      .select(col("cent_id"), col("is_new"), col("dim"),
        round(col("x") * 1000000.0).cast("long").as("q"))
      .groupBy("cent_id", "dim")
      .agg(sum(when(!col("is_new"), col("q"))).as("so"),
        sum(when(!col("is_new"), 1L).otherwise(0L)).as("no"),
        sum(col("q")).as("sa"), count(lit(1)).as("na"))
    val means = sums.where(col("no") > 0)
      .select(col("cent_id"), col("dim"),
        expr("so div no").as("mo"), expr("sa div na").as("ma"))
    val drift = means.groupBy("cent_id").agg(
        transform(array_sort(collect_list(struct(col("dim"), col("mo")))),
          s => s.getField("mo") / lit(1000000.0)).as("om"),
        transform(array_sort(collect_list(struct(col("dim"), col("ma")))),
          s => s.getField("ma") / lit(1000000.0)).as("am"))
      .select(col("cent_id"),
        floor(lit(1000.0) * VectorOps.dot(col("om"), col("am")) /
          (sqrt(VectorOps.dot(col("om"), col("om"))) *
            sqrt(VectorOps.dot(col("am"), col("am"))))).cast("long").as("cosp"))
    growth.join(drift, Seq("cent_id"), "left")
      .select(col("cent_id"), col("n_old"), col("n_new"),
        expr("n_new * 1000 div greatest(n_old, 1)").as("growth_permille"),
        coalesce(col("cosp"), lit(-1L)).as("cos_permille"))
      .withColumn("verdict",
        when(col("n_old") === 0 || col("growth_permille") >= 400 ||
          col("cos_permille") < 950, lit("reindex")).otherwise(lit("keep")))
      .orderBy("cent_id")
  }

  /** Memoized per-dimension SQ8 scale artifact — ONE row
    * (sarr: array<double>, maxabs per dim, dim-ordered). The statistics a
    * deployed SQ8 index ships alongside the codes: queries quantize
    * against the SAME scales the corpus was encoded with (asymmetric
    * scales would bias every dot). One map-side-combinable aggregation
    * over the posexploded corpus, collapsed to a broadcastable scalar row.
    */
  private[graft] def sqScalesFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"sqscales:$dir") {
      Dedup.normedFor(spark, dir)
        .select(posexplode(transform(col("e"), x => x / col("nrm")))
          .as(Seq("dim", "x")))
        .groupBy("dim").agg(max(abs(col("x"))).as("maxabs"))
        .agg(array_sort(collect_list(struct(col("dim"), col("maxabs"))))
          .as("ss"))
        .select(transform(col("ss"), s => s.getField("maxabs")).as("sarr"))
    }

  /** Memoized SQ8 codes (vec_id, qe: array<bigint>): the UNIT vector
    * (e/nrm) quantized per-dimension to `round(127·x̂/maxabs_dim)` —
    * int8-range symmetric scalar quantization, the standard 4× compression
    * below which PQ takes over. Quantizing the NORMALIZED vector makes the
    * integer dot a cosine surrogate (raw-vector int dots would rank by
    * magnitude, not angle). Per-dim scales are one map-side-combinable
    * aggregation over the posexploded relation, collapsed to a single
    * 64-element broadcast array; encoding is map-only. All arithmetic
    * (double divide, half-away-from-zero round) is bit-identical in
    * DuckDB, so the oracle replays the codes exactly.
    */
  private[graft] def sqCodesFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"sqcodes:$dir")(
      sqCodesBuild(spark, dir))

  /** Un-memoized SQ8 encoder (plan-audit surface): the only join is the
    * ONE-row scale-array broadcast — the corpus never shuffles.
    */
  private[graft] def sqCodesBuild(spark: SparkSession, dir: String): DataFrame = {
    val vn = Dedup.normedFor(spark, dir)
      .select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("en"))
    vn.crossJoin(broadcast(sqScalesFor(spark, dir)))
      .select(col("vec_id"),
        zip_with(col("en"), col("sarr"),
          (x, s) => round(x * lit(127.0) / s).cast("long")).as("qe"))
  }

  /** Memoized SQ8 top-5 relation: brute-force integer-dot scan over the
    * codes — O(Q·N) like [[annTopkFor]] but on 64 int8-range values per
    * vector instead of 64 doubles (4× memory traffic; SIMD int8 dot on
    * real hardware). The int dot is pure int64 arithmetic
    * ([[graft.functions.LongDot]]): order-independent, engine-exact —
    * the one ANN score in the family that needs NO float-fold discipline.
    */
  private[graft] def sqTopFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"sqtop:$dir") {
      import graft.functions.VectorOps.ldot
      val codes = sqCodesFor(spark, dir)
      val q = codes.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0)
        .select(col("vec_id").as("q_id"), col("qe").as("qq"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("dot").desc, col("n_id"))
      broadcast(q).join(codes, col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          ldot(col("qq"), col("qe")).as("dot"))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= K)
    }

  /** SQ8 top-5 per sampled query by integer dot (desc, ties → min n_id). */
  def sqSearch(spark: SparkSession, dir: String): DataFrame =
    sqTopFor(spark, dir).orderBy("q_id", "rk")

  /** Memoized per-bucket SQ8 code index (cent_id, vec_id, qe) — the
    * relation an SQ8∘IVF server loads at startup, pre-grouped by coarse
    * bucket exactly like [[memberCodesFor]] is for PQ: a micro-batch (or
    * batch probe set) pays only the cent_id equi-join, never a re-group
    * of the corpus-sized codes relation.
    */
  private[graft] def memberSqCodesFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"sqmember:$dir") {
      ivfAssignFor(spark, dir).select("vec_id", "cent_id")
        .join(sqCodesFor(spark, dir), "vec_id")
    }

  /** Memoized SQ8∘IVF top-5 (≤ 5·Q rows): the IVF probe supplies the
    * candidate set (O(Q·N·nprobe/C)), the integer dot supplies the
    * score — the SQ8 analogue of [[pqIvfTopFor]] and the scale path for
    * int8 serving (the full-scan [[sqTopFor]] is its correctness
    * baseline exactly as [[pqTopFor]] is for PQ∘IVF).
    */
  private[graft] def sqIvfTopFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"sqivftop:$dir")(
      sqIvfTopBuild(spark, dir))

  /** Un-memoized SQ8∘IVF builder (plan-audit surface): probes ⋈ bucket
    * index on cent_id, broadcast query codes, codegen'd int64 dot,
    * per-query top-5.
    */
  private[graft] def sqIvfTopBuild(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps.ldot
    val v = Dedup.normedFor(spark, dir)
    val probes = multiProbe(v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0),
        centroidsMemoFor(spark, dir), nprobe = 2)
      .withColumnRenamed("vec_id", "q_id")
    val qq = sqCodesFor(spark, dir).where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0)
      .select(col("vec_id").as("q_id"), col("qe").as("qq"))
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("dot").desc, col("n_id"))
    probes.join(broadcast(qq), "q_id")
      .join(memberSqCodesFor(spark, dir), "cent_id")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        ldot(col("qq"), col("qe")).as("dot"))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= K)
  }

  /** SQ8∘IVF top-5 per sampled query (int dot desc, ties → min n_id). */
  def sqIvfSearch(spark: SparkSession, dir: String): DataFrame =
    sqIvfTopFor(spark, dir).orderBy("q_id", "rk")

  /** Recall of the SQ8 integer-dot top-5 — full scan AND ∘IVF — against
    * the exact cosine top-5: the quality side of the 4× compression. The
    * full-scan column isolates quantization noise (same candidate set as
    * the exact scan); the IVF column adds probe-coverage loss on top,
    * the same two-factor decomposition [[pqRecall]] reports for PQ.
    */
  def sqRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = annTopkFor(spark, dir).select(col("q_id"), col("n_id"))
    val nQ = exact.select("q_id").distinct().agg(count(lit(1)).as("n_queries"))
    val nHit = exact
      .join(sqTopFor(spark, dir).select("q_id", "n_id"),
        Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    val nHitIvf = exact
      .join(sqIvfTopFor(spark, dir).select("q_id", "n_id"),
        Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits_ivf"))
    nQ.crossJoin(nHit).crossJoin(nHitIvf)
      .select(col("n_queries"), col("n_hits"), col("n_hits_ivf"),
        expr("n_hits * 1000 div (n_queries * 5)").as("recall_permille"),
        expr("n_hits_ivf * 1000 div (n_queries * 5)").as("recall_ivf_permille"))
  }

  /** Corpus embedding-health report: per-dimension count, micro-unit sum,
    * sum of squares, and max|x| — the moments that expose dead dimensions
    * (tiny variance → candidates for matryoshka-style truncation), scale
    * drift between ingests, and outlier dims that would dominate an
    * unnormalized distance. One map-side-combinable aggregation over the
    * posexploded corpus; 64 output rows at any corpus size.
    *
    * Sums are reported RAW (no mean/variance division): integer division
    * of negative sums rounds differently across engines (trunc vs floor),
    * so the oracle-exact contract is the moments themselves — consumers
    * derive mean/var in their own numeric domain. Micro-unit int64
    * squares hold to ~10⁹ vectors; beyond that, widen to decimal or
    * drop to milli-units (same operator shape).
    */
  def embedStats(spark: SparkSession, dir: String): DataFrame =
    Dedup.normedFor(spark, dir)
      .select(posexplode(col("e")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        round(col("x") * 1000000.0).cast("long").as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sum_micro"),
        sum(col("q") * col("q")).as("sumsq_micro2"),
        max(abs(col("q"))).as("maxabs_micro"))
      .orderBy("dim")

  /** Recall of truncated-dimension (matryoshka-style) search: cosine over
    * the FIRST 16 of 64 dimensions vs the full-dimension exact top-5. The
    * cheap pre-ranking stage of a coarse-to-fine pipeline — 4× less
    * memory traffic per candidate, no index to maintain; the audit
    * quantifies what the truncation costs on THIS corpus (embeddings
    * trained with matryoshka losses front-load information, random ones
    * don't — the recall number is the evidence either way).
    */
  def mrlRecall(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorOps.dot
    val t = Dedup.normedFor(spark, dir)
      .select(col("vec_id"), slice(col("e"), 1, 16).as("e16"))
      .withColumn("n16", sqrt(dot(col("e16"), col("e16"))))
    val q = t.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0)
      .select(col("vec_id").as("q_id"), col("e16").as("q16"),
        col("n16").as("qn"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    val top16 = broadcast(q).join(t, col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot(col("q16"), col("e16")) / (col("qn") * col("n16"))).as("cos"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= K)
    val exact = annTopkFor(spark, dir).select(col("q_id"), col("n_id"))
    val nQ = exact.select("q_id").distinct().agg(count(lit(1)).as("n_queries"))
    val nHit = exact.join(top16.select("q_id", "n_id"),
        Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    nQ.crossJoin(nHit)
      .select(col("n_queries"), col("n_hits"),
        expr("n_hits * 1000 div (n_queries * 5)").as("recall_permille"))
  }

  /** Candidate width of the exact-rerank refine stage: how many ADC-ranked
    * candidates per query get exact re-scoring. A constant — the refine
    * cost is O(Q·RerankC) full-dimension dots regardless of corpus size.
    */
  private[graft] val RerankC = 32

  /** Memoized WIDE PQ∘IVF candidate relation (≤ RerankC·Q rows): the same
    * probe ⋈ codes ⋈ ADC join tree as [[pqIvfTopFor]], keeping the top
    * [[RerankC]] per query instead of 5 — the candidate-generation stage
    * of the two-stage serving pipeline.
    */
  private[graft] def pqIvfWideFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pqivfwide:$dir")(
      pqIvfTopBuild(spark, dir, RerankC))

  /** Exact-rerank refine stage — the production two-stage ANN serving
    * shape (a compressed index generates candidates, full-precision
    * vectors re-score only those): the [[RerankC]] ADC-ranked PQ∘IVF
    * candidates per query are re-scored with the exact full-dimension
    * cosine and the top-5 re-emitted. Cost over the candidate stage is
    * O(Q·RerankC) exact dots — per-query constant, corpus-size-free —
    * and the candidate ⋈ vectors join is an equi-join on vec_id against
    * the corpus relation (shuffles ≤ RerankC·Q candidate rows, never
    * re-scans the corpus). [[rerankRecall]] quantifies what the refine
    * stage buys over raw ADC ranking on this corpus.
    */
  def rerankSearch(spark: SparkSession, dir: String): DataFrame =
    rerankTopFor(spark, dir).orderBy("q_id", "rk")

  /** Memoized rerank top-5 relation (≤ 5·Q rows). */
  private[graft] def rerankTopFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"reranktop:$dir")(
      rerankTopBuild(spark, dir))

  /** Un-memoized rerank builder (plan-audit surface): wide candidates ⋈
    * corpus vectors on n_id (equi-join), query vectors broadcast (Q ≪ N),
    * exact cosine, per-query top-5 (cos DESC, n_id).
    */
  private[graft] def rerankTopBuild(spark: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    val q = v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0)
      .select(col("vec_id").as("q_id"), col("e").as("qe"), col("nrm").as("qn"))
    val cand = pqIvfWideFor(spark, dir).select("q_id", "n_id")
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    cand
      .join(v.select(col("vec_id").as("n_id"), col("e"), col("nrm")), "n_id")
      .join(broadcast(q), "q_id")
      .select(col("q_id"), col("n_id"),
        Dedup.cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= K)
  }

  /** Recall@5 audit of the two-stage pipeline: raw PQ∘IVF top-5 vs the
    * exact-reranked top-5, both against the exact brute-force truth — the
    * number that says what full-precision refinement recovers of the
    * ADC compression loss. Semi-joins of ≤ 5·Q-row relations; costs
    * nothing beyond the searches it grades.
    */
  def rerankRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = annTopkFor(spark, dir).select(col("q_id"), col("n_id"))
    val ivf = pqIvfTopFor(spark, dir).select(col("q_id"), col("n_id"))
    val rr = rerankTopFor(spark, dir).select(col("q_id"), col("n_id"))
    val nQ = exact.select("q_id").distinct().agg(count(lit(1)).as("n_queries"))
    val nIvf = exact.join(ivf, Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits_ivf"))
    val nRr = exact.join(rr, Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits_rerank"))
    nQ.crossJoin(nIvf).crossJoin(nRr)
      .select(col("n_queries"), col("n_hits_ivf"), col("n_hits_rerank"),
        expr("n_hits_ivf * 1000 div (n_queries * 5)").as("recall_ivf_permille"),
        expr("n_hits_rerank * 1000 div (n_queries * 5)")
          .as("recall_rerank_permille"))
  }

  /** Hard-negative mining for embedding-model training: for each sampled
    * query, the 3 most-similar corpus vectors carrying a DIFFERENT label —
    * the near-misses a contrastive trainer wants as negatives (easy
    * random negatives teach nothing; the hardest ones sit right at the
    * decision boundary). Candidates come from the same nprobe=2 IVF probe
    * the ANN search uses, so mining cost is O(Q·N·nprobe/C) exactly like
    * a search — never an all-pairs scan — and the label filter is a
    * predicate on the candidate rows after two equi-joins against the
    * K-row label relation. Emits (q_id, q_label, n_id, n_label, cos, rk).
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    labeledCandCos(spark, dir)
      .where(col("n_label") =!= col("q_label"))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") <= 3)
      .orderBy("q_id", "rk")
  }

  /** Shared labeled-candidate relation of the mining family: every
    * (sampled query, IVF-probed candidate) pair with both labels and the
    * exact cosine — the nprobe=2 candidate generation of the ANN search
    * with the K-row label relation equi-joined on. [[hardNegatives]] and
    * [[tripletMine]] are rank selections over this one relation.
    */
  private[graft] def labeledCandCos(spark: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    val lab = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val probes = multiProbe(v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0),
        centroidsMemoFor(spark, dir), nprobe = 2)
      .withColumnRenamed("vec_id", "q_id")
    val cand = probes.join(ivfAssignFor(spark, dir), "cent_id")
      .where(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
    val q = v.where(col("vec_id") % panelStep(corpusN(spark, dir)) === 0)
      .join(lab, "vec_id")
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("label").as("q_label"))
    cand
      .join(v.select(col("vec_id"), col("e"), col("nrm")), "vec_id")
      .join(lab, "vec_id")
      .join(broadcast(q), "q_id")
      .select(col("q_id"), col("q_label"), col("vec_id").as("n_id"),
        col("label").as("n_label"),
        Dedup.cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("cos"))
  }

  /** Contrastive triplet mining: per sampled anchor, the nearest SAME-label
    * candidate (the positive) and the nearest DIFFERENT-label candidate
    * (the hard negative) with the anchor-relative margin — the
    * (anchor, positive, negative) training example a triplet/InfoNCE loss
    * consumes, mined at ANN-search cost (both selections are rank-1
    * windows over the one IVF-probed candidate relation; anchors lacking
    * either side drop out via the inner join). A small or negative margin
    * marks exactly the anchors worth training on.
    */
  def tripletMine(spark: SparkSession, dir: String): DataFrame = {
    val cand = labeledCandCos(spark, dir)
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    val pos = cand.where(col("n_label") === col("q_label"))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") === 1)
      .select(col("q_id"), col("q_label"),
        col("n_id").as("pos_id"), col("cos").as("pos_cos"))
    val neg = cand.where(col("n_label") =!= col("q_label"))
      .withColumn("rk", row_number().over(wTop)).where(col("rk") === 1)
      .select(col("q_id"), col("n_id").as("neg_id"), col("cos").as("neg_cos"))
    pos.join(neg, "q_id")
      .select(col("q_id"), col("q_label"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"),
        (col("pos_cos") - col("neg_cos")).as("margin"))
      .orderBy("q_id")
  }

  /** MRR@5 audit of both IVF indexes against the exact nearest neighbor —
    * the rank-sensitive companion to the recall audits: recall@5 says the
    * true neighbor is SOMEWHERE in the top-5, MRR says how high. The
    * relevant item is the exact rank-1 neighbor ([[annTopkFor]]); its
    * reciprocal rank inside [[annIvf]] / [[annIvfKmeans]] top-5s is summed
    * as `1000 div rank` (integer-exact, no float) and averaged over
    * queries. One row out; every input is a memo-backed relation, so the
    * audit costs three joins over Q-row tables.
    */
  def annMrr(spark: SparkSession, dir: String): DataFrame = {
    val ex1 = annTopkFor(spark, dir).where(col("rk") === 1)
      .select(col("q_id"), col("n_id"))
    def rrOf(appr: DataFrame, hits: String, rr: String): DataFrame =
      ex1.join(appr.select(col("q_id"), col("n_id"), col("rk")),
          Seq("q_id", "n_id"), "left")
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("rk").isNotNull, 1L).otherwise(0L)).as(hits),
          sum(when(col("rk").isNotNull, expr("1000 div rk")).otherwise(0L))
            .as(rr))
    val h = rrOf(annIvf(spark, dir), "hits_ivf", "rr_ivf")
    val k = rrOf(annIvfKmeans(spark, dir), "hits_km", "rr_km")
      .drop("n_queries")
    h.crossJoin(broadcast(k))
      .select(col("n_queries"), col("hits_ivf"),
        expr("rr_ivf div n_queries").as("mrr_ivf_milli"),
        col("hits_km"),
        expr("rr_km div n_queries").as("mrr_km_milli"))
  }

  /** MRR@5/hit audit of the TWO-LEVEL search (coarse-nprobe 1 AND 2)
    * against the single-level one, all scored vs the exact rank-1
    * neighbor on the shared panel — the number that prices the two-level
    * router's cell-level recall trade (a query routed to the wrong
    * coarse cell can't see its true neighbor's fine bucket) against the
    * O(√N) → O(N^¼) probe saving, and (round 14) what the nprobe=2
    * router buys back. Same integer-milli MRR contract as [[annMrr]];
    * the DuckDB oracle replays all three searches and the exact baseline.
    */
  def ivf2Mrr(spark: SparkSession, dir: String): DataFrame = {
    val ex1 = annTopkFor(spark, dir).where(col("rk") === 1)
      .select(col("q_id"), col("n_id"))
    def rrOf(appr: DataFrame, hits: String, rr: String): DataFrame =
      ex1.join(appr.select(col("q_id"), col("n_id"), col("rk")),
          Seq("q_id", "n_id"), "left")
        .agg(count(lit(1)).as("n_queries"),
          sum(when(col("rk").isNotNull, 1L).otherwise(0L)).as(hits),
          sum(when(col("rk").isNotNull, expr("1000 div rk")).otherwise(0L))
            .as(rr))
    val h = rrOf(annIvf(spark, dir), "hits_ivf", "rr_ivf")
    val t = rrOf(annIvf2(spark, dir), "hits_ivf2", "rr_ivf2")
      .drop("n_queries")
    val t2 = rrOf(annIvf2Np2(spark, dir), "hits_ivf2_np2", "rr_ivf2_np2")
      .drop("n_queries")
    h.crossJoin(broadcast(t)).crossJoin(broadcast(t2))
      .select(col("n_queries"), col("hits_ivf"),
        expr("rr_ivf div n_queries").as("mrr_ivf_milli"),
        col("hits_ivf2"),
        expr("rr_ivf2 div n_queries").as("mrr_ivf2_milli"),
        col("hits_ivf2_np2"),
        expr("rr_ivf2_np2 div n_queries").as("mrr_ivf2_np2_milli"))
  }

  /** Power-iteration rounds for [[pcaPower]]. */
  private[graft] val PcaIters = 8

  /** Principal component of the embedding cloud by distributed covariance +
    * power iteration — the measurement behind embedding whitening and
    * anisotropy checks (a transformer embedding space is typically
    * dominated by one rogue direction; λ₁/trace says how badly).
    *
    * Determinism contract: embeddings are milli-quantized
    * (`round(x·1000)` int64, the [[embedStats]] idiom one scale down), so
    * every second-moment entry C_ij = Σ x_i·x_j is an EXACT int64 sum —
    * aggregation-order-free in both engines. The 64×64 power iteration
    * ([[PcaIters]] rounds from the uniform unit vector) then runs in
    * driver-local IEEE doubles with a pinned left-to-right fold order,
    * which the DuckDB oracle replays verbatim via ordered-list folds — so
    * even the eigenvector is hash-verified. (Quantized products stay below
    * 2⁵³ per term; the int64 SUM is exact to ±9·10¹⁸ — beyond ~10⁹ vectors
    * the double CONVERSION of C_ij rounds, which shifts the estimate by
    * <1e-6 relative and matters to nobody at that scale.)
    *
    * Scale shape: the covariance is ONE pass — a per-vector 64×64
    * self-pair explode that partial-aggregates map-side to ≤4096 rows per
    * partition, then a 4096-row final aggregate; the iteration touches
    * only that 4096-entry matrix. 100× data changes the scan, nothing
    * else.
    *
    * Output per dimension: the principal-axis coordinate in floor-micros,
    * plus the (constant) λ₁ floor and explained-share permille.
    */
  /** Milli-quantized int64 codes for the moment accumulation. */
  private[graft] def pcaXqFor(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")))
      .toDF("vec_id", "d", "x")
      .select(col("vec_id"), col("d").cast("long").as("d"),
        round(col("x") * 1000.0).cast("long").as("xq"))

  /** The memoized principal-axis artifact: one row per dimension with the
    * converged power-iteration coordinate (double — parquet round-trips
    * bits exactly, MaterializedSpec), plus the constant λ₁ and trace. The
    * persisted "whitening model" [[pcaPower]] reports and
    * [[whitenCheck]] applies.
    */
  private[graft] def pcaAxisFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"pcaaxis:$dir") {
      val xq = pcaXqFor(spark, dir)
      val cov = xq.as("a").join(xq.as("b"), "vec_id")
        .select(col("a.d").as("i"), col("b.d").as("j"),
          (col("a.xq") * col("b.xq")).as("p"))
        .groupBy("i", "j").agg(sum(col("p")).as("c"))
      val entries = cov.collect()  // exactly 64×64 rows at ANY corpus size
      val c = Array.ofDim[Double](64, 64)
      var trace = 0L
      entries.foreach { r =>
        val (i, j, v) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))
        c(i)(j) = v.toDouble
        if (i == j) trace += v
      }
      var v = Array.fill(64)(0.125) // 1/sqrt(64), exact in binary
      var lam = 0.0
      for (_ <- 1 to PcaIters) {
        // pinned fold order (j then i ascending) — the oracle's ordered-
        // list left folds reproduce these exact doubles
        val w = Array.tabulate(64) { i =>
          var s = 0.0; var j = 0
          while (j < 64) { s += c(i)(j) * v(j); j += 1 }; s
        }
        var n2 = 0.0; var i = 0
        while (i < 64) { n2 += w(i) * w(i); i += 1 }
        lam = math.sqrt(n2)
        v = w.map(_ / lam)
      }
      import spark.implicits._
      v.zipWithIndex.toSeq
        .map { case (x, d) => (d.toLong, x, lam, trace) }
        .toDF("dim", "vv", "lam", "trace")
    }

  def pcaPower(spark: SparkSession, dir: String): DataFrame =
    pcaAxisFor(spark, dir)
      .select(col("dim"),
        floor(col("vv") * lit(1000000.0)).cast("long").as("eig_micros"),
        floor(col("lam")).cast("long").as("lambda_floor"),
        floor((col("lam") * lit(1000.0)) / col("trace")).cast("long")
          .as("ev_permille"))
      .orderBy("dim")

  /** Anisotropy before/after principal-direction removal — the check that
    * says whether the embedding cloud is dominated by one rogue direction
    * (Mu & Viswanath 2018's all-but-the-top, Ethayarajh 2019's anisotropy
    * measurements) and how much nulling it out helps.
    *
    * Anisotropy proxy: ‖Σx‖² / (n · Σ‖x‖²) in permille — 0 for a
    * perfectly centered cloud, 1000 when every vector is the same ray.
    * Both stages aggregate MILLI-QUANTIZED int64 codes, so all corpus
    * sums are exact and order-free; the `whitened` stage first subtracts
    * each vector's projection on the [[pcaAxisFor]] axis in IEEE doubles
    * (per-row map, pinned fold order) and re-quantizes.
    *
    * Int64-exactness bound (TIGHTER than [[pcaAxisFor]]'s ~1e9-vector
    * covariance bound): `mu_sq` squares the per-dimension code sums, so a
    * strongly anisotropic corpus overflows it once |Σ xq| exceeds ~3.8e8
    * per dimension (3.8e8² × 64 ≈ 2^63) — roughly 4e5 unit-norm vectors
    * all on one ray, though 1000× more for a centered cloud where the
    * sums cancel. The `aniso_permille` READOUT is therefore computed in
    * IEEE doubles (floor of a ≤1000 ratio — a diagnostics number, not a
    * hash-critical exact sum; both engines run the identical double ops
    * so the compare still hash-verifies); the exact int64 `mu_sq`/
    * `sum_sq` columns remain subject to the documented bound.
    *
    * Scale shape: one pass per stage (map + two bounded aggregations:
    * per-dim sums → 64 rows, and one grand total); the axis is a 64-row
    * broadcast literal. The moment build itself is [[pcaAxisFor]]'s
    * session memo, paid once.
    */
  def whitenCheck(spark: SparkSession, dir: String): DataFrame = {
    val axis = pcaAxisFor(spark, dir).orderBy("dim")
      .select("vv").collect().map(_.getDouble(0))
    val vLit = array(axis.map(lit): _*)
    val raw = pcaXqFor(spark, dir).select(col("vec_id"), col("d"), col("xq"))
    val whit = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("proj", graft.functions.VectorOps.dot(col("e"), vLit))
      .select(col("vec_id"),
        posexplode(zip_with(col("e"), vLit,
          (x, vi) => x - col("proj") * vi)))
      .toDF("vec_id", "d", "x")
      .select(col("vec_id"), col("d").cast("long").as("d"),
        round(col("x") * 1000.0).cast("long").as("xq"))
    def stage(name: String, q: DataFrame): DataFrame = {
      val dimSums = q.groupBy("d").agg(sum(col("xq")).as("s"))
      val mu = dimSums.agg(sum(col("s") * col("s")).as("mu_sq"))
      val tot = q.agg(
        (countDistinct(col("vec_id"))).as("n_vecs"),
        sum(col("xq") * col("xq")).as("sum_sq"))
      tot.crossJoin(broadcast(mu))
        .select(lit(name).as("stage"), col("n_vecs"), col("sum_sq"),
          col("mu_sq"),
          floor((col("mu_sq").cast("double") * lit(1000.0)) /
            (col("n_vecs").cast("double") * col("sum_sq").cast("double")))
            .cast("long").as("aniso_permille"))
    }
    stage("raw", raw).unionAll(stage("whitened", whit)).orderBy("stage")
  }
}
