package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighborhood-graph operators over the embedding corpus: the kNN graph
  * build and the kNN-classifier pseudo-labeling pass that consumes it —
  * the auto-labeling step of a training-data pipeline (label a small seed
  * set by hand, propagate to the unlabeled corpus by nearest labeled
  * neighbors).
  *
  * Both ride the session IVF index: candidates are IVF-probed, never
  * all-pairs, so the candidate volume is O(N · nprobe · B) spread over
  * (bucket) keys — the same shape every ANN search in this engine uses,
  * and the one that survives a 100 TB corpus. Since round 15 the graph
  * build's per-row index work is TWO-LEVEL ROUTED
  * ([[Similarity.ivf2ProbeIds]] / [[Similarity.ivf2AssignFor]]):
  * O(K1 + K/K1) ≈ O(N^¼) cosines per row instead of the single-level
  * O(K) = O(√N) — the same exponent retirement the round-14 pair-build
  * migration measured 2× at sf10.
  */
object Neighbors {
  /** Neighbors retained per vector in the graph. */
  private[graft] val GraphK = 5

  /** Probe width of the kNN-graph build: each vector routes through its
    * top-4 coarse cells and probes the top-4 fine centroids within each
    * — 16 probed buckets. Chosen by the round-16 sweep
    * ([[graft.KnnProbeAudit]] over coarse × fine × [[KnnMemberCap]]
    * against the `q_knn_recall` contract): the r15 2×2@128 probe's
    * recall decayed ~1/√N (238/76/26‰ at sf0.1/1/10 — a fixed 512-
    * candidate scan of a growing corpus); 4×4@256 reads 582/314/154‰
    * (2.4×/4.1×/5.9×) at unchanged sf0.1 wall, ~2× sf1.0 wall
    * (3.2 → 6.1 s in-chain) and ~7× sf10 wall (70 s in-group, 88 s
    * isolated — the linear price of 8× the candidate volume; see
    * SCALING.md round-16 for the full grid, including the rejected
    * arms: 4×4@512 doubled sf10 wall for +13% recall, 4×6@256 cost
    * +57% for +32%). The old 2×2@128 point was not a defensible
    * trade to keep: at 26‰ the sf10 graph was 97% outside the exact
    * top-5, semantically breaking every downstream consumer
    * (mutual-kNN clustering, label propagation) at scale.
    */
  private[graft] val KnnCoarseNprobe = 4
  private[graft] val KnnFinePerCell = 4

  /** Per-bucket member-pool cap of the graph build (salted hash-min, the
    * [[Dedup.PairCapB]] mechanism) — its own dial since round 16, priced
    * by the same sweep: at sf10 (occupancy ≈ 319) lifting 128 → 256
    * nearly doubled recall (84 → 154‰ at 4×4) while the wall moved
    * inside window noise — the cap axis is nearly free until it stops
    * binding, because candidate volume hides under the probe pass and
    * top-k window's fixed costs. 512 (cap no longer binding at sf10)
    * doubled the wall for +13% — rejected.
    */
  private[graft] val KnnMemberCap = 256

  /** NN-descent refinement rounds applied on top of the probe build
    * (round 17; SCALE-AWARE since round 18). The round-16 sweeps proved
    * the probe axis is exhausted:
    * recall under ANY fixed probe decays ~1/√N because a constant
    * candidate budget scans a constant slice of a growing corpus, and
    * widening the probe buys recall sublinearly in wall along the whole
    * measured grid (4×4@512 = 2× sf10 wall for +13%; 4×6@256 = +57% for
    * +32%). NN-descent (Dong, Moses & Li, WWW'11: "a neighbor of a
    * neighbor is likely a neighbor") escapes that trap structurally —
    * each round proposes the 2-hop neighborhood of the CURRENT graph as
    * candidates, exact-cosine-scores them, and keeps the per-src top-
    * [[KnnWorkK]] of incumbents ∪ proposals. Cost per round is
    * O(N · (2·[[KnnWorkK]])²) candidate rows — INDEPENDENT of corpus size
    * per vector, ~40× smaller than the probe pass's candidate volume at
    * sf10 — and recall is monotone in rounds because incumbents are
    * re-scored with the same exact cosine and can only be displaced by
    * strictly better candidates.
    *
    * ROUND COUNT: 2 at every scale — the axis is measured EXHAUSTED, not
    * assumed converged. The round-17 sweep rejected round 3 at sf1.0
    * (650 → 652‰) but left the sf10 gradient formally open (356 → 372‰
    * at round 2, round walls collapsing — the consolidation shape); the
    * round-18 sweep closed it ([[graft.KnnRefineAudit]] rounds 0–5 at
    * sf10, `bench_ref/knn_refine_sweep_r18.jsonl`): round 3 buys +2‰
    * (372 → 374, the same inside-noise delta sf1.0 rejected) and rounds
    * 4–5 buy exactly nothing, at +13–18 s each — the descent converges
    * at 2 rounds on EVERY measured decade, so a scale-aware round count
    * was considered and rejected as mechanism without a premise. What
    * the plateau means: at workK=10 the 2-hop proposal pool is exhausted
    * once neighborhoods consolidate; past it the remaining recall axis
    * is the working degree itself (workK=20: 544‰ at sf10, rejected at
    * ~6× the build wall — round 17). The round-18 recall lever is
    * instead the DISCARDED SCORED CANDIDATES: see
    * [[knnScoredPairsFor]].
    */
  private[graft] val KnnRefineRounds = 2

  /** WORKING degree of the refinement rounds (classic NN-descent builds
    * the graph at a degree larger than the serving k and truncates at the
    * end): the seed probe pass and every refinement round keep top-
    * [[KnnWorkK]] edges, and [[knnEdgesFor]] truncates the final ranking
    * to [[GraphK]]. A working degree of [[GraphK]] starves the 2-hop
    * candidate pool (≤ (2·5)² = 100 proposals/vertex/round) and the
    * descent stalls at a shallow local optimum — measured 314 → 406‰ at
    * sf1.0 over 2 rounds; the wider pool trades a (2·[[KnnWorkK]])²
    * candidate bound (still corpus-size-independent per vertex) for the
    * structurally deeper optimum. Priced by [[graft.KnnRefineAudit]]
    * (workK × rounds at three decades); see SCALING.md round 17.
    */
  private[graft] val KnnWorkK = 10

  // NOTE: the refinement round's REVERSE adjacency (the classic
  // NN-descent reverse-sample ρ·K) is capped per vertex at the round's
  // working degree in salted hash-min order (the [[KnnMemberCap]]
  // mechanism: per-vertex salt `src:dst`, ties → min dst): in-degree of
  // a kNN graph is unbounded (hub vectors), so an uncapped symmetrized
  // adjacency would blow the per-round candidate bound to O(maxInDeg²);
  // capped, the symmetrized degree is ≤ 2·workK and the candidate volume
  // is exactly the designed O(N·(2·workK)²).

  /** Directed kNN edge list over the WHOLE corpus: each vector's top-
    * [[GraphK]] neighbors by exact cosine (ties → min neighbor id) —
    * an IVF-probed seed graph ([[knnEdgesBuild]]) refined by
    * [[KnnRefineRounds]] NN-descent rounds ([[knnRefineRound]]).
    * Memoized — the persisted kNN-graph artifact that
    * [[knnGraph]] reads and that a production pipeline would refresh
    * incrementally alongside the IVF assignment itself.
    *
    * Probe side is map-only and TWO-LEVEL ROUTED since round 15
    * ([[Similarity.ivf2ProbeIds]], [[KnnCoarseNprobe]]×
    * [[KnnFinePerCell]]): O(K1 + KnnCoarseNprobe·K/K1) ≈ O(N^¼) routing
    * cosines per row instead of the single-level multiProbe's
    * O(K) = O(√N) — the exact term whose retirement bought the pair
    * family 2× at sf10 (`_build_knn_edges` was the worst remaining r14
    * tail, slope 1.101). The member index is the two-level assignment
    * ([[Similarity.ivf2AssignFor]], same O(N^¼) per row, 1.7 s at sf10),
    * so a vector always probes its own assigned cell (top-1 coarse and
    * top-1 fine are inside any ≥1-wide probe). The candidate join keys on the probed
    * bucket and meets each candidate's single assigned bucket, so every
    * (src, dst) pair arises at most once and no distinct is needed.
    * Top-k is a per-src window over the candidate set.
    *
    * Both embedding arrays ride INTO the bucket join (probe rows attach
    * `e`/`nrm` by one narrow equi-join before the bucket join), so the
    * cosine is scored inside the join and the O(N·nprobe·B) candidate
    * relation exists only as the narrow (src, dst, cos) projection. The
    * former shape attached the arrays AFTER candidate enumeration — two
    * sort-merge sorts of the candidate volume at ~600 bytes/row, which
    * the sf10 probe measured at 122× the sf1.0 wall: the same lesson as
    * [[Dedup.ivfPairs]]'s round-10 fix, now applied here.
    *
    * The member side is capped per bucket at [[KnnMemberCap]]
    * hash-min members (the [[Dedup.PairCapB]] mechanism with the
    * graph's own width since round 16) — so per-src
    * candidates are ≤ nprobe·B and the candidate volume is
    * O(N·nprobe·B), linear in N (round 14; slope 1.098 → 0.93 in the
    * pairs-probe window). Round 15 SALTS the cap order per bucket
    * (hash(cent_id:dst), the [[Dedup.subBucketPairs]] lesson): under
    * the old global hash(dst) order every bucket retained the SAME
    * corpus-wide hash-min vectors, so probing more buckets met the same
    * candidates and the un-sampled mass was never reachable; per-bucket
    * salts make the retained sets independent. Each src still ranks
    * EXACT cosines; only the candidate pool of an oversized bucket is a
    * uniform deterministic sample, replayed by the oracle.
    *
    * Since round 18 the MATERIALIZED artifact is the WORKING-degree
    * relation ([[knnWorkEdgesFor]], key `knnwork:`) and this serving
    * view is a rank filter over it — zero extra build cost, and the
    * workK edges the truncation formerly discarded stay addressable
    * (the pair build derives its graph candidates from them,
    * [[Dedup.graphPairsFor]]). Historical key bumps of the serving
    * contract: knn: → knn2: (cap budget) → knn3: (routed probes +
    * two-level assignment + salted cap) → knn4: (round-16 sweep
    * adoption, 2×2@128 → 4×4@[[KnnMemberCap]]) → knn5: (round-17
    * NN-descent refinement) → the `knnwork:` store (round 18,
    * scale-aware round count).
    */
  private[graft] def knnEdgesFor(spark: SparkSession, dir: String): DataFrame =
    knnWorkEdgesFor(spark, dir).where(col("rk") <= GraphK)

  /** Memoized NN-descent working graph: seed probe build +
    * [[KnnRefineRounds]] refinement rounds, all at the WORKING degree
    * [[KnnWorkK]] — the persisted kNN-graph artifact a production
    * pipeline refreshes. The serving contract ([[knnEdgesFor]]) is its
    * top-[[GraphK]] rank filter — zero extra build cost.
    */
  private[graft] def knnWorkEdgesFor(spark: SparkSession, dir: String): DataFrame =
    graphChainFor(spark, dir)._1

  /** Memoized scored-candidate near-dup pairs off the NN-descent chain
    * (round 18): every unordered candidate pair the refinement rounds
    * EXACT-COSINE-SCORED whose cosine clears [[Dedup.PairCosThreshold]],
    * deduplicated across rounds — `(vec_a < vec_b, cos)`.
    *
    * Why this exists: each refine round scores the full 2-hop candidate
    * relation (≤ 4·[[KnnWorkK]]²·N pairs) and keeps only the per-vertex
    * top-[[KnnWorkK]] — at sf10 that discards ~99.97% of ~30M exact
    * cosines per round, among them near-dup pairs that lost the rank
    * competition at BOTH endpoints. The cosine formula is bit-identical
    * to the pair builds' verification ([[Dedup.cosine]] on the same
    * normed memo), so threshold survivors ARE verified pairs: collecting
    * them costs one filter over an already-computed relation. This
    * strictly dominates deriving pairs from the working-degree EDGE list
    * (the round-17 verdict's suggestion): every final edge was scored in
    * the last round, so edge-derived pairs ⊆ scored survivors, and the
    * sf10 audit measures the superset at ~3.4× the hits
    * ([[graft.PairGraphAudit]], `bench_ref/pair_graph_audit_r18.jsonl`).
    *
    * The SEED probe pass's scored candidates are deliberately NOT
    * collected: its candidate relation is O(N·nprobe·B) ≈ 800M rows at
    * sf10 — a filter branch would either checkpoint ~19 GB or recompute
    * the ~100 s probe pass, and those candidates come from the same
    * shared-probed-bucket family the production pair build already
    * covers at a wider budget ([[Dedup.subBucketPairs]] at 3×8@512).
    * The refine rounds' candidates are the orthogonal (graph-structure)
    * source — they are what the union adoption pays for.
    *
    * The DuckDB oracle replays this as a filter over the `sn_i` scored
    * CTEs its edge chain already computes
    * ([[graft.entry.OracleCtes.graphPairsCte]]).
    */
  private[graft] def knnScoredPairsFor(spark: SparkSession, dir: String): DataFrame =
    graphChainFor(spark, dir)._2

  /** The one-pass builder behind [[knnWorkEdgesFor]] and
    * [[knnScoredPairsFor]]: seed at the working degree, then per round
    * checkpoint the SCORED pair relation once and derive both the next
    * ranking and the threshold survivors from it. The checkpoint is
    * load-bearing twice over: the next round's 2-hop join reads the
    * graph twice (forward + reverse), and deriving edges AND survivors
    * from an un-materialized `scored` would compute the whole round
    * pipeline per reference (the union-of-two-references trap the r17
    * plan audit documented). Both outputs publish as their own memo
    * tables (`knnwork:` / `knncand:`), the chain itself is a
    * session-scalar memo so the rounds run once per session however the
    * two tables are first requested, and the round checkpoints are
    * unpersisted once both tables are parquet — nothing stays pinned.
    */
  private def graphChainFor(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) =
    graft.sources.Materialized.scalarOf(spark, s"knnchain:$dir") {
      val v = Dedup.normedFor(spark, dir)
      val inter = scala.collection.mutable.ListBuffer.empty[DataFrame]
      var edges = knnEdgesBuild(spark, dir, KnnCoarseNprobe, KnnFinePerCell,
        KnnMemberCap, KnnWorkK).localCheckpoint(true)
      inter += edges
      val survivors = (1 to KnnRefineRounds).map { _ =>
        val scored = knnRefineScored(v, edges, KnnWorkK).localCheckpoint(true)
        inter += scored
        edges = rankFromScored(scored, KnnWorkK).localCheckpoint(true)
        inter += edges
        scored.where(col("cos") >= Dedup.PairCosThreshold)
      }
      val edgesTable =
        graft.sources.Materialized.of(spark, s"knnwork:$dir")(edges)
      val candTable =
        graft.sources.Materialized.of(spark, s"knncand:$dir")(
          survivors.reduce(_.unionAll(_))
            .select(col("a").as("vec_a"), col("b").as("vec_b"), col("cos"))
            .distinct())
      inter.foreach(_.unpersist(true))
      (edgesTable, candTable)
    }

  /** The un-memoized, width-parameterized edge builder behind
    * [[knnEdgesFor]] — factored out (round 16) so the probe-width sweep
    * ([[graft.KnnProbeAudit]]) prices (coarseNprobe × finePerCell ×
    * memberCap) configs with the exact production mechanism.
    */
  private[graft] def knnEdgesBuild(spark: SparkSession, dir: String,
      coarseNprobe: Int, finePerCell: Int, memberCap: Int,
      keepK: Int = GraphK): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    val asg = Similarity.ivf2AssignFor(spark, dir)
    // e/nrm ride the map-only probe pass (keep =) instead of a corpus
    // join on vec_id after it (round 19): the probe routing holds the
    // arrays anyway, so the former re-attach was a pure extra shuffle —
    // broadcast-masked at test scales, a full 16N-row sort-merge once
    // the corpus outgrows the broadcast threshold.
    val probes = Similarity
      .ivf2ProbeIds(spark, dir, coarseNprobe, finePerCell,
        keep = Seq("e", "nrm"))
      .select(col("vec_id").as("src"), col("e").as("qe"),
        col("nrm").as("qn"), col("cent_id"))
    val wCap = Window.partitionBy(col("cent_id"))
      .orderBy(graft.sources.Tables.portableHash(
          concat(col("cent_id").cast("string"), lit(":"),
            col("dst").cast("string"))),
        col("dst"))
    val member = asg.withColumnRenamed("vec_id", "dst")
      .withColumn("r", row_number().over(wCap))
      .where(col("r") <= memberCap)
      .join(v.withColumnRenamed("vec_id", "dst"), "dst")
      .select(col("cent_id"), col("dst"), col("e"), col("nrm"))
    val wTop = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst"))
    // member is window-output (stats-blind: unknown-size estimate), so
    // neither the broadcast rule nor the static hash ladder can ever
    // price it — unhinted, the bucket join sort-merges, paying a sort of
    // the 16N-row wide probe relation. Hint the hash build explicitly:
    // member is per-bucket capped (≤ memberCap·K rows, K ~ √N), so the
    // per-partition build stays bounded at any scale where partitions
    // track cluster size.
    probes.join(member.hint("SHUFFLE_HASH"), "cent_id")
      .where(col("dst") =!= col("src"))
      .select(col("src"), col("dst"),
        Dedup.cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .where(col("rk") <= keepK)
      .select("src", "dst", "rk")
  }

  /** One NN-descent round over edge relation (src, dst, rk): propose the
    * 2-hop neighborhood of the symmetrized graph as candidates, score
    * EXACT cosines, keep each src's top-`keepK` of incumbents ∪
    * proposals. Monotone in recall (incumbents re-score identically under
    * the same exact cosine and deterministic (cos desc, dst) tie-break,
    * so an incumbent is displaced only by a strictly better candidate or
    * a better-tied smaller id — both weakly closer to the exact top-k).
    *
    * Scale shape: forward degree ≤ `keepK` by construction and the
    * reverse adjacency is capped at `keepK` salted hash-min
    * rows per vertex, so the symmetrized degree is ≤ 2·`keepK` and
    * the 2-hop candidate relation is ≤ 4·`keepK`²·N NARROW (src, dst)
    * rows — two longs each, deduplicated BEFORE the embedding arrays are
    * attached, so the wide scoring relation is the deduplicated
    * candidate count, not the path count. Per-vertex work is independent
    * of corpus size: this is the axis that escapes the fixed-probe
    * ~1/√N recall decay (the probe pass scans a constant candidate
    * budget of a growing corpus; the 2-hop expansion follows the graph
    * itself). Everything is equi-joins and one per-src window — no
    * all-pairs term anywhere.
    */
  private[graft] def knnRefineRound(v: DataFrame, edges: DataFrame,
      keepK: Int = KnnWorkK): DataFrame =
    rankFromScored(knnRefineScored(v, edges, keepK), keepK)

  /** The scored-candidate stage of [[knnRefineRound]]: symmetrize,
    * propose the 2-hop neighborhood plus incumbents, collapse to
    * unordered pairs, dedup, score exact cosines — `(a < b, cos)`.
    * Factored out (round 18) so the production chain can checkpoint it
    * once and derive BOTH the next ranking and the threshold-surviving
    * near-dup pairs ([[knnScoredPairsFor]]) from one computation.
    */
  private[graft] def knnRefineScored(v: DataFrame, edges: DataFrame,
      keepK: Int = KnnWorkK): DataFrame = {
    val fwd = edges.select("src", "dst")
    // reverse adjacency, capped per vertex by the salted hash-min rank
    // (same mechanism and salt shape as the member cap: hash("src:dst")
    // where src is the REVERSED source, ties → min dst)
    val wRev = Window.partitionBy(col("src"))
      .orderBy(graft.sources.Tables.portableHash(
          concat(col("src").cast("string"), lit(":"),
            col("dst").cast("string"))),
        col("dst"))
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
      .withColumn("rr", row_number().over(wRev))
      .where(col("rr") <= keepK)
      .select("src", "dst")
    val und = fwd.unionAll(rev).distinct()
    // 2-hop paths src → mid → dst over the symmetrized graph, plus the
    // incumbent edges (re-scored so the union top-k can only improve).
    // Candidates collapse to UNORDERED pairs (least, greatest) and
    // deduplicate BEFORE the arrays attach: the symmetrized 2-hop
    // relation is symmetric, so scoring each pair once and emitting both
    // directions afterwards halves the distinct volume, both embedding
    // joins and every cosine — the round's hottest stages. (It also
    // FULLY symmetrizes the candidate set — reverse incumbents beyond
    // the cap become candidates for both endpoints — which is where
    // most of the round-17 quality lift over the first, directed form
    // came from: sf1.0 one-round recall 478 → 632‰ at workK 10.)
    // Rows are still two longs here.
    // the 2-hop self-join keeps its explicit hash hint: und is
    // distinct-output over checkpoint scans (stats-blind — the unknown-
    // size default defeats both broadcast and the static hash ladder,
    // and AQE's runtime SMJ->SHJ rewrite does not fire on this shape),
    // while its rows are two longs with degree-bounded cardinality
    // (≤ 2·workK·N), so the per-partition hash build stays small at any
    // scale where partitions track cluster size
    val pairs = und
      .join(und.select(col("src").as("mid"), col("dst").as("d2"))
        .hint("SHUFFLE_HASH"), col("dst") === col("mid"))
      .select(col("src"), col("d2").as("dst"))
      .unionAll(fwd)
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    // The embedding attaches and the 2-hop self-join must never
    // sort-merge (a sort of the O(N·workK²) pair relation per attach);
    // the session's preferSortMergeJoin=false ladder (Engine.session)
    // plans them as hash joins — BROADCAST while the corpus/graph side
    // fits the auto threshold (the r18 per-call SHUFFLE_HASH hints
    // overrode that and forced two avoidable exchanges per attach at
    // every test scale), shuffled-hash above it, sort-merge only when
    // neither side's per-partition build fits.
    pairs
      .join(v.select(col("vec_id").as("a"), col("e").as("qe"),
        col("nrm").as("qn")), "a")
      .join(v.select(col("vec_id").as("b"), col("e"), col("nrm")), "b")
      .select(col("a"), col("b"),
        Dedup.cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("cos"))
  }

  /** The ranking stage of [[knnRefineRound]] over a scored unordered-pair
    * relation `(a, b, cos)`: both directions from ONE pass via explode,
    * never from a union of two references to the scored relation — a
    * DataFrame referenced twice is COMPUTED twice (no implicit sharing
    * in the plan), and the union form re-ran the whole
    * dedup+join+cosine pipeline per direction: two identical subtrees
    * in the plan dump, i.e. 2× the candidate exchanges and cosines.
    * Local[32] sf10 walls cannot resolve the difference (141 vs 147 s
    * in adjacent windows — the round is exchange-bound there and the
    * duplicate subtrees overlap on idle cores), but on a busy
    * multi-tenant cluster the halved work is real; adopted on plan
    * structure (round 17; `bench_ref/plans_r18/builders/` carries the
    * committed dump).
    */
  private[graft] def rankFromScored(scored: DataFrame, keepK: Int): DataFrame = {
    val wTop = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst"))
    scored.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst"), col("cos")),
        struct(col("b").as("src"), col("a").as("dst"), col("cos"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.cos").as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .where(col("rk") <= keepK)
      .select("src", "dst", "rk")
  }

  /** Recall audit of the kNN GRAPH — the quality contract the graph
    * build's routed probes + salted member cap trade against, measured
    * the same way every ANN search here is: on the deterministic audit
    * panel (`vec_id % panelStep == 0`), how many of the graph's
    * ≤ [[GraphK]] edges land in the EXACT cosine top-[[GraphK]]
    * ([[Similarity.annTopkFor]], the memoized O(Q·N) baseline), and how
    * many rank-1 edges name the exact nearest neighbor. One integer row:
    * (n_queries, n_edges, n_hits, hit_permille, recall_permille, n_top1)
    * — hit_permille is edge PRECISION (hits over emitted edges; a build
    * that emits fewer edges can inflate it — it reads 0, not 1000, on a
    * zero-edge graph: that denominator is the system's own output, so
    * empty is a broken build, not a vacuously-true audit),
    * recall_permille is true per-query recall (hits over the
    * n_queries·[[GraphK]] exact-top-5 slots, with n_queries counted
    * from the EXACT panel so per-query dropout scores as zeros). The
    * panel is
    * O(100) queries at any corpus size and the exact baseline is the
    * session memo every other recall audit shares, so the audit costs
    * two semi-joins of ≤ 5·Q rows — free at scale, recomputed against
    * ground truth every round like [[Dedup.annRecall]].
    */
  def knnRecall(spark: SparkSession, dir: String): DataFrame =
    knnRecallOf(spark, dir, knnEdgesFor(spark, dir))

  /** [[knnRecall]] over an arbitrary edge relation (src, dst, rk) — the
    * sweep harness scores candidate probe-width configs with this.
    */
  private[graft] def knnRecallOf(spark: SparkSession, dir: String,
      edges: DataFrame): DataFrame = {
    val step = Similarity.panelStep(Similarity.corpusN(spark, dir))
    val exact = Similarity.annTopkFor(spark, dir)
    val pe = edges.where(col("src") % step === 0)
    // n_queries counts the EXACT panel (the ground-truth side), not the
    // graph's own emitted sources: a build whose narrow probes leave some
    // panel vectors edgeless must see those zeros in its recall
    // denominator, or per-query dropout would inflate recall_permille the
    // same way fewer edges inflate hit_permille (the r16 review catch;
    // same convention as every other recall audit here, e.g.
    // [[Similarity.pqRecall]]). Identical values wherever no dropout
    // occurs — true at every gate scale and every committed sweep row
    // (panel_edges = 5 × n_queries throughout).
    val nq = exact.select("q_id").distinct().agg(count(lit(1)).as("n_queries"))
    val ne = pe.agg(count(lit(1)).as("n_edges"))
    val nh = pe.join(exact.select(col("q_id").as("src"), col("n_id").as("dst")),
        Seq("src", "dst"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    val nt = pe.where(col("rk") === 1)
      .join(exact.where(col("rk") === 1)
          .select(col("q_id").as("src"), col("n_id").as("dst")),
        Seq("src", "dst"), "left_semi")
      .agg(count(lit(1)).as("n_top1"))
    nq.crossJoin(ne).crossJoin(nh).crossJoin(nt)
      .select(col("n_queries"), col("n_edges"), col("n_hits"),
        expr("CASE WHEN n_edges = 0 THEN 0 ELSE n_hits * 1000 div n_edges END")
          .as("hit_permille"),
        expr(s"CASE WHEN n_queries = 0 THEN 0 " +
            s"ELSE n_hits * 1000 div (n_queries * $GraphK) END")
          .as("recall_permille"),
        col("n_top1"))
  }

  /** kNN-graph build + topology readout: per vector, its out-degree
    * (≤ [[GraphK]] — smaller only when the probed buckets hold fewer
    * candidates), how many of its edges are MUTUAL (the neighbor lists
    * each other back — the symmetric core a graph-based dedup or UMAP-ish
    * layout actually uses), and its single nearest neighbor.
    *
    * Mutuality is an edge-list self-join on the reversed key — linear in
    * edges (≤ [[GraphK]]·N rows), keyed by (src, dst). Output is one row
    * per vector: integers only.
    */
  def knnGraph(spark: SparkSession, dir: String): DataFrame = {
    val e = knnEdgesFor(spark, dir)
    val rev = e.select(col("dst").as("src"), col("src").as("dst"),
      lit(1L).as("m"))
    e.join(rev, Seq("src", "dst"), "left")
      .groupBy(col("src").as("vec_id"))
      .agg(count(lit(1)).as("out_deg"),
        sum(coalesce(col("m"), lit(0L))).as("mutual_deg"),
        min(when(col("rk") === 1, col("dst"))).as("top1_id"))
      .select("vec_id", "out_deg", "mutual_deg", "top1_id")
      .orderBy("vec_id")
  }

  /** Semantic clustering by connected components of the MUTUAL-kNN graph:
    * two vectors join a cluster only when each lists the other in its
    * top-[[GraphK]] — the symmetric core that filters out one-sided hub
    * edges, the standard way a kNN graph is hardened before community
    * detection. Components come from the shared min-label Pregel fixpoint
    * ([[Iterative.connectedComponents]]); every vector gets a cluster id
    * (singletons label themselves) and its cluster size.
    *
    * This is the embedding-space analog of [[Curation.dedupClusters]]
    * (same kernel, different edge relation): where dedup clusters group
    * TEXTS that share shingles, these group VECTORS whose neighborhoods
    * agree — the grouping a curation pipeline uses for cluster-balanced
    * sampling or SemDeDup-style per-cluster budgets.
    *
    * Scale shape: the edge list is ≤ [[GraphK]]·N rows, mutuality is one
    * set intersect on (src, dst), and each CC round is one shuffle; round
    * count = component diameter (small for mutual-kNN graphs, whose
    * components are locally dense).
    */
  /** Memoized converged mutual-kNN component labels — the fixpoint runs
    * once per corpus (same discipline as [[Curation.ccLabelsFor]]).
    *
    * The mutual edge set is DENSIFIED before the fixpoint: the loop is
    * fed E ∪ E² ∪ E⁴ (two squaring joins), which has exactly the same
    * connected components but one quarter the diameter, so the
    * per-round-priced Pregel loop converges in ~¼ the rounds (measured
    * 16 → 5 at sf0.1, where the mutual graph contains long near-dup
    * CHAINS of vectors — the worst case for hop-at-a-time propagation).
    * Safe at scale because mutual-kNN degree is bounded by [[GraphK]]:
    * |E²| ≤ deg·|E| and |E⁴| ≤ deg²·|E²|, so densification is a
    * constant-factor blow-up of a ≤[[GraphK]]·N-row relation, never a
    * closure explosion — this is the bounded-degree case where buying
    * diameter with edges is free. A THIRD squaring was tried and
    * REJECTED (round 12): it cut sf1.0 convergence 11 → 6 rounds but
    * made the build measurably slower — 8-hop reachability inside
    * mid-size dense components approaches the component-pair closure,
    * so the squaring join's output outgrows what the saved barriers
    * buy. Two squarings is where bounded-degree stops being true.
    */
  private[graft] def knnCcFor(spark: SparkSession, dir: String): DataFrame =
    // knncc: → knncc2: (knn4 edge adoption) → knncc3: (knn5 NN-descent
    // refinement — the labels derive from the edge relation, so every
    // upstream contract change bumps this key too: the cross-application
    // memo store must never serve labels computed from the old graph.
    // The round-18 `knnwork:` restructure left the SERVING edge set
    // bit-identical — rounds, working degree and truncation unchanged —
    // so this key correctly does NOT bump).
    graft.sources.Materialized.of(spark, s"knncc3:$dir") {
      val e = knnEdgesFor(spark, dir).select("src", "dst")
      val mutual = e.join(
          e.select(col("dst").as("src"), col("src").as("dst")),
          Seq("src", "dst"), "left_semi")
        .localCheckpoint(true)
      def densify(g: DataFrame): DataFrame = {
        val sq = g.as("a")
          .join(g.select(col("src").as("mid"), col("dst").as("d2")),
            col("a.dst") === col("mid"))
          .select(col("a.src").as("src"), col("d2").as("dst"))
          .where(col("src") =!= col("dst"))
        g.unionAll(sq).distinct().localCheckpoint(true)
      }
      Iterative.connectedComponents(densify(densify(mutual)))
    }

  def knnClusters(spark: SparkSession, dir: String): DataFrame =
    clustersFrom(spark, dir, knnCcFor(spark, dir))

  /** The SAME clustering through the alternating large-star/small-star
    * kernel ([[Iterative.connectedComponentsStars]]) — the
    * unbounded-diameter 100 TB path, driven against the identical DuckDB
    * oracle as `q_knn_clusters` (one ground truth, two independent
    * distributed mechanisms). Notably it takes the RAW mutual edge set:
    * star contraction needs no densification, because its round count
    * depends on log n, not component diameter.
    */
  def knnClustersStars(spark: SparkSession, dir: String): DataFrame = {
    // knnccstars2: → knnccstars3: with the knn5 refinement (see knncc3;
    // the r18 restructure leaves serving edges bit-identical — no bump)
    val labels = graft.sources.Materialized.of(spark, s"knnccstars3:$dir") {
      val e = knnEdgesFor(spark, dir).select("src", "dst")
      val mutual = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      Iterative.connectedComponentsStars(mutual)
    }
    clustersFrom(spark, dir, labels)
  }

  private def clustersFrom(spark: SparkSession, dir: String,
      labels: DataFrame): DataFrame = {
    val assigned = graft.sources.Tables.load(spark, dir, "embeddings")
      .select("vec_id")
      .join(labels.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("cluster_id"))
    val sizes = assigned.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, "cluster_id")
      .select("vec_id", "cluster_id", "cluster_size")
      .orderBy("vec_id")
  }

  /** kNN-classifier pseudo-labeling with a held-out accuracy readout: every
    * 5th vector (vec_id % 5 = 0) has its label HIDDEN; each hidden vector
    * is assigned the majority label of its top-[[GraphK]] LABELED
    * IVF-probed neighbors (vote ties → smaller label; cosine ties → smaller
    * neighbor id), then scored against the ground truth it never saw.
    *
    * Output per true label: test count, how many got ≥1 labeled neighbor,
    * correct count, and accuracy in permille — the per-class quality gate
    * that decides whether propagated labels are trustworthy enough to
    * train on.
    *
    * Scale shape (round 15, same migration as [[knnEdgesFor]]): the test
    * side is a fixed fraction of the corpus routed through the two-level
    * quantizer ([[Similarity.ivf2ProbeIdsOver]], [[KnnCoarseNprobe]]×
    * [[KnnFinePerCell]] — O(N^¼) routing cosines per query instead of
    * the single-level O(K) = O(√N)); the candidate index is the
    * two-level assignment and the LABELED pool is capped per bucket at
    * [[Dedup.PairCapB]] salted hash-min members, so per-query candidates
    * are ≤ nprobe·B and the candidate volume is O(N·nprobe·B) — linear
    * in N — instead of the uncapped Θ(N²/K) occupancy term. The vote is
    * two bounded aggregations (≤ [[GraphK]] rows per test vector).
    * Nothing touches all-pairs; 100× data moves the same per-bucket work.
    *
    * PROBE-WIDTH AUTHORITY (round 17, per ADVICE): this pass SHARES
    * [[KnnCoarseNprobe]]×[[KnnFinePerCell]] with the graph build, so the
    * round-16 graph sweep ([[graft.KnnProbeAudit]], which priced the
    * `q_knn_recall` contract) is deliberately the adopted authority for
    * this width too — both passes route queries through the same
    * two-level index against the same corpus geometry, and a vote that
    * needs 5 labeled neighbors is strictly LESS probe-hungry than a
    * top-5 recall contract, so a width adequate for the graph is
    * adequate here; its candidate-POOL cap stays [[Dedup.PairCapB]]
    * (per-query cost ∝ cap) rather than [[KnnMemberCap]]. The r16
    * 2×2→4×4 adoption moved this pass's probed buckets with the graph's
    * — priced under the graph contract, inherited here by design. Note
    * the NN-descent refinement (round 17) does NOT apply: labelProp
    * queries are held-out vectors with no incumbent edge list to refine;
    * they ride the probe pass alone.
    */
  def labelProp(spark: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    val lab = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val asg = Similarity.ivf2AssignFor(spark, dir)

    val test = v.where(col("vec_id") % 5 === 0)
    // qe/qn ride the probe pass (keep =, round 19) — the former shape
    // dropped them and joined `test` back on q_id below
    val probes = Similarity.ivf2ProbeIdsOver(test,
        Similarity.centroidsMemoFor(spark, dir),
        Similarity.coarseMemoFor(spark, dir),
        KnnCoarseNprobe, KnnFinePerCell, keep = Seq("e", "nrm"))
      .select(col("vec_id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qn"), col("cent_id"))

    // labeled-pool-only, then the salted per-bucket cap (filter FIRST so
    // hidden vectors never occupy cap slots the vote could have used)
    val wCap = Window.partitionBy(col("cent_id"))
      .orderBy(graft.sources.Tables.portableHash(
          concat(col("cent_id").cast("string"), lit(":"),
            col("n_id").cast("string"))),
        col("n_id"))
    val pool = asg.withColumnRenamed("vec_id", "n_id")
      .where(col("n_id") % 5 =!= 0)
      .withColumn("r", row_number().over(wCap))
      .where(col("r") <= Dedup.PairCapB)
      .select("cent_id", "n_id")

    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id"))
    val nbrs = probes
      // pool is window-output (stats-blind) — same explicit hash-build
      // hint as the graph build's member side, same per-bucket cap bound
      .join(pool.hint("SHUFFLE_HASH"), "cent_id")
      .join(v.withColumnRenamed("vec_id", "n_id"), "n_id")
      .select(col("q_id"), col("n_id"),
        Dedup.cosine(col("qe"), col("e"), col("qn"), col("nrm")).as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .where(col("rk") <= GraphK)

    val wVote = Window.partitionBy(col("q_id"))
      .orderBy(col("n_votes").desc, col("n_label"))
    val pred = nbrs
      .join(lab.select(col("vec_id").as("n_id"), col("label").as("n_label")), "n_id")
      .groupBy("q_id", "n_label").agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(wVote))
      .where(col("vr") === 1)
      .select(col("q_id"), col("n_label").as("pred_label"))

    lab.where(col("vec_id") % 5 === 0)
      .select(col("vec_id").as("q_id"), col("label"))
      .join(pred, Seq("q_id"), "left")
      .groupBy("label")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("pred_label").isNotNull, 1L).otherwise(0L)).as("n_pred"),
        sum(when(col("pred_label") === col("label"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_permille", expr("n_correct * 1000 div n_test"))
      .orderBy("label")
  }
}
