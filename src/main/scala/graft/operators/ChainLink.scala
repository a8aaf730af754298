package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Batch/relational personality of the reference's chain-linking pipeline
  * (reference: `flink-jobs/simpy_kafka_reader.py` main job; SURVEY.md §2.4/§2.5).
  *
  * Scale design (100 TB): the naive form of J1's batch equivalent is an
  * equi-join on IP alone with the interval predicates as post-join filters —
  * at N rows per IP that enumerates O(N²) candidate pairs per key, which
  * dies at scale exactly like the reference's own per-key O(P·C) analysis
  * (`README.md:19-23`). We instead run a *banded interval join*: bucket time
  * by W = max interval length, join on (ip, bucket) with the child probing
  * its own and the previous bucket. Containment implies
  * `p_start ∈ [c_start − W, c_start]`, so the two probed buckets cover all
  * matches and each matching pair is produced exactly once (a parent lives in
  * exactly one bucket). Candidate enumeration drops from O(Σ n_ip²) to
  * O(Σ n_{ip,bucket}²) — bounded by data density per (ip, max-latency window),
  * the same locality the streaming state exploits. Shuffle key (ip, bucket)
  * also spreads hot IPs across partitions, taming skew; AQE handles the rest.
  */
object ChainLink {

  /** J1 (batch form) — parent/child link pairs via banded self
    * interval-containment join with parent replication. Output:
    * (parent_id, child_id).
    *
    * Each parent is replicated to every time bucket its interval overlaps;
    * each child probes exactly the bucket containing its start. Containment
    * puts `c_start` inside the parent's interval, so every matching pair
    * meets in exactly one bucket — no dedup needed, identical output for
    * ANY bucket width. Width is therefore a pure performance knob: we use
    * an approximate high quantile of interval length, so a single outlier
    * interval cannot collapse the banding (it just replicates that one
    * parent more), unlike a max-based width where one day-long interval
    * would force day-wide buckets and quadratic per-bucket blowup.
    *
    * Inverted intervals (`end_at_ms < start_at_ms`) are corrupt wire data
    * (the lenient parse can default `end_at_ms` to 0) and are excluded from
    * linking on BOTH sides — under raw containment an inverted child's
    * `start_at_ms` may lie arbitrarily far outside every parent's interval,
    * which no bounded banding can cover. The DuckDB oracle
    * (`SparkEntry.linksCte`) applies the same filter, so output equals the
    * all-pairs spec restricted to well-formed intervals.
    */
  /** Perf-only banding knob shared by every interval join (containment
    * links, overlap counts): approx P95 interval length, floored at
    * maxLen/64 so the worst-case replication factor is capped at 65 buckets
    * even under extreme length skew. Any positive value is CORRECT — width
    * only trades replication against per-bucket candidate density. Null
    * aggregates (empty input) → 1; the downstream join is empty anyway.
    */
  private[operators] def bandWidth(msgs: DataFrame): Long = {
    val stats = msgs.agg(
      approx_percentile(col("end_at_ms") - col("start_at_ms"), lit(0.95), lit(1000)),
      max(col("end_at_ms") - col("start_at_ms"))).head()
    if (stats.isNullAt(0) || stats.isNullAt(1)) 1L
    // CEILING division: floor would let w undershoot maxLen/64 and the
    // worst interval replicate to up to 128 buckets, double the cap the
    // knob promises (maxLen/⌈maxLen/64⌉ + 1 ≤ 65 always)
    else math.max(1L, math.max(stats.getLong(0), (stats.getLong(1) + 63) / 64))
  }

  def links(msgsRaw: DataFrame): DataFrame =
    linksWithStrict(msgsRaw).select("parent_id", "child_id")

  /** The banded join with the strict-containment flag attached —
    * [[linksFor]] memoizes THIS relation, so the strict edge set
    * ([[strictLinksFor]]) is a filter over the same stored table.
    */
  private def linksWithStrict(msgsRaw: DataFrame): DataFrame = {
    val msgs = msgsRaw.where(col("end_at_ms") >= col("start_at_ms"))
    val w = bandWidth(msgs)

    val p = msgs.select(
      col("id").as("parent_id"),
      col("dst_ip").as("ip"),
      col("start_at_ms").as("p_start"),
      col("end_at_ms").as("p_end"))
      .withColumn("bucket", explode(sequence(
        expr(s"p_start div $w"), expr(s"p_end div $w"))))

    val c = msgs.select(
      col("id").as("child_id"),
      col("src_ip").as("c_ip"),
      col("start_at_ms").as("c_start"),
      col("end_at_ms").as("c_end"),
      expr(s"start_at_ms div $w").as("bucket"))

    p.join(c, col("ip") === col("c_ip") && p("bucket") === c("bucket"))
      .where(col("p_start") <= col("c_start") &&
        col("p_end") >= col("c_end") &&
        col("parent_id") =!= col("child_id"))
      // strict-containment flag computed WHILE both intervals are in
      // scope: deriving it post hoc costs two joins back to msgs at link
      // cardinality (the sf10 probe measured that at 50 s for 35M links)
      .select(col("parent_id"), col("child_id"),
        (!(col("p_start") === col("c_start") &&
          col("p_end") === col("c_end"))).as("strict"))
  }

  /** What-if health report for the banded interval join under a CANDIDATE
    * pinned width (20 s — the reference SLA's nominal max call latency):
    * keyed (ip, bucket) candidate-density stats and the parent
    * replication factor — the numbers that predict the join's cost at
    * 100 TB (max candidates per key bounds the hottest task, replication
    * permille bounds shuffle amplification). On this workload it reports
    * ~151× replication — i.e. the synthetic intervals are minutes-long
    * and the quantile-adaptive [[bandWidth]] is the right choice, which
    * is exactly the decision this report exists to inform before pinning
    * a width in config. Width-pinned so the DuckDB oracle replays it
    * exactly (the adaptive width uses engine-specific approx_percentile).
    */
  def bandStats(spark: SparkSession, dir: String): DataFrame = {
    val W = 20000L
    val msgs = Tables.msgs(spark, dir)
      .where(col("end_at_ms") >= col("start_at_ms"))
    // Sweep-line instead of bucket explode: per-bucket parent coverage is
    // a ±1 boundary prefix sum (2 rows per message, O(msgs) at ANY width),
    // carried to the child-occupied buckets with the union+window as-of
    // trick — materializing the replication the report warns about would
    // make the report itself O(replication).
    val wIp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ip")).orderBy(col("bucket"), col("tag"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val bounds = msgs.select(col("dst_ip").as("ip"),
        expr(s"start_at_ms div $W").as("bucket"), lit(1L).as("delta"))
      .unionAll(msgs.select(col("dst_ip").as("ip"),
        expr(s"end_at_ms div $W + 1").as("bucket"), lit(-1L).as("delta")))
      .groupBy("ip", "bucket").agg(sum(col("delta")).as("delta"))
      .select(col("ip"), col("bucket"), lit(0).as("tag"),
        col("delta"), lit(null).cast("long").as("nc"))
    val childKeys = msgs.select(col("src_ip").as("ip"),
        expr(s"start_at_ms div $W").as("bucket"))
      .groupBy("ip", "bucket").agg(count(lit(1)).as("nc"))
      .select(col("ip"), col("bucket"), lit(1).as("tag"),
        lit(null).cast("long").as("delta"), col("nc"))
    val keys = bounds.unionAll(childKeys)
      .withColumn("np", sum(coalesce(col("delta"), lit(0L))).over(wIp))
      .where(col("tag") === 1)
      .select(col("np"), col("nc"))
    val nMsgs = msgs.agg(count(lit(1)).as("n_msgs"),
      sum(expr(s"end_at_ms div $W - start_at_ms div $W + 1")).as("parent_replicas"))
    keys.agg(count(lit(1)).as("n_child_keys"),
        sum(col("np") * col("nc")).as("total_candidates"),
        max(col("np") * col("nc")).as("max_candidates"))
      .crossJoin(broadcast(nMsgs))
      .select(col("n_child_keys"), col("total_candidates"), col("max_candidates"),
        col("parent_replicas"), col("n_msgs"),
        expr("parent_replicas * 1000 div n_msgs").as("replication_permille"))
  }

  /** Peak concurrent calls per destination IP — the capacity metric a
    * trace pipeline feeds autoscaling with. Same sweep-line shape as
    * [[bandStats]]: ±1 boundary events, per-IP prefix sum, max — two rows
    * per message, one user-keyed window, O(msgs) at any interval length.
    * Top-20 IPs by peak (ties → ip).
    */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val msgs = Tables.msgs(spark, dir)
      .where(col("end_at_ms") >= col("start_at_ms"))
    val wIp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ip")).orderBy(col("t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val peaks = msgs.select(col("dst_ip").as("ip"),
        col("start_at_ms").as("t"), lit(1L).as("delta"))
      .unionAll(msgs.select(col("dst_ip").as("ip"),
        (col("end_at_ms") + 1L).as("t"), lit(-1L).as("delta")))
      .groupBy("ip", "t").agg(sum(col("delta")).as("delta"))
      .withColumn("cur", sum(col("delta")).over(wIp))
      .groupBy("ip").agg(max(col("cur")).as("peak_concurrent"))
    val calls = msgs.groupBy(col("dst_ip").as("ip"))
      .agg(count(lit(1)).as("n_calls"))
    peaks.join(calls, "ip")
      .orderBy(col("peak_concurrent").desc, col("ip"))
      .limit(20)
  }

  /** The links relation for a testdata dir, memoized per session: five
    * driver queries are views over it (see [[graft.sources.Materialized]]).
    * The memo stores the strict flag alongside the pair (key `links2:` —
    * bumped from `links:` when the stored schema grew the column), so
    * consumers that don't read it prune it at the parquet scan.
    */
  private def linksAllFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"links2:$dir")(
      linksWithStrict(Tables.msgs(spark, dir)))

  def linksFor(spark: SparkSession, dir: String): DataFrame =
    linksAllFor(spark, dir).select("parent_id", "child_id")

  /** The enriched (unsorted) linked relation, memoized per session —
    * `chain_link` presents it sorted, `degree_histogram` folds it.
    */
  def linkedFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"linked:$dir") {
      val m = Tables.msgs(spark, dir)
      val l = linksFor(spark, dir)
      // ONE shuffle for both degree directions: tag-union the two edge
      // orientations and fold them in a single groupBy (collect_set skips
      // the other orientation's nulls), then ONE join back to msgs —
      // formerly two groupBys over the link set plus two sort-merge
      // joins against the message scan.
      val both = l.select(col("child_id").as("id"),
          col("parent_id").as("p"), lit(null).cast("string").as("c"))
        .unionAll(l.select(col("parent_id").as("id"),
          lit(null).cast("string").as("p"), col("child_id").as("c")))
        .groupBy("id")
        .agg(sort_array(collect_set(col("p"))).as("parents"),
          sort_array(collect_set(col("c"))).as("children"))
      m.join(both, Seq("id"), "left")
        .select(m("id"), m("src_ip"), m("dst_ip"), m("start_at_ms"),
          m("latency_msec"), m("end_at_ms"),
          coalesce(col("parents"), array().cast("array<string>")).as("parents"),
          coalesce(col("children"), array().cast("array<string>")).as("children"))
    }

  /** Flagship — A1 (batch form): enrich every message with sorted
    * parents/children arrays (reference output shape, `README.md:49-60`).
    */
  def chainLink(spark: SparkSession, dir: String): DataFrame =
    linkedFor(spark, dir).orderBy("id")

  /** J1 link pairs as a named query (sorted for the oracle). */
  def linkPairs(spark: SparkSession, dir: String): DataFrame =
    linksFor(spark, dir).orderBy("parent_id", "child_id")

  /** P3 — `expand_roles` fan-out (reference: `simpy_kafka_reader.py:94-102`):
    * each message replicated as a ("parent", key=dst_ip) and a
    * ("child", key=src_ip) role record. The 1→2 flatMap that turns the
    * self-join into per-IP local matching.
    */
  def expandRoles(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.msgs(spark, dir)
    m.select(explode(array(
        struct(lit("parent").as("role"), col("dst_ip").as("ip_key")),
        struct(lit("child").as("role"), col("src_ip").as("ip_key"))))
        .as("r"),
        col("id"), col("start_at_ms"), col("end_at_ms"))
      .select(col("r.role").as("role"), col("r.ip_key").as("ip_key"),
        col("id"), col("start_at_ms"), col("end_at_ms"))
      .orderBy("id", "role")
  }

  /** P4 — `expand_updates` fan-out (reference: `simpy_kafka_reader.py:105-115`):
    * each link(p,c) splits into add_child→p and add_parent→c update events;
    * message events pass through keyed by their own id.
    */
  def expandUpdates(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.msgs(spark, dir)
    val l = linksFor(spark, dir)
    val linkUpdates = l.select(explode(array(
        struct(lit("add_child").as("event_type"), col("parent_id").as("key_id"),
          col("child_id").as("other_id")),
        struct(lit("add_parent").as("event_type"), col("child_id").as("key_id"),
          col("parent_id").as("other_id")))).as("u"))
      .select(col("u.event_type").as("event_type"), col("u.key_id").as("key_id"),
        col("u.other_id").as("other_id"))
    // other_id is '' (not NULL) for message events: NULL ordering differs
    // between Spark (nulls first) and DuckDB (nulls last).
    val msgEvents = m.select(lit("message").as("event_type"),
      col("id").as("key_id"), lit("").as("other_id"))
    msgEvents.unionAll(linkUpdates)
      .orderBy("event_type", "key_id", "other_id")
  }

  /** The shared J2/J3 split: messages vs the final watermark
    * `max(start_at_ms) − 30 000` (reference 30 s bound
    * `simpy_kafka_reader.py:28`) — ONE home for the bound and the
    * broadcast-scalar shape, so the emitted set and its eviction
    * complement cannot drift.
    */
  private def vsWatermark(spark: SparkSession, dir: String,
      emitted: Boolean): DataFrame = {
    val m = Tables.msgs(spark, dir)
    val wm = m.agg((max(col("start_at_ms")) - 30000L).as("wm"))
    m.crossJoin(broadcast(wm))
      .where(if (emitted) col("end_at_ms") <= col("wm")
             else col("end_at_ms") > col("wm"))
      .select(m.columns.toIndexedSeq.map(col): _*).orderBy("id")
  }

  /** J2 (batch form) — watermark emission set: messages whose `end_at_ms` is
    * at or below the final watermark (reference: `linking_utils.py:59-76`).
    */
  def watermarkEmitted(spark: SparkSession, dir: String): DataFrame =
    vsWatermark(spark, dir, emitted = true)

  /** J3 — eviction complement: messages still buffered at the final
    * watermark (reference eviction scan `simpy_kafka_reader.py:162-184`
    * removes `end_at_ms <= timer`; these are the survivors).
    */
  def evictionSurvivors(spark: SparkSession, dir: String): DataFrame =
    vsWatermark(spark, dir, emitted = false)

  /** A1 (summary form) — per-id parent/child degree, rolled up into a
    * (parent_cnt, child_cnt) → n histogram. Pure-integer output (hash-safe).
    */
  def degreeHistogram(spark: SparkSession, dir: String): DataFrame =
    // arrays in the linked relation are already distinct (collect_set), so
    // the degree is their size — a fold over the memoized enrichment, not a
    // second pair of countDistinct aggregations over the link pairs.
    linkedFor(spark, dir)
      .select(size(col("parents")).cast("long").as("parent_cnt"),
        size(col("children")).cast("long").as("child_cnt"))
      .groupBy("parent_cnt", "child_cnt").agg(count(lit(1)).as("n"))
      .orderBy("parent_cnt", "child_cnt")

  /** Call-graph traversal: 2-hop ancestor triples (grandparent → parent →
    * child), the composable form of the reference's output arrays — shows
    * the link relation supports multi-hop graph queries. Self-join of the
    * banded link set on the shared mid node.
    */
  def grandparents(spark: SparkSession, dir: String): DataFrame = {
    val l = linksFor(spark, dir)
    l.as("g").join(l.as("c"), col("g.child_id") === col("c.parent_id"))
      .where(col("g.parent_id") =!= col("c.child_id"))
      .select(col("g.parent_id").as("grand_id"),
        col("g.child_id").as("mid_id"),
        col("c.child_id").as("child_id"))
      .distinct()
      .orderBy("grand_id", "mid_id", "child_id")
  }

  /** Strict-containment edge relation (equal-interval 2-cycles removed) —
    * the DAG every [[traceDepth]] round joins against. A pushdown filter
    * over the links memo's stored `strict` flag: the former derivation
    * re-joined msgs twice at LINK cardinality to recover the intervals
    * the banded join had already seen (the sf10 probe measured those two
    * sort-merge passes at 50 s for 35M links); now the flag is computed
    * where the intervals live and this is a parquet scan.
    */
  private[graft] def strictLinksFor(spark: SparkSession, dir: String): DataFrame =
    linksAllFor(spark, dir).where(col("strict"))
      .select("parent_id", "child_id")

  /** Ancestor-chain depth per message: longest path over the STRICT-
    * containment link DAG ([[strictLinksFor]]). Equal-interval pairs link
    * mutually (a 2-cycle in the full relation — the reference allows mutual
    * parent/child), so depth restricts edges to strict containment, which
    * is irreflexive and transitive ⇒ acyclic, making longest-path
    * well-defined.
    *
    * Implementation is a LEVEL-SYNCHRONOUS Δ-FRONTIER RELAXATION on
    * (node, best_len) — O(V) state per round, never a pairwise relation:
    * depth(v) only needs the longest path ENDING at v, so the working
    * set is one row per node seen as a child, seeded at len 1, and each
    * round relaxes depth(v) ← max(depth(u) + 1) over edges u→v where u
    * improved LAST round (the Δ frontier). Monotone and exact in a DAG:
    * every candidate depth(u)+1 is realized by an actual path (no cycle
    * can pass through v), values only grow, and the critical chain
    * improves one level per round, so the loop converges in max-depth
    * rounds with O(V) rows per round. That replaces the former max-plus
    * doubling closure, whose (src, dst, len) reachability relation is
    * O(reachable pairs) — 919k rows vs 359k strict edges at sf0.1
    * (2.6×), data-shape-dependent and quadratic on a bushy DAG even
    * though its loop is log-rounds. Frontier state never exceeds E rows
    * and shrinks monotonically after the widest level.
    *
    * The depth-rounds trade-off is explicit: level-synchronous pays one
    * barrier per DEPTH LEVEL, the closure pays ⌈log₂ depth⌉ barriers but
    * O(pairs) state. Trace DAGs under interval containment are shallow
    * (depth ≈ 12 here, bounded by nesting of call intervals), so O(V)
    * state wins; if a corpus ever presents a chain deeper than
    * [[FrontierRoundCap]], the loop falls back to the retained doubling
    * closure ([[depthsClosure]]) — 100+ driver barriers would dominate
    * the wall clock before state size does. Round count is logged to
    * stderr (`[graft-depth]`). The oracle is a recursive-CTE longest
    * path — an independent mechanism.
    */
  /** Depth-level budget for the frontier DP before falling back to the
    * doubling closure: deeper than this, per-level barriers cost more
    * than the closure's pair-state (96 levels ≈ 192 tiny jobs).
    */
  private[graft] val FrontierRoundCap = 96

  /** Memoized converged depth relation (id, d) for every node of the
    * strict DAG that has an incoming edge — the persisted artifact of
    * the relaxation loop, built once per corpus (same discipline as
    * [[strictLinksFor]] and [[graft.operators.Curation.ccLabelsFor]]; a
    * production trace store refreshes this alongside the link relation).
    * The loop runs on LONG node keys (the numeric tail of the
    * `msg_<event_id>` ids [[Tables.msgs]] mints — half the shuffle width
    * of the id strings).
    */
  private[graft] def depthsFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"tracedepth:$dir") {
      // Edge relation for the loop: a COLUMNAR scan of the links memo
      // (strict flag pushed to parquet, long keys projected in codegen)
      // re-read per level — measured far cheaper at the sf10 probe than
      // the checkpointed-RDD form, whose per-level scans paid a
      // Row-object (de)serialization over 35M edges × 2 uses × depth
      // levels and whose pinned blocks starved later builds into OOM.
      // The count sizes the solver's shuffle width at ~1M edge rows per
      // partition — dozens at the sf10 probe, thousands at 100 TB.
      val edgesSrc = strictLinksFor(spark, dir).select(
        substring(col("parent_id"), 5, 18).cast("long").as("src"),
        substring(col("child_id"), 5, 18).cast("long").as("dst"))
      val nP = math.max(4L, edgesSrc.count() / 1000000L).min(1L << 16).toInt
      // The solver loop runs in a CLONED session (shared context, private
      // SQLConf): relation-sized shuffle width, AQE off (its per-stage
      // re-plan is pure overhead at ~10 sequential barriers); the parent
      // session's conf — and every concurrently running query — is
      // untouched. The edge plan crosses sessions through a global temp
      // view (build-unique name; dropped below).
      val solver = spark.newSession()
      solver.conf.set("spark.sql.shuffle.partitions", nP.toString)
      solver.conf.set("spark.sql.adaptive.enabled", "false")
      val vn = s"graft_trace_edges_${System.nanoTime}"
      edgesSrc.createOrReplaceGlobalTempView(vn)
      try {
        val edges = solver.table(s"global_temp.$vn")
        val (depths, freeBig) =
          depthsFrontier(edges).getOrElse(depthsClosure(edges))
        // Pin the SMALL (node, d) result as its own flat blocks, then
        // release the loop's O(V) working state — leaving it pinned for
        // the session starved later heavy builds at the sf10 probe.
        val (flat, _) = Iterative.round(
          depths.select(concat(lit("msg_"), col("node")).as("id"), col("d")))
        freeBig()
        flat
      } finally spark.catalog.dropGlobalTempView(vn)
    }

  /** Frontier-size threshold below which the relaxation join broadcasts
    * the frontier side (≈16 MB of (long, long) rows): the edge relation
    * then never shuffles — one map-side join + partial-agg per level. A
    * 100 TB graph's early rounds exceed this and take the shuffle path;
    * late rounds (shrinking Δ) drop under it automatically.
    */
  private[graft] val FrontierBroadcastRows = 1000000L

  /** The Δ-frontier relaxation; None if `cap` levels did not converge
    * (pathologically deep chain → caller falls back to
    * [[depthsClosure]]). In a DAG every level-k candidate is automatically
    * an improvement — all of init carries d = 1, so inductively every
    * node improved at level k carries d = k+1, and a candidate d(u)+1 =
    * k+2 exceeds any previously recorded depth (≤ k+1). The Δ frontier is
    * therefore plain BFS-BY-LEVEL: F₀ = all in-edge nodes, F_k = distinct
    * successors of F_{k-1}, and depth(v) = 1 + (last level containing v).
    * No running (node, best_d) state exists at all — the former shape
    * merged each level's candidates into the full O(V) state relation
    * (a V-row tag-union groupBy + checkpoint EVERY level, 9 × 674k rows
    * at sf1.0 even for a 30-row frontier); now a level checkpoints only
    * its frontier and the depths come from ONE end-of-loop max-merge of
    * the per-level frontiers (Σ|F_k| rows — the same candidate volume
    * the loop already enumerated). Each level is one exchange (the
    * distinct) over a count-gated broadcast join of the frontier with
    * the edge scan (no edge shuffle while the frontier fits
    * [[FrontierBroadcastRows]]; a 100 TB graph's early wide rounds take
    * the shuffle path instead). The frontier count that drives
    * termination and the broadcast gate rides the SAME job as an
    * [[org.apache.spark.sql.Observation]] metric (falling back to a
    * narrow count of the checkpointed blocks if the checkpoint action
    * ever stops reporting observed metrics), so a level is exactly one
    * materializing action. Level fusion (k levels per checkpoint) was
    * tried and REJECTED: the frontier is referenced twice per fused
    * level, and measured wall clock DOUBLED at k=6 vs k=1 — exchange
    * reuse does not recover the re-executed chain above the shared
    * shuffle.
    */
  /** Await an [[org.apache.spark.sql.Observation]]'s single long metric,
    * falling back to `orElse` if the observed action's metrics never
    * arrive (defensive: checkpoint actions report observed metrics today,
    * but termination must not hinge on that listener contract).
    */
  private def observedCount(obs: org.apache.spark.sql.Observation,
      orElse: => Long): Long =
    try {
      val row = scala.concurrent.Await.result(obs.future,
        scala.concurrent.duration.Duration(5, "s"))
      if (row.isNullAt(0)) 0L else row.getLong(0)
    } catch { case _: java.util.concurrent.TimeoutException => orElse }

  private[graft] def depthsFrontier(edges: DataFrame,
      cap: Int = FrontierRoundCap): Option[(DataFrame, () => Unit)] = {
    // F₀ = every node with an in-edge (depth 1)
    val obs0 = org.apache.spark.sql.Observation("graft-depth-init")
    val (init, freeInit) = Iterative.round(
      edges.select(col("dst").as("node")).distinct()
        .observe(obs0, count(lit(1)).as("n")))
    // (frontier, depth it witnesses) per nonempty level, newest first
    var frontiers: List[(DataFrame, Long)] = List((init, 1L))
    var frees: List[() => Unit] = List(freeInit)
    var active = observedCount(obs0, init.count())
    var levels = 0
    while (active != 0L && levels < cap) {
      levels += 1
      val t0 = System.nanoTime()
      val cur = frontiers.head._1
      val fs = if (active <= FrontierBroadcastRows) broadcast(cur) else cur
      val cand = fs.as("f")
        .join(edges.as("e"), col("f.node") === col("e.src"))
        .select(col("e.dst").as("node")).distinct()
      val obs = org.apache.spark.sql.Observation(s"graft-depth-$levels")
      val (next, freeNext) = Iterative.round(
        cand.observe(obs, count(lit(1)).as("n")))
      active = observedCount(obs, next.count())
      if (active != 0L) {
        frontiers ::= (next, levels + 1L)
        frees ::= freeNext
      } else freeNext()
      System.err.println(s"[graft-depth] level $levels: " +
        s"${(System.nanoTime() - t0) / 1000000} ms, active=$active")
    }
    if (active != 0L) {
      System.err.println(
        s"[graft-depth] frontier DP exceeded $cap levels — " +
          "falling back to doubling closure")
      frees.foreach(_())
      None
    } else {
      // max depth == converged level count: the critical chain grows by
      // exactly one level per round, and the final (empty) round is not
      // counted past it — init alone converges at levels == 1 only when
      // no second level exists. Empty DAG: active started 0, levels == 0.
      System.err.println(
        s"[graft-depth] frontier DP converged: max depth $levels")
      // ONE max-merge over the per-level frontiers replaces the former
      // per-level state merge; the caller materializes its projection,
      // THEN calls the release handle to free the frontier blocks.
      val depths = frontiers
        .map { case (f, d) => f.withColumn("d", lit(d)) }
        .reduce(_ unionAll _)
        .groupBy("node").agg(max(col("d")).as("d"))
      val freeAll = frees
      Some((depths, () => freeAll.foreach(_())))
    }
  }

  /** Deep-chain fallback: the max-plus PATH-DOUBLING closure. Maintain
    * J(src, dst, len) = longest known path per pair, seeded with edges
    * at len 1; each round squares it against its own `len > horizon/2` Δ
    * slice (a longest ≤2^{k+1} path splits at its midpoint into two
    * longest ≤2^k halves whose prefix was improved last round), so the
    * loop is ⌈log₂ depth⌉ barriers at O(reachable pairs) state —
    * preferable only when depth ≫ [[FrontierRoundCap]].
    */
  private[graft] def depthsClosure(edges: DataFrame): (DataFrame, () => Unit) = {
    val (init, freeInit) = Iterative.round(edges.withColumn("len", lit(1L)))
    var paths = init
    var freeCur = freeInit
    var horizon = 1L   // after k rounds J is exact for lengths ≤ 2^k
    var maxLen = 1L
    var rounds = 0
    while (maxLen >= horizon) {
      rounds += 1
      val delta = paths.where(col("len") > lit(horizon / 2L))
      horizon *= 2L
      val hops = delta.as("a").join(
          paths.select(col("src").as("mid"), col("dst").as("bdst"),
            col("len").as("blen")),
          col("a.dst") === col("mid"))
        .select(col("a.src").as("src"), col("bdst").as("dst"),
          (col("a.len") + col("blen")).as("len"))
      val (next, freeNext) = Iterative.roundLazy(
        paths.unionAll(hops).groupBy("src", "dst")
          .agg(max(col("len")).as("len")))
      val mx = next.agg(max(col("len"))).head()
      maxLen = if (mx.isNullAt(0)) 0L else mx.getLong(0) // empty DAG → done
      freeCur()
      freeCur = freeNext
      paths = next
    }
    System.err.println(
      s"[graft-depth] closure in $rounds doubling rounds, max depth $maxLen")
    // The caller materializes the aggregation below, THEN calls the
    // release handle to free the closure's pair-state blocks.
    (paths.groupBy(col("dst").as("node")).agg(max(col("len")).as("d")),
      freeCur)
  }

  def traceDepth(spark: SparkSession, dir: String): DataFrame =
    Tables.msgs(spark, dir).select(col("id"))
      .join(depthsFor(spark, dir), Seq("id"), "left")
      .select(col("id"), coalesce(col("d"), lit(0L)).as("depth"))
      .orderBy("id")

  /** Gap-based sessionization of the events stream (batch form of a session
    * window): a new session starts when a user's inter-event gap exceeds
    * 30 minutes. One shuffle on user_id; the session id is a running count
    * of gap-breaks — integer-exact and portable.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("em"), col("event_id"))
    val wCum = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ev.select(col("event_id"), col("user_id"), Tables.epochMs.as("em"))
      .withColumn("gap_break",
        when(col("em") - lag(col("em"), 1).over(w) > 1800000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("gap_break")).over(wCum))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("em").as("session_start_ms"),
        max("em").as("session_end_ms"))
      .orderBy("user_id", "session_id")
  }

  /** Gap sessionization via Spark's NATIVE `session_window` — the same
    * 30-min-gap semantics as [[sessionize]] through a genuinely different
    * mechanism (the engine's merging session windows instead of a
    * lag+cumsum window), checked against the same windowed-lag oracle:
    * native end = last event + gap, so the two agree bit-for-bit. In
    * streaming this operator is the stateful session assembler; in batch
    * it is one aggregation.
    */
  def nativeSessions(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        timestamp_millis(Tables.epochMs).as("ets"))
    ev.groupBy(col("user_id"), session_window(col("ets"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("sw.start")).as("start_ms"),
        unix_millis(col("sw.end")).as("end_ms"),
        col("n_events"))
      .orderBy("user_id", "start_ms")
  }

  /** Session-length distribution — one more aggregation over the
    * [[sessionize]] relation (operator composition): events-per-session →
    * (number of such sessions, total in-session time span).
    */
  def sessionStats(spark: SparkSession, dir: String): DataFrame =
    sessionize(spark, dir)
      .select(col("n_events"),
        (col("session_end_ms") - col("session_start_ms")).as("span_ms"))
      .groupBy("n_events")
      .agg(count(lit(1)).as("n_sessions"), sum(col("span_ms")).as("total_span_ms"))
      .orderBy("n_events")

  /** P1 — lenient message parse (reference: `simpy_kafka_reader.py:42-77`):
    * missing/malformed numeric fields default to 0 via `int(float(x))`
    * coercion. Demonstrated on `events.props` JSON: extract `k` with
    * default 0. Uses `from_json` + coalesce (Catalyst-native, codegen'd).
    * Oracle equivalence: the DuckDB side extracts with a full JSON-number
    * regex (incl. exponents); both sides map non-numeric/quoted/missing
    * `k` to the 0 default, so they agree on any valid-JSON props value.
    * One deliberate deviation: both engines FLOOR, while Python's
    * `int(float(x))` truncates toward zero — they differ only on negative
    * fractional k (floor(-2.5) = -3 vs int = -2), a case the generator
    * never emits (k ≥ 0 in the wire format).
    */
  def parseEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    ev.select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k DOUBLE"))
          .getField("k").as("k_raw"))
      .select(col("event_id"),
        floor(coalesce(col("k_raw"), lit(0.0))).cast("long").as("k"))
      .orderBy("event_id")
  }
}
