package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Fixpoint-loop plumbing shared by the iterative graph operators
  * ([[Curation.dedupClusters]], [[ChainLink.traceDepth]]).
  *
  * A propagation round's plan references the previous round's relation
  * TWICE (once inside the neighbor aggregation, once as the outer join
  * side), so without truncation the logical plan doubles every round —
  * 2^rounds copies of the base plan, which OOMs the driver after ~10
  * rounds regardless of data size. `cache()` does not help: caching
  * shortcuts execution, not plan size.
  *
  * [[round]] eagerly `localCheckpoint`s the round (the plan collapses to a
  * flat scan of materialized blocks) and returns a release handle that
  * unpersists those blocks once the round is superseded —
  * `Dataset.unpersist` cannot do that (checkpoint blocks belong to the
  * underlying RDD, not the CacheManager).
  */
private[graft] object Iterative {

  /** Materialize one fixpoint round: (flattened DataFrame, block release). */
  def round(df: DataFrame): (DataFrame, () => Unit) = roundImpl(df, eager = true)

  /** Lazy variant: the checkpoint is marked but not computed, so the
    * caller's NEXT action over the returned frame (the loops' changed-count
    * aggregate) materializes and pins the blocks in the same job — one job
    * per round instead of materialize-then-count.
    */
  def roundLazy(df: DataFrame): (DataFrame, () => Unit) = roundImpl(df, eager = false)

  private def roundImpl(df: DataFrame, eager: Boolean): (DataFrame, () => Unit) = {
    val ck = df.localCheckpoint(eager)
    val free: () => Unit = ck.queryExecution.analyzed.collectFirst {
      case lr: LogicalRDD => () => { lr.rdd.unpersist(false); () }
    }.getOrElse(() => ())
    // Sever inherited statistics: localCheckpoint PRESERVES the origin
    // plan's size estimate, so a loop whose round plan joins the previous
    // round's relation k times compounds sizeInBytes ^k PER ROUND — by
    // round ~7 the estimates are BigIntegers with millions of digits and
    // Catalyst stats visits (BigInteger.multiply, Toom-Cook) dominate the
    // wall clock (measured: 0.4 s rounds ballooning to 68 s). Rebuilding
    // the frame over the checkpointed RDD drops originStats to the
    // constant default, at the cost of one row (de)serialization pass
    // over the (small, flat) round relation.
    val flat = ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    (flat, free)
  }

  /** Min-label-propagation connected components over a SYMMETRIC edge list
    * (columns `src`, `dst`; both directions present) — the Pregel-shaped
    * fixpoint shared by [[Curation.dedupClusters]] and
    * [[Neighbors.knnClusters]]. Returns (node, label) for every node with
    * ≥ 1 edge; label = min node id of the component.
    *
    * Each materialized round runs TWO propagation steps (bounded plan
    * growth), so the loop does ⌈diameter/2⌉ single-action rounds;
    * terminating on step-2 changes is sound because step 2 propagates
    * exactly step 1's moves. Pointer-jumping shortcuts were tried and
    * REJECTED in round 10: min-propagation labels point at local minima,
    * which are self-labeled roots, so the label forest is ~1 deep on
    * random-id graphs and label-of-label is a no-op (measured: identical
    * 16-round convergence with 3 fused jump levels, at +20%/round).
    * Callers with high-diameter bounded-degree edge relations shorten
    * the loop by DENSIFYING the input instead ([[Neighbors.knnCcFor]]'s
    * E ∪ E² ∪ E⁴ — same components, diameter ÷4). Converged round count
    * is logged to stderr (`[graft-cc]`) so bench lines carry the
    * iteration evidence.
    *
    * DIAMETER ESCAPE HATCH: if the loop has not converged within
    * `handoffBudget` rounds (≈ 2·budget hops of diameter), the ORIGINAL
    * edge set is handed to [[connectedComponentsStars]] — the O(log² n)
    * kernel whose round count is diameter-independent — so a
    * pathological million-hop chain costs log² rounds, not diameter/2,
    * without the call site having to know its graph's shape. The budget
    * comfortably exceeds every corpus graph's measured round count
    * (≤ 16), so corpus results and plans are unchanged.
    */
  def connectedComponents(edgesIn: DataFrame,
      handoffBudget: Int = 48): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, least, min}
    // The loop runs in a CLONED session (shared context, private SQLConf):
    // relation-sized shuffle width, AQE off. Per-round relations are tiny
    // degree-bounded edge/label lists, so the parent session's 2×-cores
    // AQE width prices every one of the ~diameter/2 sequential barriers
    // in scheduler latency, and AQE's per-stage re-plan buys nothing at
    // that size — the same discipline (and measurements) as
    // [[ChainLink.depthsFor]]'s solver. The edge plan crosses sessions
    // through a global temp view (build-unique name, dropped on exit);
    // the parent session's conf and concurrent queries are untouched.
    val parent = edgesIn.sparkSession
    val vn = s"graft_cc_edges_${System.nanoTime}"
    edgesIn.select("src", "dst").createOrReplaceGlobalTempView(vn)
    try {
      val solver = parent.newSession()
      solver.conf.set("spark.sql.adaptive.enabled", "false")
      val edges = solver.table(s"global_temp.$vn").cache()
      // One count sizes the loop's shuffle width at ~1M edge rows per
      // partition (floor 4) and warms the edge cache in the same pass.
      val nEdges = edges.count()
      solver.conf.set("spark.sql.shuffle.partitions",
        math.max(4L, nEdges / 1000000L).min(1L << 16).toString)
      val (init, freeInit) = round(
        edges.select(col("src").as("node")).distinct()
          .withColumn("label", col("node")))
      var labels = init
      var freeCur = freeInit
      var changed = 1L
      var rounds = 0
      while (changed > 0 && rounds < handoffBudget) {
        rounds += 1
        val step1 = labels.join(
            edges.join(labels, edges("src") === labels("node"))
              .groupBy(col("dst").as("node1")).agg(min("label").as("m1")),
            labels("node") === col("node1"), "left")
          .select(labels("node").as("node"), labels("label").as("l0"),
            least(labels("label"), coalesce(col("m1"), labels("label"))).as("l1"))
        val f1 = step1.where(col("l1") =!= col("l0"))
          .select(col("node").as("fnode"), col("l1").as("fl"))
        val (next, freeNext) = roundLazy(
          step1.join(
              edges.join(f1, edges("src") === col("fnode"))
                .groupBy(col("dst").as("node2")).agg(min(col("fl")).as("m2")),
              col("node") === col("node2"), "left")
            .select(col("node"), col("l1").as("mid"),
              least(col("l1"), coalesce(col("m2"), col("l1"))).as("label")))
        changed = next.where(col("label") =!= col("mid")).count()
        freeCur()
        freeCur = freeNext
        labels = next.select("node", "label")
      }
      if (changed > 0) {
        // budget exhausted — the graph's diameter outruns the min-label
        // loop; free this loop's state and restart on the star kernel
        // (components are a property of the edge set, so partial labels
        // carry no information the kernel needs)
        System.err.println(
          s"[graft-cc] round budget $handoffBudget hit — star-contraction handoff")
        freeCur()
        edges.unpersist()
        connectedComponentsStars(edgesIn)
      } else {
        System.err.println(s"[graft-cc] converged in $rounds rounds")
        edges.unpersist()
        labels
      }
    } finally parent.catalog.dropGlobalTempView(vn)
  }

  /** Alternating large-star / small-star connected components (Kiveris,
    * Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components
    * in MapReduce and Beyond", SoCC 2014): the O(log² n)-round kernel a
    * 100 TB deployment swaps in when component DIAMETER is unbounded.
    * The default min-label loop ([[connectedComponents]]) prices one
    * round per two hops of diameter — fine for the bounded-diameter
    * graphs this corpus produces (mutual-kNN components, dedup
    * clusters), quadratic-in-rounds on a pathological million-hop
    * chain. Star contraction's round count depends only on log n.
    *
    * State is the canonical DOWNWARD edge list (hi, lo), hi > lo:
    * - LARGE-STAR processes every edge at BOTH endpoints (u over its
    *   full neighborhood Γ): m = min(Γ(u) ∪ {u}), emit (v, m) for each
    *   v ∈ Γ(u) with v > u. Each undirected edge lands in exactly one
    *   emit set, every output points downward, components never merge
    *   or split.
    * - SMALL-STAR processes each edge at its LARGER endpoint (all
    *   stored lo's of a hi): m = min(lo's) (< hi by construction),
    *   emit (v, m) for every other lo plus (hi, m).
    * At the fixpoint the edge set is the star (v, root) per component
    * and both phases are identity. Termination is detected by a
    * (count, sum-of-xxhash64) signature riding each alternation's
    * checkpoint as an [[org.apache.spark.sql.Observation]] — two
    * consecutive equal signatures of a DETERMINISTIC set transformation
    * mean equal sets up to a 64-bit hash collision. A signature match is
    * NOT trusted on its own: before returning, the star invariant is
    * verified directly (every `hi` holds exactly one distinct `lo`, and
    * no `lo` appears as a `hi` — two `limit 1` probes over the tiny
    * fixpoint relation), and a violation falls back to the min-label
    * kernel, so a colliding signature costs a slower (never wrong)
    * answer. The round cap takes the same fallback.
    *
    * Returns (node, label = component min) for every node with ≥ 1
    * edge — the same contract as [[connectedComponents]], proven
    * equivalent on the corpus graphs by StarContractionSpec. Wired as
    * [[connectedComponents]]' diameter escape hatch (its `handoffBudget`)
    * rather than the default: at test scales the per-round cost of the
    * two-phase groupBys loses to the min-label loop on these
    * small-diameter graphs (the densified mutual-kNN fixpoint runs ~11
    * rounds; star contraction converges in ~5 alternations but each
    * alternation is two grouped exchanges plus re-symmetrization).
    */
  def connectedComponentsStars(edgesIn: DataFrame, cap: Int = 64): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, greatest, least, lit, min, sum, xxhash64}
    val parent = edgesIn.sparkSession
    val vn = s"graft_ccs_edges_${System.nanoTime}"
    edgesIn.select("src", "dst").createOrReplaceGlobalTempView(vn)
    try {
      val solver = parent.newSession()
      solver.conf.set("spark.sql.adaptive.enabled", "false")
      val input = solver.table(s"global_temp.$vn")
      val nEdges = input.count()
      solver.conf.set("spark.sql.shuffle.partitions",
        math.max(4L, nEdges / 1000000L).min(1L << 16).toString)
      // signature: row count + overflow-free DECIMAL(38) sum of 64-bit
      // row hashes (ANSI mode makes a LONG sum throw on overflow)
      def hsum = sum(xxhash64(col("hi"), col("lo")).cast("decimal(38,0)"))
      def observed(df: DataFrame): (DataFrame, () => (Long, String), () => Unit) = {
        val obs = org.apache.spark.sql.Observation(
          s"graft-ccs-${System.nanoTime}")
        val (ck, free) = round(df.observe(obs,
          count(lit(1)).as("n"), hsum.as("h")))
        val get = () => try {
          val r = scala.concurrent.Await.result(obs.future,
            scala.concurrent.duration.Duration(5, "s"))
          (r.getLong(0), String.valueOf(r.get(1)))
        } catch {
          case _: java.util.concurrent.TimeoutException =>
            val r = ck.agg(count(lit(1)), hsum).head()
            (r.getLong(0), String.valueOf(r.get(1)))
        }
        (ck, get, free)
      }
      // canonical downward form, deduped
      val (init, sig0, freeInit) = observed(
        input.where(col("src") =!= col("dst"))
          .select(greatest(col("src"), col("dst")).as("hi"),
            least(col("src"), col("dst")).as("lo"))
          .distinct())
      var e = init
      var freeCur = freeInit
      var prev = sig0()
      var rounds = 0
      var converged = prev._1 == 0L   // empty graph: already a (vacuous) star
      while (!converged && rounds < cap) {
        rounds += 1
        // LARGE-STAR over the symmetric view
        val sym = e.select(col("hi").as("u"), col("lo").as("v"))
          .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
        val lsMin = sym.groupBy("u").agg(min("v").as("mn"))
          .select(col("u"), least(col("u"), col("mn")).as("m"))
        val ls = sym.join(lsMin, "u").where(col("v") > col("u"))
          .select(col("v").as("hi"), col("m").as("lo"))
          .where(col("hi") =!= col("lo")).distinct()
        val (lsd, freeLs) = round(ls)
        // SMALL-STAR at each larger endpoint
        val ssMin = lsd.groupBy("hi").agg(min("lo").as("mn"))
        val ss = lsd.join(ssMin, "hi").where(col("lo") =!= col("mn"))
          .select(col("lo").as("hi"), col("mn").as("lo"))
          .unionAll(ssMin.select(col("hi"), col("mn").as("lo")))
          .distinct()
        val (next, sigN, freeNext) = observed(ss)
        freeLs(); freeCur()
        freeCur = freeNext
        e = next
        val cur = sigN()
        converged = cur == prev
        prev = cur
        System.err.println(
          s"[graft-ccs] alternation $rounds: edges=${cur._1}")
      }
      // hand the CURRENT edge set (same components as the input, by the
      // phase invariants) to the guaranteed min-label kernel with the
      // diameter handoff DISABLED (it would bounce straight back here);
      // the output frame does not reference this loop's blocks, so they
      // are freed after it returns
      def fallback(reason: String): DataFrame = {
        System.err.println(s"[graft-ccs] $reason — min-label fallback")
        val handoff = e.select(col("hi").as("src"), col("lo").as("dst"))
        val out = connectedComponents(
          handoff.unionAll(handoff.select(col("dst").as("src"),
            col("src").as("dst"))), handoffBudget = Int.MaxValue)
        freeCur()
        out
      }
      if (!converged) {
        fallback(s"cap $cap hit")
      } else if (!e.groupBy("hi").agg(count(lit(1)).as("c"))
          .where(col("c") > 1L).isEmpty ||
        !e.select(col("lo")).join(e.select(col("hi").as("lo")),
          Seq("lo"), "left_semi").isEmpty) {
        // two equal signatures but NOT a star — a 64-bit collision
        // declared a false fixpoint; the rows are distinct, so
        // count-per-hi == distinct-lo-per-hi, and a lo that is also a
        // hi means an un-contracted chain
        fallback("signature collision (star invariant violated)")
      } else {
        System.err.println(s"[graft-ccs] stars in $rounds alternations")
        // stars: (v, root) per non-root node; roots label themselves
        val labels = e.select(col("hi").as("node"), col("lo").as("label"))
          .unionAll(e.select(col("lo").as("node"), col("lo").as("label")))
          .distinct()
        val (flat, _) = round(labels)
        freeCur()
        flat
      }
    } finally parent.catalog.dropGlobalTempView(vn)
  }
}
