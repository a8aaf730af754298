package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Graph analytics over the engine's two natural graphs:
  *
  *  - the **trace graph** (parent→child link pairs from the chain-linking
  *    join — reference `simpy_kafka_reader.py` linking semantics), and
  *  - the **co-occurrence graph** (parts appearing in the same order).
  *
  * Both PageRank and triangle counting are expressed as plain shuffles on
  * key columns, so they distribute exactly like any aggregation: at 100 TB
  * the edge relation partitions by source vertex and every step is one
  * hash-join + one partial-aggregated groupBy. All arithmetic is integer
  * (permille fixed-point), so the DuckDB oracle hash-matches bit-for-bit —
  * no cross-engine float drift.
  */
object Graph {

  /** Two unrolled integer-PageRank iterations over the trace graph.
    *
    * Fixed-point contract (identical in the oracle SQL): every node starts
    * at rank 1000 (permille); one step is
    * `rank' = 150 + (Σ_parents 850·(rank_p div outdeg_p)) div 1000`
    * — the damping-0.85 update with `div` everywhere, so both engines
    * compute the same integers. Dangling nodes keep the base 150+0.
    *
    * Scale shape: `outdeg` is one partial-aggregated groupBy of the edge
    * list; each iteration is edges ⋈ ranks (both partitioned by parent id)
    * then a groupBy on child id. Rank state is one long per node — at 10⁹
    * nodes this is the textbook Pregel-on-joins layout; iteration count is
    * fixed (2), so there is no driver-side convergence loop at all.
    */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val edges = ChainLink.linksFor(spark, dir)
      .select(col("parent_id"), col("child_id"))
    val nodes = Tables.msgs(spark, dir).select(col("id"))
    val outdeg = edges.groupBy("parent_id").agg(count(lit(1)).as("outdeg"))

    def step(ranks: DataFrame): DataFrame = {
      val contrib = edges
        .join(outdeg, "parent_id")
        .join(ranks.select(col("id").as("parent_id"), col("pr").as("pr_p")),
          "parent_id")
        .select(col("child_id").as("id"),
          expr("850 * (pr_p div outdeg)").as("c"))
        .groupBy("id").agg(sum(col("c")).as("c"))
      nodes.join(contrib, Seq("id"), "left")
        .select(col("id"), expr("150 + coalesce(c, 0) div 1000").as("pr"))
    }

    val r0 = nodes.select(col("id"), lit(1000L).as("pr"))
    val r1 = step(r0)
    val r2 = step(r1)
    r2.join(r1.select(col("id"), col("pr").as("pr_prev")), "id")
      .select(col("id"), col("pr_prev"), col("pr"))
      .orderBy("id")
  }

  /** Undirected co-occurrence edges: part pairs sharing **at least two**
    * orders (support ≥ 2 — the standard market-basket prune), oriented
    * low→high id. Per-order fan-out is bounded by order size (≤ ~13
    * parts), so pair generation is O(orders · size²) feeding straight into
    * a partial-aggregated support count. The support threshold is what
    * makes the graph scale-stable: single-co-occurrence edges are random
    * noise whose count grows linearly with orders (1.2M at sf0.1), while
    * support ≥ 2 edges are the real co-purchase signal and stay ~constant
    * (3.6k at sf0.1) — without it, any downstream graph algorithm is
    * O(noise), with it the graph fits wherever it lands.
    *
    * Df-cap check (adjudicated, none needed): unlike the shingle index
    * — whose join key is a shared TOKEN with unbounded document
    * frequency, where one boilerplate shingle makes a single posting
    * list quadratic and [[Dedup.ShingleDfCap]] is mandatory — this
    * operator keys pair generation on the ORDER id. A key's multiplicity
    * is that order's distinct-part count, a per-record data-model bound
    * (≤ 7 lineitems/order here; a basket width in general) that does NOT
    * grow with corpus size, so no key ever goes hot and per-key fan-out
    * stays C(width, 2) at any scale. The quadratic-risk quantity is
    * record width, not key frequency; a df-cap would bias support counts
    * while guarding against a key shape this operator cannot produce.
    */
  private[graft] def coEdges(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"co_edges:$dir") {
      // one shuffle: collect_set dedupes parts per order; pairs are
      // generated map-side from the sorted per-order array (u < v by
      // construction) instead of a second shuffle for a self-join
      val byOrder = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .groupBy("ok").agg(sort_array(collect_set(col("pk"))).as("ps"))
      byOrder
        .select(explode(flatten(transform(col("ps"), (x, i) =>
          transform(slice(col("ps"), i + 2, size(col("ps"))),
            y => struct(x.as("u"), y.as("v")))))).as("p"))
        .groupBy(col("p.u").as("u"), col("p.v").as("v"))
        .agg(count(lit(1)).as("support"))
        .where(col("support") >= 2)
        .select("u", "v")
    }

  /** Triangle participation per part over the co-occurrence graph: top 20
    * parts by triangle count.
    *
    * Enumeration uses **degree-ordered orientation** (compact-forward):
    * each undirected edge points from its lower-degree endpoint (ties →
    * smaller id), making the orientation acyclic, so every triangle has
    * exactly one vertex with out-edges to the other two and is produced by
    * exactly one wedge. Wedge count is Σ outdeg², bounded by m^1.5
    * (arboricity bound) instead of Σ deg² — on this co-occurrence graph at
    * sf0.1 that is the difference between ~10⁶ and ~10⁸ candidates, and
    * it is the property that keeps the plan alive on power-law graphs at
    * 100 TB. Wedges close against the canonical (u<v) edge set.
    */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val e = coEdges(spark, dir)
    val deg = e.select(col("u").as("x")).unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val eo = e
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
        .otherwise(struct(col("v").as("src"), col("u").as("dst"))).as("o"))
      .select(col("o.src").as("src"), col("o.dst").as("dst"))
    // wedges from a shared source; x < y so the closing edge is canonical
    val wedges = eo.as("a").join(eo.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .select(col("a.src").as("s"), col("a.dst").as("x"), col("b.dst").as("y"))
    val tri = wedges.join(e,
      wedges("x") === e("u") && wedges("y") === e("v"))
    val perNode = tri.select(explode(array(col("s"), col("x"), col("y"))).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_triangles"))
    perNode.orderBy(col("n_triangles").desc, col("pk")).limit(20)
  }
}
