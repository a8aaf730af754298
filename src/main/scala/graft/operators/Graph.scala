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

  /** Distinct undirected co-occurrence edges (l_partkey pairs sharing an
    * order), oriented low→high id. Per-order fan-out is bounded by order
    * size (≤ ~13 parts), so the pair explosion is O(orders · size²) with a
    * small constant — the safe co-occurrence regime. (For unbounded baskets
    * the standard fix is a per-basket top-k cap before pairing.)
    */
  private[operators] def coEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
      .distinct()
  }

  /** Triangle participation per part over the co-occurrence graph: top 20
    * parts by triangle count. Triangles are enumerated once in id
    * orientation (u<v<w) via two hash-joins on the edge relation, then
    * credited to each corner. At web scale the same plan runs with
    * degree-ordered orientation (orient edges low-degree→high-degree) so
    * the join fan-out is bounded by arboricity — a one-column change.
    */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val e = coEdges(spark, dir).cache()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val perNode = tri.select(explode(array(col("a"), col("b"), col("c"))).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n_triangles"))
    perNode.orderBy(col("n_triangles").desc, col("pk")).limit(20)
  }
}
