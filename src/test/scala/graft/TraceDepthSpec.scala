package graft

import org.apache.spark.sql.DataFrame
import graft.operators.ChainLink

/** Equivalence contract for the two trace-depth mechanisms: the O(V)-state
  * level-synchronous Δ-frontier relaxation (the default) and the max-plus
  * doubling closure (the deep-chain fallback). Both must agree with a
  * brute-force longest-path on a DAG that actually exercises the Δ logic —
  * sf0.001's strict graph is depth 1, so a synthetic multi-level DAG with
  * shortcut and cross edges carries this spec (shortcuts are where a
  * naive BFS-level assignment, as opposed to longest-path relaxation,
  * goes wrong).
  */
class TraceDepthSpec extends SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    pairs.toDF("src", "dst")
  }

  /** Brute-force longest path ending at each node (driver-side memoized
    * recursion — an independent third mechanism).
    */
  private def brute(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val byDst = pairs.groupBy(_._2)
    val memo = scala.collection.mutable.Map[Long, Long]()
    def d(v: Long): Long = memo.getOrElseUpdate(v,
      byDst.get(v).map(_.map { case (u, _) => d(u) + 1 }.max).getOrElse(0L))
    (pairs.map(_._1) ++ pairs.map(_._2)).distinct.map(v => v -> d(v)).toMap
  }

  private val dag: Seq[(Long, Long)] = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), // chain: node 6 at depth 5
    (1L, 6L),             // shortcut into the chain tail — must NOT shorten 6
    (3L, 7L), (6L, 7L),   // node 7 hangs off both mid-chain and tail
    (10L, 11L), (10L, 12L), (11L, 13L), (12L, 13L), (13L, 14L), // diamond
    (2L, 13L),            // cross edge between components
    (20L, 21L))           // isolated edge (depth 1)

  private def toMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("frontier DP == doubling closure == brute force on a layered DAG") {
    val e = edgesDf(dag)
    val expected = brute(dag).filter(_._2 > 0) // relation holds in-edge nodes only
    val frontier = ChainLink.depthsFrontier(e)
    assert(frontier.isDefined, "well within the round cap — must converge")
    assert(toMap(frontier.get._1) == expected)
    frontier.get._2() // release handle usable after the read
    val (closure, freeClosure) = ChainLink.depthsClosure(e)
    assert(toMap(closure) == expected)
    freeClosure()
  }

  test("a round cap below the DAG depth reports non-convergence (fallback trigger)") {
    // depth 6 (1..6 chain then 7) needs 6 relaxation levels; cap 2 must
    // bail out so depthsFor falls back to the closure instead of looping
    assert(ChainLink.depthsFrontier(edgesDf(dag), cap = 2).isEmpty)
  }

  test("empty edge relation converges immediately to an empty depth relation") {
    val out = ChainLink.depthsFrontier(edgesDf(Seq.empty))
    assert(out.isDefined && out.get._1.count() == 0)
  }
}
