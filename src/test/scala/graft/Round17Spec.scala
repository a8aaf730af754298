package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Round-17 mechanisms: NN-descent refinement of the kNN graph and the
  * graph-derived candidate union in the production pair build.
  */
class Round17Spec extends SparkSpec {

  private lazy val v = Dedup.normedFor(spark, sf0001)
  private lazy val seed = Neighbors
    .knnEdgesBuild(spark, sf0001, Neighbors.KnnCoarseNprobe,
      Neighbors.KnnFinePerCell, Neighbors.KnnMemberCap, Neighbors.KnnWorkK)
    .localCheckpoint(true)

  /** Exact cosine top-GraphK neighbor set per panel vector, brute force
    * on the driver — the ground truth the refinement must move toward.
    */
  private lazy val exactTop: Map[Long, Set[Long]] = {
    val rows = v.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    rows.map { case (id, e, n) =>
      id -> rows.filter(_._1 != id)
        .map { case (j, ej, nj) =>
          (j, e.zip(ej).map { case (a, b) => a * b }.sum / (n * nj))
        }
        .sortBy { case (j, c) => (-c, j) }
        .take(Neighbors.GraphK).map(_._1).toSet
    }.toMap
  }

  private def hits(edges: org.apache.spark.sql.DataFrame): Long =
    edges.where(col("rk") <= Neighbors.GraphK).collect()
      .count(r => exactTop(r.getLong(0)).contains(r.getLong(1))).toLong

  test("NN-descent round: degree bounds, dense ranks, no self/dup edges") {
    val r1 = Neighbors.knnRefineRound(v, seed)
    val bad = r1.groupBy("src")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"))
      .where(col("n") > Neighbors.KnnWorkK || col("mx") =!= col("n") ||
        col("mn") =!= 1)
      .count()
    assert(bad === 0L, "per-src: <= workK edges, rk dense from 1")
    assert(r1.where(col("src") === col("dst")).count() === 0L)
    assert(r1.select("src", "dst").distinct().count() === r1.count())
  }

  test("NN-descent rounds: recall monotone non-decreasing toward exact truth") {
    val r1 = Neighbors.knnRefineRound(v, seed).localCheckpoint(true)
    val r2 = Neighbors.knnRefineRound(v, r1).localCheckpoint(true)
    val (h0, h1, h2) = (hits(seed), hits(r1), hits(r2))
    assert(h1 >= h0, s"round 1 must not lose exact-top-k hits ($h0 -> $h1)")
    assert(h2 >= h1, s"round 2 must not lose exact-top-k hits ($h1 -> $h2)")
    // at this scale the mechanism must genuinely bite, not hold steady
    assert(h2 > h0, "two rounds must strictly improve recall at sf0.001")
  }

  test("NN-descent round is deterministic (two plans, identical rows)") {
    val a = Neighbors.knnRefineRound(v, seed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = Neighbors.knnRefineRound(v, seed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a === b)
  }

  test("knnEdgesFor serves the truncated refined graph") {
    val e = Neighbors.knnEdgesFor(spark, sf0001)
    assert(e.where(col("rk") > Neighbors.GraphK).count() === 0L)
    // serving edges are the top-GraphK prefix of a workK-ranked relation:
    // ranks stay dense from 1
    val bad = e.groupBy("src")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"))
      .where(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(bad === 0L)
  }

  test("graphPairsFor: unordered, threshold-verified, covers the edge pairs") {
    val gp = Dedup.graphPairsFor(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(gp.nonEmpty, "graph pairs must bite at sf0.001")
    assert(gp.forall { case (a, b, _) => a < b }, "pairs are unordered (a < b)")
    assert(gp.forall { case (_, _, c) => c >= Dedup.PairCosThreshold },
      "verification threshold")
    val gpSet = gp.map { case (a, b, _) => (a, b) }.toSet
    assert(gpSet.size === gp.length, "no duplicate pairs across rounds")
    // round 18: the survivors are a SUPERSET of the threshold-passing
    // working-graph edge pairs — every kept edge was scored in its round
    val v = Dedup.normedFor(spark, sf0001)
    val edgePairs = Dedup.graphPairsOver(spark, v,
        Neighbors.knnWorkEdgesFor(spark, sf0001)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgePairs.subsetOf(gpSet),
      "threshold-passing workK edge pairs all survive as candidates")
  }

  test("production pair build contains both candidate sources") {
    val prod = Dedup.ivfHashminPairsFor(spark, sf0001)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gp = Dedup.graphPairsFor(spark, sf0001)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Dedup.subBucketPairs(v,
        Similarity.ivf2ProbeIds(spark, sf0001, Dedup.PairCoarseNprobe,
          Dedup.PairFinePerCell))
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gp.subsetOf(prod), "graph pairs ride into the production build")
    assert(bucketed.subsetOf(prod), "bucketed pairs stay in")
    assert(prod === (gp ++ bucketed), "and nothing else appears")
  }
}
