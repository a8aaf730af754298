package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Round-18 mechanisms: the one-pass graph chain (working-degree memo +
  * scored-candidate survivors) and the hoisted pair-verification
  * threshold.
  */
class Round18Spec extends SparkSpec {

  private lazy val v = Dedup.normedFor(spark, sf0001)

  test("serving graph is the GraphK rank filter of the working relation") {
    val work = Neighbors.knnWorkEdgesFor(spark, sf0001)
    val serve = Neighbors.knnEdgesFor(spark, sf0001)
    assert(work.where(col("rk") > Neighbors.KnnWorkK).count() === 0L)
    val w = work.where(col("rk") <= Neighbors.GraphK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val s = serve.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(s === w)
    // the working relation genuinely carries edges past the truncation
    assert(work.where(col("rk") > Neighbors.GraphK).count() > 0L)
  }

  test("scored survivors == compositional replay of the refine rounds") {
    // independently rebuild the chain from the public stage functions and
    // compare against the memoized knncand table — exercises the scalar
    // memo, the checkpoint plumbing and the publication order
    var edges = Neighbors.knnEdgesBuild(spark, sf0001,
      Neighbors.KnnCoarseNprobe, Neighbors.KnnFinePerCell,
      Neighbors.KnnMemberCap, Neighbors.KnnWorkK).localCheckpoint(true)
    var expected = Set.empty[(Long, Long, Double)]
    (1 to Neighbors.KnnRefineRounds).foreach { _ =>
      val scored = Neighbors.knnRefineScored(v, edges).localCheckpoint(true)
      expected = expected ++ scored
        .where(col("cos") >= Dedup.PairCosThreshold).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      edges = Neighbors.rankFromScored(scored, Neighbors.KnnWorkK)
        .localCheckpoint(true)
    }
    val got = Neighbors.knnScoredPairsFor(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
  }

  test("survivor cosines are bit-identical to pair verification") {
    val emb = v.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    Neighbors.knnScoredPairsFor(spark, sf0001).collect().foreach { r =>
      val (a, b, cos) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val ((ea, na), (eb, nb)) = (emb(a), emb(b))
      // same left-fold the engine and the oracle both use
      val dot = ea.zip(eb).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      assert(cos == dot / (na * nb), s"pair ($a,$b)")
    }
  }

  test("production pair build == probe pairs ∪ scored survivors") {
    val prod = Dedup.ivfHashminPairsFor(spark, sf0001)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Neighbors.knnScoredPairsFor(spark, sf0001)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probe = Dedup.subBucketPairs(v,
        Similarity.ivf2ProbeIds(spark, sf0001, Dedup.PairCoarseNprobe,
          Dedup.PairFinePerCell))
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prod === (cand ++ probe))
  }

  test("threshold constant is the one home, mirrored into the oracle SQL") {
    assert(Dedup.PairCosThresholdSql === "0.40")
    assert(Dedup.PairCosThresholdSql.toDouble === Dedup.PairCosThreshold)
    val gp = entry.OracleCtes.graphPairsCte("gp", "g")
    assert(gp.contains(s"cos >= ${Dedup.PairCosThresholdSql}"))
    (1 to Neighbors.KnnRefineRounds).foreach(i =>
      assert(gp.contains(s"gsn$i"), s"survivor union covers round $i"))
    assert(entry.OracleCtes.ivfPairCtes("p", "src")
      .contains(s"cos >= ${Dedup.PairCosThresholdSql}"))
  }
}
