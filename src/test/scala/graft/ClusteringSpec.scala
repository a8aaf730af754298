package graft

import graft.operators.{Clustering, Dedup, Similarity}

/** Sanity invariants for the Lloyd-refined centroid table and its drift
  * report (bit-exactness vs the replayed loop is pinned by the DuckDB
  * oracle; these are the structural properties).
  */
class ClusteringSpec extends SparkSpec {

  test("refined centroids: at most K survive, ids come from the seed set") {
    val seeds = Similarity.centroidsFor(Dedup.normedFor(spark, sf001))
      .select("cent_id").collect().map(_.getLong(0)).toSet
    val kc = Clustering.kmeansCentroidsFor(spark, sf001)
      .select("cent_id").collect().map(_.getLong(0))
    assert(kc.length <= seeds.size && kc.nonEmpty)
    assert(kc.forall(seeds), "refined ids must be seed ids")
    assert(kc.distinct.length == kc.length)
  }

  test("centroid drift: one row per survivor, cosine within [-1000, 1000]") {
    val kc = Clustering.kmeansCentroidsFor(spark, sf001).count()
    val got = Clustering.centroidDrift(spark, sf001).collect()
    assert(got.length == kc)
    got.foreach { r =>
      val c = r.getLong(1)
      assert(c >= -1000L && c <= 1000L, s"cent ${r.getLong(0)}: $c")
    }
    // Lloyd means of cells that contain the seed itself: drift should be
    // a refinement, not a teleport — most cells stay positively aligned
    assert(got.count(_.getLong(1) > 0) * 2 > got.length)
  }
}
