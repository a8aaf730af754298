package graft

import graft.operators.{Clustering, Dedup, Similarity}

/** Sanity invariants for the Lloyd-refined centroid table and its drift
  * report (bit-exactness vs the replayed loop is pinned by the DuckDB
  * oracle; these are the structural properties).
  */
class ClusteringSpec extends SparkSpec {

  test("argmax probe (nprobe=1) equals the brute-force (cos DESC, cent_id ASC) head") {
    // multiProbe's O(K) array_min + first-position path must reproduce the
    // former sort-take-1 exactly, ties included: brute-force every
    // (vector, centroid) cosine in driver Scala (same fold order as
    // VectorOps.dot) and take max cos with min cent_id on ties
    val v = Dedup.normedFor(spark, sf001)
    val cents = Similarity.centroidsFor(v)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val vecs = v.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val expected = vecs.map { case (id, e, nrm) =>
      // first index holding the max cos == smallest cent_id on exact ties
      var bestCos = Double.NegativeInfinity; var bestId = -1L
      cents.foreach { case (cid, ce, cn) =>
        val c = dot(e, ce) / (nrm * cn)
        if (c > bestCos) { bestCos = c; bestId = cid }
      }
      id -> bestId
    }.toMap
    val got = Similarity.ivfAssign(v, Similarity.centroidsFor(v))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("multiProbe: empty centroid table degrades to zero rows on BOTH paths") {
    // the nprobe=1 argmax path must not emit a null-cent_id row where the
    // sort-slice-explode path emits nothing (array_min/array_position of
    // an empty array are null without the size guard)
    val v = Dedup.normedFor(spark, sf001)
    val emptyCents = Similarity.centroidsFor(v).limit(0)
    assert(Similarity.multiProbe(v, emptyCents, nprobe = 1).count() == 0L)
    assert(Similarity.multiProbe(v, emptyCents, nprobe = 2).count() == 0L)
  }

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
