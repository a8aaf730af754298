package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Clustering, Dedup, Similarity}

/** Structural invariants of the round-15 migrations: routed kNN/Lloyd
  * probe passes, the per-bucket-salted sub-bucket budget, the lshCosine
  * hard budget, and the audit-population single-level baseline.
  * Bit-exactness vs the replayed decision procedures is pinned by the
  * DuckDB oracles; these pin the mechanics against driver-Scala
  * references and synthetic skew the gate corpora can't produce.
  */
class Round15Spec extends SparkSpec {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }

  /** Driver-side portable hash of an arbitrary salt string — the same
    * md5-prefix BigInt order `Tables.portableHash` gives the engine.
    */
  private def hs(s: String): BigInt =
    BigInt(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_))
      .mkString.take(15), 16)

  test("routed probes always include the vector's own assigned cell") {
    // IMI structural property: the two-level assignment is top-1 coarse /
    // top-1 fine, and the kNN probe set is top-2 coarse / top-2 fine —
    // a strict superset of the assignment decision, so every vector can
    // meet itself (and its bucket peers) in the candidate join.
    val probes = Similarity
      .ivf2ProbeIds(spark, sf001, operators.Neighbors.KnnCoarseNprobe,
        operators.Neighbors.KnnFinePerCell)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val asg = Similarity.ivf2AssignFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(asg.nonEmpty)
    asg.foreach { case (v, c) =>
      assert(probes.contains((v, c)), s"vector $v does not probe its own cell $c")
    }
  }

  test("salted sub-bucket split: independent partitions, bounded volume") {
    import spark.implicits._
    // Synthetic skew the gate corpora can't produce: ONE member set
    // co-occupying TWO buckets, all vectors identical (every candidate
    // passes the 0.40 verify), capB small enough to force ~19 sub-buckets.
    val n = 300
    val capB = 16
    val e = Seq(1.0) ++ Seq.fill(63)(0.0)
    val v = (1L to n.toLong).map(i => (i, e, 1.0)).toDF("vec_id", "e", "nrm")
    val probeIds = (1L to n.toLong).flatMap(i => Seq((i, 1L), (i, 2L)))
      .toDF("vec_id", "cent_id")
    val got = Dedup.subBucketPairs(v, probeIds, capB)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Driver replay of the salted split, per bucket.
    def subsOf(c: Long): Map[Long, Int] =
      (1L to n.toLong).sortBy(i => (hs(s"$c:$i"), i)).zipWithIndex
        .map { case (i, rk) => i -> rk / capB }.toMap
    val subs1 = subsOf(1L); val subs2 = subsOf(2L)
    val expected = (for {
      subs <- Seq(subs1, subs2)
      a <- 1L to n.toLong; b <- (a + 1) to n.toLong
      if subs(a) == subs(b)
    } yield (a, b)).toSet
    assert(got == expected)

    // Per-bucket salts make the two splits genuinely different orders —
    // under the retired global hash(vec_id) order both buckets would
    // partition identically and the second probe would retain nothing new.
    assert(subs1 != subs2, "bucket splits must differ under per-bucket salts")
    val only1 = (for (a <- 1L to n.toLong; b <- (a + 1) to n.toLong
                      if subs1(a) == subs1(b)) yield (a, b)).toSet
    assert(got.size > only1.size,
      "the second probed bucket must add retention beyond the first")

    // The budget bound: per bucket, pair volume <= occupancy * capB / 2
    // (each member pairs with at most capB-1 sub-bucket peers).
    assert(only1.size <= n * capB / 2)
  }

  test("kmeansStep == driver replay of the routed two-level assignment + update") {
    val v = Dedup.normedFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val cents = Similarity.centroidsMemoFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    // coarse prefix: the k1 smallest-hash cent_ids (ties -> min id),
    // carrying their own vectors
    val k1 = Similarity.coarseKFor(
      Similarity.centroidKFor(Similarity.corpusN(spark, sf001)))
    val coarse = cents.sortBy(c => (hs(c._1.toString), c._1)).take(k1)
    val cellOf = cents.map { c =>
      val co = coarse.maxBy(o =>
        (dot(c._2, o._2) / (c._3 * o._3), -o._1))._1
      c._1 -> co
    }.toMap
    val assign = v.map { case (id, e, nrm) =>
      val co = coarse.maxBy(o => (dot(e, o._2) / (nrm * o._3), -o._1))._1
      val cell = cents.filter(c => cellOf(c._1) == co)
      val best = cell.maxBy(c => (dot(e, c._2) / (nrm * c._3), -c._1))._1
      (id, best, e)
    }
    val expected = assign.groupBy(_._2).flatMap { case (cl, ms) =>
      (0 until 64).map { d =>
        val qs = ms.map(m => math.round(m._3(d) * 1000000.0))
        (cl, d.toLong, qs.sum / qs.length, ms.length.toLong)
      }
    }.toSet
    val got = Clustering.kmeansStep(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
  }

  test("lshCosine emits only true >= 0.45 pairs (budget is sound)") {
    val v = Dedup.normedFor(spark, sf001)
      .collect().map(r => r.getLong(0) -> (r.getSeq[Double](1).toArray, r.getDouble(2)))
      .toMap
    val pairs = Analytics.lshCosine(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, cos) =>
      val (ea, na) = v(a); val (eb, nb) = v(b)
      val exact = dot(ea, eb) / (na * nb)
      assert(exact >= 0.45 && math.abs(exact - cos) < 1e-9,
        s"pair ($a,$b) cos $cos vs exact $exact")
    }
  }

  test("single-level pair audit runs on the audit population at scale") {
    // sf1.0 is the first fixture where the stride is > 1 (20k vectors ->
    // s = 10); the driver gate (sf0.01, s = 1) cannot exercise this
    // branch, so CI pins it here: every endpoint of the audit baseline
    // is an audit-population member.
    val dir = "/root/repo/testdata_sf1.0"
    val n = Similarity.corpusN(spark, dir)
    val s = math.max(1L, (n + 1999L) / 2000L)
    assert(s > 1L, s"fixture too small to exercise the stride (n=$n)")
    val bad = Dedup.ivfSinglePairsFor(spark, dir)
      .where(col("vec_a") % s =!= 0 || col("vec_b") % s =!= 0)
      .count()
    assert(bad == 0L)
  }
}
