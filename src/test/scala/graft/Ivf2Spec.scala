package graft

import graft.operators.{Dedup, Neighbors, Similarity}

/** Structural invariants of the two-level coarse quantizer (IVF²) —
  * bit-exactness of the full search vs the replayed two-level decision is
  * pinned by the `q_ivf2_search` DuckDB oracle; these pin the pieces
  * against independent driver-Scala mechanisms.
  */
class Ivf2Spec extends SparkSpec {

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }

  test("coarse table is the hash-min prefix of the fine centroid table") {
    val v = Dedup.normedFor(spark, sf001)
    val k = Similarity.centroidKFor(v.count())
    val k1 = Similarity.coarseKFor(k)
    assert(k1 == math.max(8, math.ceil(math.sqrt(k.toDouble)).toInt))
    val coarse = Similarity.coarseMemoFor(spark, sf001).collect()
    assert(coarse.length == k1)
    // prefix property: re-rank the fine table by the same hash and the
    // first k1 ids must be exactly the coarse ids
    val cents = Similarity.centroidsMemoFor(spark, sf001)
      .collect().map(_.getLong(0))
    def hk(id: Long): BigInt =
      BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(8).map("%02x".format(_))
        .mkString.take(15), 16)
    val prefix = cents.sortBy(id => (hk(id), id)).take(k1).toSet
    assert(coarse.map(_.getLong(0)).toSet == prefix)
  }

  test("two-level assignment == brute-force coarse-then-fine argmax") {
    val v = Dedup.normedFor(spark, sf001)
    val cents = Similarity.centroidsMemoFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val coarse = Similarity.coarseMemoFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    def argmax(e: Array[Double], nrm: Double,
        pool: Seq[(Long, Array[Double], Double)]): Long = {
      var bestCos = Double.NegativeInfinity; var bestId = -1L
      pool.foreach { case (cid, ce, cn) =>
        val c = dot(e, ce) / (nrm * cn)
        if (c > bestCos) { bestCos = c; bestId = cid }
      }
      bestId
    }
    // fine -> coarse cell membership, then vector -> coarse -> fine-in-cell
    val cell = cents.map { case (cid, ce, cn) =>
      cid -> argmax(ce, cn, coarse.toSeq)
    }.toMap
    val expected = v.collect().map { r =>
      val (id, e, nrm) = (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2))
      val co = argmax(e, nrm, coarse.toSeq)
      id -> argmax(e, nrm, cents.filter(c => cell(c._1) == co).toSeq)
    }.toMap
    val got = Similarity.ivf2AssignFor(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == expected.size, "every vector assigned (no empty cell drop)")
    assert(got == expected)
  }

  test("ivf2 search: panel contract, bucket presence, top-5 window") {
    val out = Similarity.annIvf2(spark, sf001).collect()
    assert(out.nonEmpty)
    val step = Similarity.panelStep(
      Dedup.normedFor(spark, sf001).count())
    assert(out.forall(r => r.getLong(0) % step == 0), "panel stride")
    assert(out.forall(r => r.getLong(0) != r.getLong(1)), "self excluded")
    assert(out.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val rks = rows.map(_.getInt(3)).sorted.toSeq
      assert(rks.head == 1 && rks.length <= 5 &&
        rks == (1 to rks.length), s"rk run: $rks")
      // descending cos within a query, ties broken by n_id ascending
      val sorted = rows.sortBy(_.getInt(3))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getDouble(2) > b.getDouble(2) ||
            (a.getDouble(2) == b.getDouble(2) && a.getLong(1) < b.getLong(1)))
        case _ => ()
      }
    }
    // bucket presence: every returned neighbor is assigned to one of the
    // query's probed fine cells (recomputed independently)
    val asg = Similarity.ivf2AssignFor(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = Dedup.normedFor(spark, sf001)
    val cents = Similarity.centroidsMemoFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val coarse = Similarity.coarseMemoFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def top(e: Array[Double], nrm: Double,
        pool: Seq[(Long, Array[Double], Double)], n: Int): Seq[Long] =
      pool.map { case (cid, ce, cn) => (-(dot(e, ce) / (nrm * cn)), cid) }
        .sorted.take(n).map(_._2)
    val cell = cents.map { case (cid, ce, cn) =>
      cid -> top(ce, cn, coarse.toSeq, 1).head
    }.toMap
    val panelVecs = v.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .filter(_._1 % step == 0)
    val probed: Map[Long, Set[Long]] = panelVecs.map { case (id, e, nrm) =>
      val co = top(e, nrm, coarse.toSeq, 1).head
      id -> top(e, nrm, cents.filter(c => cell(c._1) == co).toSeq, 2).toSet
    }.toMap
    out.foreach { r =>
      assert(probed(r.getLong(0)).contains(asg(r.getLong(1))),
        s"neighbor ${r.getLong(1)} outside probed cells of ${r.getLong(0)}")
    }
  }

  test("ivf2 np2 search: probes top-2 coarse cells, dominates the np1 search") {
    val np1 = Similarity.annIvf2(spark, sf001).collect()
    val np2 = Similarity.annIvf2Np2(spark, sf001).collect()
    assert(np2.nonEmpty)
    // candidate superset ⇒ per-rank cosine dominance: np2's rank-k cosine
    // is ≥ np1's rank-k for every query that has k np1 results
    val byQ1 = np1.groupBy(_.getLong(0))
    val byQ2 = np2.groupBy(_.getLong(0))
    assert(byQ1.keySet.subsetOf(byQ2.keySet), "np2 must cover every np1 query")
    byQ1.foreach { case (q, rows1) =>
      val c1 = rows1.sortBy(_.getInt(3)).map(_.getDouble(2))
      val c2 = byQ2(q).sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(c2.length >= c1.length)
      c1.zip(c2).zipWithIndex.foreach { case ((a, b), k) =>
        assert(b >= a - 1e-12, s"query $q rank ${k + 1}: np2 cos $b < np1 $a")
      }
    }
    // bucket presence against an independently recomputed top-2-coarse,
    // top-2-fine-per-cell probe set
    val asg = Similarity.ivf2AssignFor(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = Dedup.normedFor(spark, sf001)
    val step = Similarity.panelStep(v.count())
    val cents = Similarity.centroidsMemoFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val coarse = Similarity.coarseMemoFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def top(e: Array[Double], nrm: Double,
        pool: Seq[(Long, Array[Double], Double)], n: Int): Seq[Long] =
      pool.map { case (cid, ce, cn) => (-(dot(e, ce) / (nrm * cn)), cid) }
        .sorted.take(n).map(_._2)
    val cell = cents.map { case (cid, ce, cn) =>
      cid -> top(ce, cn, coarse.toSeq, 1).head
    }.toMap
    val probed: Map[Long, Set[Long]] = v.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .filter(_._1 % step == 0)
      .map { case (id, e, nrm) =>
        val cos = top(e, nrm, coarse.toSeq, 2)
        id -> cos.flatMap(co =>
          top(e, nrm, cents.filter(c => cell(c._1) == co).toSeq, 2)).toSet
      }.toMap
    np2.foreach { r =>
      assert(probed(r.getLong(0)).contains(asg(r.getLong(1))),
        s"np2 neighbor ${r.getLong(1)} outside probed cells of ${r.getLong(0)}")
    }
  }

  test("routed production pairs: verified subset of exact truth, source-restricted") {
    val exact = Dedup.dedupEmbeddingExact(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val routed = Dedup.dedupEmbedding(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(routed.nonEmpty, "routed pair set must bite at sf0.01")
    // exact-cosine verification means zero false positives by construction
    assert(routed.subsetOf(exact), s"false positives: ${routed -- exact}")
    // every pair comes from one of the two candidate sources (round 17;
    // since round 18 the graph source is the refine rounds' full
    // scored-candidate survivor set): a shared two-level-probed cell, or
    // a pair the NN-descent rounds scored above threshold
    val probeIds = Similarity
      .ivf2ProbeIds(spark, sf001, Dedup.PairCoarseNprobe, Dedup.PairFinePerCell)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(1)).toSet }
    val graphPairs = Neighbors.knnScoredPairsFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val maxProbes = Dedup.PairCoarseNprobe * Dedup.PairFinePerCell
    routed.foreach { case (a, b) =>
      assert(probeIds(a).intersect(probeIds(b)).nonEmpty ||
          graphPairs.contains((a, b)),
        s"pair ($a,$b) shares no probed cell and was never graph-scored")
      assert(probeIds(a).size <= maxProbes,
        s"vector $a probed ${probeIds(a).size} cells")
    }
    // and the graph source genuinely contributes beyond the buckets at
    // this scale (the adoption is live, not vacuous)
    assert(routed.exists { case (a, b) =>
      probeIds(a).intersect(probeIds(b)).isEmpty })
  }

  test("ivf2 pair-recall audit row == independent set arithmetic") {
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ex = pairSet(Dedup.dedupEmbeddingExact(spark, sf001))
    val single = pairSet(Dedup.ivfSinglePairs(spark, sf001))
    val routed = pairSet(Dedup.dedupEmbedding(spark, sf001))
    val row = Dedup.ivf2PairRecall(spark, sf001).collect().head
    assert(row.getAs[Long]("n_exact") == ex.size.toLong)
    assert(row.getAs[Long]("n_single") == single.size.toLong)
    assert(row.getAs[Long]("n_routed") == routed.size.toLong)
    assert(row.getAs[Long]("n_held") == single.intersect(routed).size.toLong)
    assert(row.getAs[Long]("recall_single_permille") ==
      (if (ex.isEmpty) 1000L else ex.intersect(single).size.toLong * 1000 / ex.size))
    assert(row.getAs[Long]("recall_routed_permille") ==
      (if (ex.isEmpty) 1000L else ex.intersect(routed).size.toLong * 1000 / ex.size))
    assert(row.getAs[Long]("held_permille") ==
      (if (single.isEmpty) 1000L
       else single.intersect(routed).size.toLong * 1000 / single.size))
    // routed and single-level both verify with the exact cosine, so both
    // are subsets of the truth wherever the audit population covers them
    assert(ex.nonEmpty && single.nonEmpty && routed.nonEmpty)
  }
}
