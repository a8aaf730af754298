package graft

import graft.operators.{Dedup, Relational, Similarity, TextAnalysis}
import graft.sources.Tables

/** Brute-force Scala models for the sixth-wave operators: asymmetric
  * containment over the df-capped shingle index, SCD-2 interval compaction,
  * zone-map pruning stats, fixed-window chunking, and BPE pair counts — each
  * recomputed independently from the raw tables and compared row-for-row.
  */
class SixthWaveSpec extends SparkSpec {

  private def docsText: Map[Long, String] =
    Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def events: Seq[(Long, Long, String, Long)] =
    Tables.load(spark, sf001, "events")
      .selectExpr("event_id", "user_id", "event_type", "ts div 1000000")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("containment pairs == inverted-index Scala model (df cap, 90% of smaller set)") {
    val docs = docsText
    val perDoc = docs.map { case (id, t) =>
      val w = t.split(" ", -1)
      id -> (if (w.length < 3) Set.empty[String]
             else w.sliding(3).map(_.mkString(" ")).toSet)
    }
    // df-capped universe, as Dedup.dfCapped applies it
    val df = perDoc.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    val kept = df.filter(_._2 <= Dedup.ShingleDfCap).keySet
    val capped = perDoc.map { case (id, s) => id -> s.intersect(kept) }
    val model = (for {
      (a, sa) <- capped.toSeq; (b, sb) <- capped.toSeq
      if a < b
      inter = sa.intersect(sb).size.toLong
      if inter > 0
      nSmall = math.min(sa.size, sb.size).toLong
      if inter * 10 >= nSmall * 9
    } yield (a, b) -> ((inter, nSmall, inter * 1000 / nSmall))).toMap
    val got = Dedup.containmentPairs(spark, sf001).collect()
    assert(got.length == model.size, s"${got.length} vs ${model.size}")
    got.foreach { r =>
      val exp = model((r.getLong(0), r.getLong(1)))
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == exp,
        s"pair (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("scd2 == per-user changelog compaction model") {
    val byUser = events.groupBy(_._2)
    val model = byUser.toSeq.flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._4, e._1))
      val changes = ordered.zip(("" +: ordered.map(_._3)).zip(LazyList.from(0)))
        .collect { case (e, (prev, i)) if i == 0 || prev != e._3 => e }
      changes.zipAll(changes.drop(1).map(c => Some(c._4)), null, None)
        .collect { case (c, next) if c != null =>
          (uid, c._3, c._4, next.getOrElse(-1L),
            if (next.isEmpty) 1L else 0L) }
    }.toSet
    val got = Relational.qScd2(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == model, s"sizes got=${got.size} model=${model.size}")
  }

  test("zone-map stats: totals reconcile and verdicts match their counts") {
    val evs = events
    val t0 = evs.map(_._4).min
    val cut = t0 + 20L * 86400000L
    val got = Relational.qZonemapPrune(spark, sf001).collect()
    assert(got.map(_.getLong(1)).sum == evs.size)
    assert(got.map(_.getLong(4)).sum == evs.count(_._4 >= cut))
    got.foreach { r =>
      val (n, nMatch, verdict) = (r.getLong(1), r.getLong(4), r.getString(5))
      verdict match {
        case "skip"    => assert(nMatch == 0, s"zone ${r.getLong(0)}")
        case "full"    => assert(nMatch == n, s"zone ${r.getLong(0)}")
        case "partial" => assert(nMatch > 0 && nMatch < n, s"zone ${r.getLong(0)}")
      }
    }
    // the audit must demonstrate pruning: at least one non-partial zone
    assert(got.exists(r => r.getString(5) != "partial"))
  }

  test("chunking covers every word exactly and hashes are per-chunk-unique") {
    val docs = docsText
    val got = TextAnalysis.chunkDocs(spark, sf001).collect()
      .groupBy(_.getLong(0))
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, t) =>
      val w = t.split(" ", -1)
      val chunks = got(id).sortBy(_.getLong(1))
      // starts follow the stride; first chunk starts at word 1
      chunks.zipWithIndex.foreach { case (c, i) =>
        assert(c.getLong(1) == i)
        assert(c.getLong(2) == 1 + i * TextAnalysis.ChunkStride)
        assert(c.getLong(3) ==
          math.min(TextAnalysis.ChunkLen, w.length - (c.getLong(2) - 1)))
      }
      // full coverage: last chunk reaches the document end
      val last = chunks.last
      assert(last.getLong(2) - 1 + last.getLong(3) == w.length)
      // overlap windows genuinely overlap when more than one chunk exists
      if (chunks.length > 1)
        assert(TextAnalysis.ChunkStride < TextAnalysis.ChunkLen)
    }
  }

  test("bpe pairs == Scala sliding-window model (top 30)") {
    val model = docsText.values
      .flatMap(_.split(" ", -1)).filter(_.length >= 2)
      .flatMap(w => (0 until w.length - 1).map(i => w.substring(i, i + 2)))
      .groupBy(identity).map { case (p, o) => p -> o.size.toLong }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(30)
    val got = TextAnalysis.bpePairs(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == model)
  }

  test("bpe encode == Scala 8-round greedy merge model") {
    val words = docsText.values.flatMap(_.split(" ", -1)).toSeq
    val vocab = words.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    var st: Map[String, Vector[String]] =
      vocab.keys.map(w => w -> w.map(_.toString).toVector).toMap
    for (_ <- 1 to TextAnalysis.BpeMergeRounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, sy) <- st; i <- 0 until sy.length - 1)
        counts((sy(i), sy(i + 1))) =
          counts.getOrElse((sy(i), sy(i + 1)), 0L) + vocab(w)
      if (counts.nonEmpty) {
        val (pa, pb) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        // left-to-right non-overlapping application == literal replace
        st = st.map { case (w, sy) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i < sy.length - 1 && sy(i) == pa && sy(i + 1) == pb) {
              out += (pa + pb); i += 2
            } else { out += sy(i); i += 1 }
          }
          w -> out.result()
        }
      }
    }
    val wt = st.map { case (w, sy) => w -> sy.length.toLong }
    val model = docsText.map { case (id, t) =>
      val ws = t.split(" ", -1)
      id -> ((ws.length.toLong, ws.map(_.length.toLong).sum,
        ws.map(wt).sum))
    }
    val got = TextAnalysis.bpeEncode(spark, sf001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == model(r.getLong(0)),
        s"doc ${r.getLong(0)}")
    }
    // the learned merges must actually compress vs the char baseline
    assert(model.values.exists(m => m._3 < m._2))
  }

  test("pq recall (full + ivf-composed) is internally consistent and nontrivial") {
    val r = Similarity.pqRecall(spark, sf001).collect().head
    val (nq, nh, nhi) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (rec, reci) = (r.getLong(3), r.getLong(4))
    assert(nq > 0 && nh >= 0 && nh <= nq * 5)
    assert(nhi >= 0 && nhi <= nq * 5)
    assert(rec == nh * 1000 / (nq * 5))
    assert(reci == nhi * 1000 / (nq * 5))
    // 64×-compressed codes must retrieve far more than chance: random
    // guessing scores ~5/(N−1) ≈ 10 permille; observed 160 at sf0.01 on
    // near-random vectors (the adversarial case — real corpora cluster,
    // and production raises the 16-entry codebook to 256/subspace)
    assert(rec >= 100, s"recall_permille $rec")
    // the IVF-composed search scores ~nprobe/C of the corpus; on
    // near-random vectors the probe restriction costs recall but must
    // stay far above chance too
    assert(reci >= 50, s"recall_ivf_permille $reci")
  }

  test("trained PQ codebook: 8x<=16 shape, internally consistent recall audit") {
    val cb = Similarity.pqTrainedCodebookFor(spark, sf001).collect()
    // 8 subspaces, at most 16 codewords each (empty cells may drop), every
    // codeword an 8-dim vector
    val byM = cb.groupBy(_.getInt(1))
    assert(byM.keySet == (0 to 7).toSet)
    byM.values.foreach { rows =>
      assert(rows.length >= 2 && rows.length <= 16)
      rows.foreach(r => assert(r.getSeq[Double](2).length == 8))
    }
    // 4-way audit matrix: (n_queries, hits for seed/seed∘IVF/trained/
    // trained∘IVF, then the four permilles in the same order)
    val r = Similarity.pqRecallTrained(spark, sf001).collect().head
    val nq = r.getLong(0)
    val hitCols = (1 to 4).map(r.getLong)
    assert(nq > 0)
    hitCols.foreach(h => assert(h >= 0 && h <= nq * 5))
    (1 to 4).foreach { i =>
      assert(r.getLong(4 + i) == r.getLong(i) * 1000 / (nq * 5),
        s"permille column ${4 + i} inconsistent with hits column $i: $r")
    }
    // training must not collapse retrieval: trained recall stays above
    // chance (~10 permille); on near-random vectors it need not beat the
    // seed codebook, but all four cells are reported side by side
    assert(hitCols(2) * 1000 / (nq * 5) >= 50, s"trained recall collapsed: $r")
    assert(hitCols(3) * 1000 / (nq * 5) >= 50,
      s"trained-IVF recall collapsed: $r")
  }

  test("residual PQ: results in probed buckets, audit consistent, above chance") {
    import org.apache.spark.sql.functions._
    val got = Similarity.pqResSearch(spark, sf001)
    val v = operators.Dedup.normedFor(spark, sf001)
    val probes = Similarity.multiProbe(
        v.where(col("vec_id") % 20 === 0), Similarity.centroidsFor(v), nprobe = 2)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    val asg = Similarity.ivfAssignFor(spark, sf001)
      .select(col("vec_id").as("n_id"), col("cent_id"))
    val inProbed = got.join(asg, "n_id")
      .join(probes, Seq("q_id", "cent_id"), "left_semi")
    assert(inProbed.count() == got.count(), "neighbor outside probed buckets")
    val r = Similarity.pqResRecall(spark, sf001).collect().head
    val (nq, ni, nr) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nq > 0 && ni <= nq * 5 && nr <= nq * 5)
    assert(r.getLong(3) == ni * 1000 / (nq * 5))
    assert(r.getLong(4) == nr * 1000 / (nq * 5))
    // residual encoding is corpus-dependent (hurts on near-random vectors,
    // helps on clustered ones) — pin only "far above the ~10 permille
    // chance floor"; the audit's job is reporting the tradeoff, not
    // winning it on the adversarial fixture
    assert(nr * 1000 / (nq * 5) >= 50, s"residual recall collapsed: $r")
  }

  test("pq-ivf search: results live in the query's probed buckets, ranks contiguous") {
    import org.apache.spark.sql.functions._
    val got = Similarity.pqIvfSearch(spark, sf001)
    // every returned neighbor is assigned to one of the query's nprobe=2
    // probed centroids — the defining property of the composition
    val v = operators.Dedup.normedFor(spark, sf001)
    val probes = Similarity.multiProbe(
        v.where(col("vec_id") % 20 === 0), Similarity.centroidsFor(v), nprobe = 2)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    val asg = Similarity.ivfAssignFor(spark, sf001)
      .select(col("vec_id").as("n_id"), col("cent_id"))
    val inProbed = got.join(asg, "n_id")
      .join(probes, Seq("q_id", "cent_id"), "left_semi")
    assert(inProbed.count() == got.count(), "neighbor outside probed buckets")
    // per-query: ranks are 1..k contiguous, ADC nondecreasing
    val rows = got.orderBy("q_id", "rk").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to sorted.length))
      assert(sorted.map(_.getLong(2)).toSeq == sorted.map(_.getLong(2)).sorted.toSeq)
      assert(sorted.length <= 5)
    }
    assert(rows.nonEmpty)
  }
}
