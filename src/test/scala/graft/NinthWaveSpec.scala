package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Ninth-wave operators: the kNN graph build, kNN-classifier pseudo-
  * labeling, and the retrieval/substring additions of this round.
  */
class NinthWaveSpec extends SparkSpec {
  import spark.implicits._

  test("knn graph: one row per vector, degrees bounded and consistent") {
    val g = Neighbors.knnGraph(spark, sf0001).cache()
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(g.count() === n, "every vector must appear in the graph")
    assert(g.select("vec_id").distinct().count() === n)
    val bad = g.where(col("out_deg") > Neighbors.GraphK ||
      col("mutual_deg") > col("out_deg") || col("out_deg") < 1).count()
    assert(bad === 0L, "0 < out_deg <= K and mutual_deg <= out_deg")
  }

  test("knn graph: top1 edge is mutual iff reversed edge exists") {
    val e = Neighbors.knnEdgesFor(spark, sf0001).cache()
    // rk is dense 1..out_deg per src
    val rkBad = e.groupBy("src")
      .agg(count(lit(1)).as("n"), max(col("rk")).as("mx"), min(col("rk")).as("mn"))
      .where(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(rkBad === 0L, "rk must be dense from 1")
    // no self-edges, no duplicate (src, dst)
    assert(e.where($"src" === $"dst").count() === 0L)
    assert(e.groupBy("src", "dst").count().where($"count" > 1).count() === 0L)
  }

  test("label prop: per-label rows, counts consistent, full coverage") {
    val lp = Neighbors.labelProp(spark, sf0001).cache()
    val labels = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("label").cast("long")).distinct().count()
    assert(lp.count() === labels)
    val bad = lp.where(col("n_correct") > col("n_pred") ||
      col("n_pred") > col("n_test") ||
      col("acc_permille") =!= expr("n_correct * 1000 div n_test")).count()
    assert(bad === 0L)
    // every held-out vector must receive a prediction: a nprobe=2 probe
    // over 64 buckets always finds labeled candidates on this corpus, so
    // n_pred < n_test would mean the candidate join dropped queries.
    // (Accuracy itself is a READOUT here, not an invariant — the synthetic
    // labels are independent of the embedding geometry, so the honest
    // measured accuracy sits at the 1/labels chance rate; the oracle
    // hash-match is what pins the vote arithmetic.)
    val totals = lp.agg(sum("n_pred"), sum("n_test")).as[(Long, Long)].head()
    assert(totals._1 === totals._2, "all test vectors must be predicted")
  }

  test("dup spans: geometry invariants hold for every document") {
    val ds = Corpus.dupSpans(spark, sf0001).cache()
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(ds.count() === n, "roster-preserving: one row per document")
    val bad = ds.where(
      col("covered_tokens") > col("n_words") ||
        col("n_islands") > col("n_dup_grams") ||
        (col("n_dup_grams") > 0 && col("covered_tokens") < Corpus.SpanGram) ||
        (col("n_dup_grams") === 0 &&
          (col("covered_tokens") =!= 0 || col("n_islands") =!= 0)) ||
        col("dup_permille") > 1000 ||
        (col("n_words") < Corpus.SpanGram && col("n_dup_grams") =!= 0)).count()
    assert(bad === 0L)
    // islands of 8-word windows cover at least 8 tokens each, at most
    // n_dup_grams + 7 in total per island chain
    val geom = ds.where(col("n_dup_grams") > 0 &&
      (col("covered_tokens") < col("n_islands") * Corpus.SpanGram ||
        col("covered_tokens") > col("n_dup_grams") +
          col("n_islands") * (Corpus.SpanGram - 1))).count()
    assert(geom === 0L, "covered in [8*islands, dup_grams + 7*islands]")
    // the corpus genuinely contains repeated spans (doc 0 is fully
    // duplicated boilerplate at sf0.001) — the operator must find some
    assert(ds.agg(sum("n_dup_grams")).as[Long].head() > 0L)
  }

  test("knn clusters: partition of the corpus labeled by component minimum") {
    val kc = Neighbors.knnClusters(spark, sf0001).cache()
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(kc.count() === n)
    // cluster_id is the component minimum: it equals min(vec_id) within
    // its cluster, and sizes are consistent
    val byCluster = kc.groupBy("cluster_id")
      .agg(min(col("vec_id")).as("mn"), count(lit(1)).as("n"),
        min(col("cluster_size")).as("sz0"), max(col("cluster_size")).as("sz1"))
    assert(byCluster.where(col("mn") =!= col("cluster_id") ||
      col("sz0") =!= col("n") || col("sz1") =!= col("n")).count() === 0L)
    // clusters only merge MUTUAL edges: every non-singleton member pair is
    // connected through the mutual subgraph, so a cluster can never exceed
    // the mutual-edge endpoint set
    val e = Neighbors.knnEdgesFor(spark, sf0001).select("src", "dst")
    val mutual = e.intersect(e.select(col("dst").as("src"), col("src").as("dst")))
    val endpoints = mutual.select(col("src").as("v")).distinct()
    val nonSingleton = kc.where(col("cluster_size") > 1)
      .select(col("vec_id").as("v"))
    assert(nonSingleton.join(endpoints, Seq("v"), "left_anti").count() === 0L,
      "non-singleton members must touch a mutual edge")
    kc.unpersist()
  }

  test("pca power: unit principal axis, positive spectrum share") {
    val p = Similarity.pcaPower(spark, sf0001).cache()
    assert(p.count() === 64L)
    assert(p.select("dim").as[Long].collect().toSeq === (0L until 64L))
    // eigenvector is unit-norm: sum of squared micro coordinates ≈ 1e12
    // (floor-quantization drifts each coordinate by < 1 micro either way,
    // so norm² moves by at most ~2·Σ|v_i|·1e6 + 64 ≈ 2e8)
    val n2 = p.select((col("eig_micros") * col("eig_micros")).as("s"))
      .agg(sum("s")).as[Long].head()
    assert(n2 < 1000200000000L && n2 > 999800000000L, s"norm²=$n2")
    // λ₁ positive; explained share in (0, 1000]; constant across rows
    val bad = p.where(col("lambda_floor") <= 0 ||
      col("ev_permille") <= 0 || col("ev_permille") > 1000).count()
    assert(bad === 0L)
    assert(p.select("lambda_floor", "ev_permille").distinct().count() === 1L)
    p.unpersist()
  }

  test("whiten check: removing the principal axis never raises anisotropy") {
    val w = Similarity.whitenCheck(spark, sf0001).cache()
    assert(w.count() === 2L)
    val rows = w.orderBy("stage")
      .select("stage", "n_vecs", "sum_sq", "mu_sq", "aniso_permille")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq("raw", "whitened"))
    val Array(raw, wh) = rows
    assert(raw._2 === wh._2, "same vector count in both stages")
    assert(raw._3 > 0 && wh._3 > 0 && raw._4 >= 0 && wh._4 >= 0)
    // projection removal cannot increase total energy, and the anisotropy
    // ratio must not rise (the removed direction carries >= its share of
    // the mean): compare exact rationals mu/(n*sum) without integer-div
    // loss
    assert(wh._3 <= raw._3, "energy can only shrink")
    // ‖μ'‖² = ‖μ‖² − (v·μ)² ≤ ‖μ‖² exactly in the reals; re-quantization
    // adds noise orders below the gap on this corpus (pinned by the
    // driver oracle either way)
    assert(wh._4 <= raw._4, s"mean mass must not grow: raw=$raw wh=$wh")
    w.unpersist()
  }

  test("bm25: exactly 10 ranked docs, hit counts bounded by query size") {
    val r = Analytics.bm25Search(spark, sf0001).cache()
    assert(r.count() === 10L)
    assert(r.select("rk").as[Long].collect().toSeq === (1L to 10L))
    val bad = r.where(col("n_hit_terms") < 1 || col("n_hit_terms") > 5 ||
      col("score_milli") <= 0).count()
    assert(bad === 0L)
    // scores non-increasing in rank
    val inv = r.as("a").join(r.as("b"),
      col("a.rk") === col("b.rk") - 1 &&
        col("a.score_milli") < col("b.score_milli")).count()
    assert(inv === 0L)
  }

  test("cluster canon: exactly one canonical per cluster, the longest") {
    val cc = Curation.clusterCanon(spark, sf0001).cache()
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(cc.count() === n)
    // one canonical per cluster, and it is a member of the cluster
    val perCluster = cc.groupBy("cluster_id")
      .agg(sum("is_canon").as("nc"), count(lit(1)).as("sz0"),
        min("cluster_size").as("sz1"))
    assert(perCluster.where(col("nc") =!= 1 || col("sz0") =!= col("sz1"))
      .count() === 0L)
    // no member is longer than its canonical (ties broken by smaller id)
    val canonLen = cc.where(col("is_canon") === 1)
      .select(col("cluster_id"), col("n_chars").as("canon_chars"),
        col("doc_id").as("cdoc"))
    val bad = cc.join(canonLen, "cluster_id")
      .where(col("n_chars") > col("canon_chars") ||
        (col("n_chars") === col("canon_chars") && col("doc_id") < col("cdoc")))
      .count()
    assert(bad === 0L, "canonical must be the keep-longest winner")
    cc.unpersist()
  }

  test("curriculum: 4 phases partition the corpus with ordered bands") {
    val cu = Curation.curriculum(spark, sf0001).cache()
    assert(cu.select("phase").as[Long].collect().toSeq === Seq(0L, 1L, 2L, 3L))
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(cu.agg(sum("n_docs")).as[Long].head() === n)
    // equal-rank cut: phase sizes differ by at most 1... (n div 4 granularity)
    val sizes = cu.select("n_docs").as[Long].collect()
    assert(sizes.max - sizes.min <= 1L, sizes.mkString(","))
    // difficulty bands are non-overlapping and ascending across phases
    val rows = cu.orderBy("phase").select("min_dp", "max_dp")
      .as[(Long, Long)].collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._1, s"bands must ascend: $a then $b")
      case _ => ()
    }
    cu.unpersist()
  }

  test("ann mrr: bounded by hits, hits bounded by queries") {
    val m = Similarity.annMrr(spark, sf0001).cache()
    assert(m.count() === 1L)
    val r = m.select("n_queries", "hits_ivf", "mrr_ivf_milli", "hits_km",
      "mrr_km_milli").as[(Long, Long, Long, Long, Long)].head()
    assert(r._1 > 0)
    // each hit contributes (200, 1000] milli-RR; misses contribute 0
    for ((hits, mrr) <- Seq((r._2, r._3), (r._4, r._5))) {
      assert(hits <= r._1)
      assert(mrr * r._1 <= hits * 1000, s"mrr too high: $r")
      // integer-div floor loses < n_queries milli in total
      assert(hits === 0 || mrr * r._1 + r._1 > hits * 200, s"mrr too low: $r")
    }
    m.unpersist()
  }

  test("bpe fertility: per-lang sums reconcile with the per-doc encoding") {
    val f = TextAnalysis.bpeFertility(spark, sf0001).cache()
    val enc = TextAnalysis.bpeEncode(spark, sf0001)
      .join(spark.read.parquet(s"$sf0001/documents.parquet")
        .select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(sum("n_bpe_tokens").as("b"), sum("n_words").as("w"))
    val joined = f.join(enc, "lang")
      .where(col("sum_bpe") =!= col("b") || col("sum_words") =!= col("w"))
    assert(joined.count() === 0L)
    // BPE always emits >= 1 and <= word-length tokens per word
    val bad = f.where(col("fertility_permille") < 1000 ||
      col("sum_bpe") > col("sum_chars")).count()
    assert(bad === 0L)
    f.unpersist()
  }

  test("quality calib: deciles partition fluency coverage, bands ascend") {
    val c = TextAnalysis.qualityCalib(spark, sf0001).cache()
    assert(c.select("decile").as[Long].collect().toSeq === (0L to 9L))
    val flu = TextAnalysis.docFluency(spark, sf0001).count()
    assert(c.agg(sum("n_docs")).as[Long].head() === flu)
    val bad = c.where(col("n_keep") > col("n_docs") ||
      col("min_score") > col("max_score") ||
      col("keep_permille") =!= expr("n_keep * 1000 div n_docs")).count()
    assert(bad === 0L)
    val rows = c.orderBy("decile").select("min_score", "max_score")
      .as[(Long, Long)].collect()
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._1, s"bands must ascend: $a $b")
      case _ => ()
    }
    c.unpersist()
  }

  test("dataset card: shares sum to ~1000, rates bounded, roster complete") {
    val dc = Corpus.datasetCard(spark, sf0001).cache()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(dc.count() === docs.select("source").distinct().count())
    assert(dc.agg(sum("n_docs")).as[Long].head() === docs.count())
    // integer-floored shares sum to 1000 - (sources-1)..1000
    val share = dc.agg(sum("token_share_permille")).as[Long].head()
    assert(share <= 1000 && share > 1000 - dc.count())
    val bad = dc.where(col("quality_keep_permille") > 1000 ||
      col("dup_member_permille") > 1000 || col("n_langs") < 1).count()
    assert(bad === 0L)
    dc.unpersist()
  }

  test("chunk embed: every chunk assigned, centroids self-assign perfectly") {
    val ce = TextAnalysis.chunkEmbedIndex(spark, sf0001).cache()
    val chunks = TextAnalysis.chunkDocs(spark, sf0001).count()
    assert(ce.count() === chunks, "every chunk must get an assignment")
    assert(ce.select("cid").distinct().count() === chunks)
    // a centroid chunk's best match is itself (cos = 1, the maximum),
    // so every cent_id must appear self-assigned with dot == n2q
    val selfRows = ce.where(col("cid") === col("cent_id"))
    assert(selfRows.count() === TextAnalysis.FhCentroids.toLong)
    assert(selfRows.where(col("dot") =!= col("n2q")).count() === 0L)
    // dots bounded by Cauchy-Schwarz: dot^2 <= n2q * n2c is implied by
    // construction; here check the cheap invariant n2q > 0
    assert(ce.where(col("n2q") <= 0).count() === 0L)
    ce.unpersist()
  }

  test("shard manifest: contiguous non-overlapping ranges cover the corpus") {
    val m = Curation.shardManifest(spark, sf0001).cache()
    assert(m.count() === 16L)
    val n = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(m.agg(sum("n_docs")).as[Long].head() === n)
    // each shard's position range is exactly its doc count (contiguous)
    assert(m.where(col("max_pos") - col("min_pos") + 1 =!= col("n_docs"))
      .count() === 0L)
    // ranges chain: shard k+1 starts right after shard k ends
    val rows = m.orderBy("shard").select("min_pos", "max_pos")
      .as[(Long, Long)].collect()
    assert(rows.head._1 === 1L && rows.last._2 === n)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._1 === a._2 + 1, s"gap between $a and $b")
      case _ => ()
    }
    // checksums are within the modulus
    assert(m.where(col("checksum") < 0 || col("checksum") >= 1000003L)
      .count() === 0L)
    m.unpersist()
  }

  test("composed curation funnel stream: survivors == batch composition") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    // planted-PII corpus so the scrub stage has real work to do
    val dirty = operators.Scrub.dirtyText(spark, sf0001)
      .select(col("doc_id"), col("dirty").as("text"))
      .as[(Long, String)].collect().toSeq
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val merges = operators.TextAnalysis.bpeMergesFor(spark, sf0001)
    val out = graft.streaming.StreamingOps.curationFunnelStream(
      in.toDF().toDF("doc_id", "text", "event_time"), merges)
    val q = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = dirty.splitAt(dirty.size / 2)
      in.addData(b1.map(d => (d._1, d._2, new java.sql.Timestamp(1000L))))
      q.processAllAvailable()
      in.addData(b2.map(d => (d._1, d._2, new java.sql.Timestamp(2000L))))
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("funnel_out").cache()
    // batch composition over the same stage functions on a static frame:
    // gate -> scrub -> distinct clean-content set
    val batchDf = operators.Scrub.dirtyText(spark, sf0001)
      .select(col("doc_id"), col("dirty").as("text"),
        lit(new java.sql.Timestamp(0L)).as("event_time"))
    val expectMd5 = graft.streaming.StreamingOps
      .qualityGateStream(batchDf, carry = Seq("text"))
      .where(col("keep") === 1)
      .select(md5(operators.Scrub.scrubbed(col("text"))).as("m"))
      .distinct().as[String].collect().toSet
    val gotMd5 = got.select("content_md5").as[String].collect()
    assert(gotMd5.toSet === expectMd5, "surviving clean-content set")
    assert(gotMd5.length === gotMd5.toSet.size, "no duplicate survivors")
    // routing is the documented per-row hash of the winner's doc_id
    val badShard = got.where(col("shard") =!=
      pmod(graft.sources.Tables.portableHash(
        concat(lit("order:r8:"), col("doc_id").cast("string"))), lit(16L)))
      .count()
    assert(badShard === 0L)
    // the planted PII was actually scrubbed and counted
    assert(got.agg(sum("n_pii")).as[Long].head() > 0L)
    // routed shards carry n_tokens: the stream's in-row BPE fold over the
    // CLEAN text must equal the same fold evaluated in batch over each
    // surviving clean-content string (keyed by content_md5 — winner
    // identity is arrival-order, so the doc_id may differ)
    val msRow = merges.agg(array_sort(
      collect_list(struct(col("ord"), col("pat"), col("rep")))).as("ms"))
    val wantTok = graft.streaming.StreamingOps
      .qualityGateStream(batchDf, carry = Seq("text"))
      .where(col("keep") === 1)
      .select(operators.Scrub.scrubbed(col("text")).as("text"))
      .distinct()
      .crossJoin(broadcast(msRow))
      .select(md5(col("text")).as("m"),
        operators.TextAnalysis.bpeTokenCountExpr("text", "ms").as("nt"))
      .as[(String, Long)].collect().toMap
    val gotTok = got.select("content_md5", "n_tokens")
      .as[(String, Long)].collect().toMap
    assert(gotTok === wantTok, "per-survivor BPE token counts")
    assert(gotTok.values.forall(_ > 0L), "every survivor carries tokens")
    got.unpersist()
  }

  test("BPE fold expr == vocab-join token counts on the raw corpus") {
    // the in-row merge-replay fold (what the funnel ships) must reproduce
    // bpeEncode's n_bpe_tokens — the vocab-JOIN mechanism — per document
    val merges = operators.TextAnalysis.bpeMergesFor(spark, sf0001)
    val msRow = merges.agg(array_sort(
      collect_list(struct(col("ord"), col("pat"), col("rep")))).as("ms"))
    val gotDf = graft.sources.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text")
      .crossJoin(broadcast(msRow))
      .select(col("doc_id"),
        operators.TextAnalysis.bpeTokenCountExpr("text", "ms").as("nt"))
    val got = gotDf.as[(Long, Long)].collect().toMap
    val want = operators.TextAnalysis.bpeEncode(spark, sf0001)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect().toMap
    assert(got === want)
    // the merge table is the full 8-round model, in application order
    assert(merges.select("ord").as[Long].collect().sorted.toSeq ===
      (1L to operators.TextAnalysis.BpeMergeRounds.toLong))
  }

  test("chunk assign stream: bucket-overlap candidate contract") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    // recompute the engine's fh/fs hashes JVM-side to craft words with
    // known buckets and signs (independent mechanism: MessageDigest)
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def bucket(w: String): Long = h60(s"fh:$w") % TextAnalysis.FhDims
    def sign(w: String): Long = if (h60(s"fs:$w") % 2 == 1) 1L else -1L
    val words = (1 to 400).map(i => s"w$i")
    // centroid 1 lives ONLY in bucket bA; a negative-sign word hits bA
    val wNeg = words.find(w => sign(w) == -1L).get
    val bA = bucket(wNeg)
    val wOther = words.filter(w => bucket(w) != bA).take(5)
    val cf = Seq((1L, bA, 1L)).toDF("cent_id", "b", "cv")
    val n2c = Seq((1L, 1L)).toDF("cent_id", "n2c")
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.StreamingOps.chunkAssignStream(
      in.toDF().toDF("doc_id", "text", "event_time"), cf, n2c)
    val q = out.writeStream.format("memory").queryName("chunk_contract")
      .outputMode("append").start()
    try {
      in.addData(
        // doc 1: no word touches bucket bA -> overlaps NO centroid ->
        // must be ABSENT (the batch inner join on b drops it)
        (1L, wOther.mkString(" "), new java.sql.Timestamp(1000L)),
        // doc 2: hits bA with net NEGATIVE dot -> centroid 1 is the only
        // candidate and must win DESPITE cos < 0 (a cos-0 non-candidate
        // may not outrank it)
        (2L, wNeg, new java.sql.Timestamp(1000L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("chunk_contract")
      .select("doc_id", "cent_id", "dot").as[(Long, Long, Long)].collect()
    assert(!got.exists(_._1 == 1L), "no-overlap chunk must be dropped")
    assert(got.collect { case (2L, c, d) => (c, d) }.toSeq ===
      Seq((1L, -1L)), "negative-cos overlapping centroid must be chosen")
  }

  test("dedup agreement: 3 method pairs, overlaps bounded by set sizes") {
    val ag = operators.Dedup.dedupAgreement(spark, sf0001).cache()
    assert(ag.count() === 3L)
    val bad = ag.where(col("n_common") > least(col("n_a"), col("n_b")) ||
      col("jaccard_permille") > 1000 ||
      col("method_a") >= col("method_b")).count()
    assert(bad === 0L)
    // the planted near-dup corpus must produce non-empty pair sets for
    // every method (otherwise the agreement matrix is vacuous)
    assert(ag.where(col("n_a") === 0 || col("n_b") === 0).count() === 0L)
    ag.unpersist()
  }

  test("streaming debounce leaders == batch burst-leader rule") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val ev = graft.sources.Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        graft.sources.Tables.epochMs.as("tms"))
      .as[(Long, String, Long, Long)].collect().toSeq
      .sortBy(e => (e._4, e._3))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long, java.sql.Timestamp)]
    val out = graft.streaming.StreamingOps.debounceStream(
      in.toDF().toDF("user_id", "event_type", "event_id", "event_time"))
    val q = out.writeStream.format("memory").queryName("deb_out")
      .outputMode("append").start()
    try {
      in.addData(ev.map(e =>
        (e._1, e._2, e._3, new java.sql.Timestamp(e._4))))
      q.processAllAvailable()
      // advance the watermark far past every burst so all sessions close
      in.addData((0L, "zz_flush", -1L,
        new java.sql.Timestamp(ev.map(_._4).max + 10L * 600000L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("deb_out").where(col("event_type") =!= "zz_flush")
      .select("lead_event_id").as[Long].collect().toSet
    // batch burst leaders: gap >= 60000 (or first) per (user, type)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("tms"), col("event_id"))
    val want = graft.sources.Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        graft.sources.Tables.epochMs.as("tms"))
      .withColumn("gap", col("tms") - lag(col("tms"), 1).over(w))
      .where(col("gap").isNull || col("gap") >= 60000L)
      .select("event_id").as[Long].collect().toSet
    assert(got === want)
  }

  test("streaming chunk assign == batch embed+index on replayed docs") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val (cf, n2c) = TextAnalysis.chunkCentIndexFor(spark, sf0001)
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.StreamingOps.chunkAssignStream(
      in.toDF().toDF("doc_id", "text", "event_time"), cf, n2c)
    val q = out.writeStream.format("memory").queryName("chunk_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      in.addData(b1.map(d => (d._1, d._2, new java.sql.Timestamp(1000L))))
      q.processAllAvailable()
      in.addData(b2.map(d => (d._1, d._2, new java.sql.Timestamp(2000L))))
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("chunk_out")
      .select("doc_id", "chunk_idx", "cid", "cent_id", "dot", "n2q")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val want = TextAnalysis.chunkEmbedIndex(spark, sf0001)
      .select("doc_id", "chunk_idx", "cid", "cent_id", "dot", "n2q")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("streaming BM25 scorer == batch scored relation on replayed docs") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val (qt, tot) = Analytics.bm25StatsFor(spark, sf0001)
    val docs = graft.sources.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingOps.bm25ScoreStream(
      in.toDF().toDF("doc_id", "text"), qt, tot)
    val q = out.writeStream.format("memory").queryName("bm25_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("bm25_out").where(col("n_hit_terms") > 0)
      .select("doc_id", "n_hit_terms", "score_milli")
      .as[(Long, Long, Long)].collect().toSet
    val want = Analytics.bm25ScoredFor(spark, sf0001)
      .select("doc_id", "n_hit_terms", "score_milli")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    // zero-hit docs pass through (roster-preserving serving path)
    assert(sp.table("bm25_out").count() === docs.size.toLong)
  }
}
