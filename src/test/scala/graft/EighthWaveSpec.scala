package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}
import graft.sources.Tables

/** Round-9 additions: the exact-rerank refine stage over widened PQ∘IVF
  * candidates, IVF-probed hard-negative mining, and DSIR-style hashed
  * importance selection. The DuckDB hash-equivalence lives in the driver
  * gate; these pin the operator-level invariants.
  */
class EighthWaveSpec extends SparkSpec {
  import spark.implicits._

  test("rerank emits exactly 5 per query, drawn from the wide candidates") {
    val rr = Similarity.rerankSearch(spark, sf0001).cache()
    val perQ = rr.groupBy("q_id").count().where(col("count") =!= 5).count()
    assert(perQ === 0L)
    val wide = Similarity.pqIvfWideFor(spark, sf0001).select("q_id", "n_id")
    val outside = rr.select("q_id", "n_id")
      .join(wide, Seq("q_id", "n_id"), "left_anti").count()
    assert(outside === 0L, "reranked rows must come from the ADC candidates")
    // exact-cos ordering within each query
    val inverted = rr.as("a").join(rr.as("b"),
        $"a.q_id" === $"b.q_id" && $"a.rk" === $"b.rk" - 1 &&
        $"a.cos" < $"b.cos").count()
    assert(inverted === 0L, "cos must be non-increasing in rk")
    rr.unpersist()
  }

  test("rerank recovers exactly the truth members present in the candidates") {
    // The reranked top-5 scores candidates by the same exact cosine that
    // defines the ground truth, so every truth member that survives
    // candidate generation MUST be picked (≤5 truth members exist and each
    // outranks every non-truth candidate). hits_rerank therefore equals
    // |truth ∩ wide-candidates| — and can never trail the raw ADC top-5.
    val truth = Similarity.annTopkFor(spark, sf0001).select("q_id", "n_id")
    val wide = Similarity.pqIvfWideFor(spark, sf0001).select("q_id", "n_id")
    val truthInWide =
      truth.join(wide, Seq("q_id", "n_id"), "left_semi").count()
    val r = Similarity.rerankRecall(spark, sf0001).head()
    val (hitsIvf, hitsRr) =
      (r.getAs[Long]("n_hits_ivf"), r.getAs[Long]("n_hits_rerank"))
    assert(hitsRr === truthInWide)
    assert(hitsRr >= hitsIvf,
      s"rerank hits $hitsRr must not trail raw ADC hits $hitsIvf")
  }

  test("hard negatives: different label, top-3, sampled queries only") {
    val hn = Similarity.hardNegatives(spark, sf0001).cache()
    assert(hn.where(col("q_label") === col("n_label")).count() === 0L)
    assert(hn.where(col("q_id") % 20 =!= 0).count() === 0L)
    assert(hn.where(col("rk") > 3 || col("rk") < 1).count() === 0L)
    val over = hn.groupBy("q_id").count().where(col("count") > 3).count()
    assert(over === 0L)
    assert(hn.where(abs(col("cos")) > 1.0000001).count() === 0L)
    // labels must be the corpus labels of the ids they annotate
    val lab = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id").as("n_id"), col("label").cast("long").as("lab"))
    val mislabeled = hn.join(lab, "n_id")
      .where(col("n_label") =!= col("lab")).count()
    assert(mislabeled === 0L)
    hn.unpersist()
  }

  test("DSIR selection enriches the target slice beyond its corpus share") {
    val sel = Curation.dsirSelect(spark, sf0001).cache()
    assert(sel.count() === 100L)
    // scores are positive and the emitted order is deterministic top-100
    assert(sel.where(col("score_pm") <= 0 || col("n_toks") <= 0).count() === 0L)
    val docs = Tables.load(spark, sf0001, "documents")
    val corpusEnPm = {
      val r = docs.agg(
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("en"),
        count(lit(1)).as("n")).head()
      r.getLong(0) * 1000 / r.getLong(1)
    }
    val selEnPm = sel.where(col("lang") === "en").count() * 1000 / 100
    assert(selEnPm > corpusEnPm,
      s"selection en share $selEnPm‰ must exceed corpus share $corpusEnPm‰")
    sel.unpersist()
  }

  test("DSIR scores are deterministic across rebuilds") {
    val a = Curation.dsirSelect(spark, sf0001)
      .select("doc_id", "score_pm").as[(Long, Long)].collect().sorted
    val b = Curation.dsirSelect(spark, sf0001)
      .select("doc_id", "score_pm").as[(Long, Long)].collect().sorted
    assert(a.sameElements(b))
  }

  test("streaming DSIR scorer == batch scores on replayed documents") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val corpus = Tables.load(spark, sf0001, "documents")
    val wts = Curation.dsirWeights(spark, corpus)
    val sample = corpus.where(col("doc_id") < 40)
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSeq
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, java.sql.Timestamp)]
    val out = graft.streaming.StreamingOps.dsirScoreStream(
      in.toDF().toDF("doc_id", "lang", "text", "event_time"), wts)
    val q = out.writeStream.format("memory").queryName("dsir_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = sample.splitAt(sample.size / 2)
      in.addData(b1.map(d => (d._1, d._2, d._3, new java.sql.Timestamp(1000L))))
      q.processAllAvailable()
      in.addData(b2.map(d => (d._1, d._2, d._3, new java.sql.Timestamp(2000L))))
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("dsir_out")
      .select("doc_id", "n_toks", "score_pm")
      .as[(Long, Long, Long)].collect().toSet
    val want = Curation.dsirScores(spark, sf0001)
      .where(col("doc_id") < 40)
      .select("doc_id", "n_toks", "score_pm")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  test("SemDeDup condemns at least one member of every near-dup pair") {
    val sd = Similarity // force object init order stability
    assert(sd != null)
    val verdicts = operators.Dedup.semDedup(spark, sf0001).cache()
    assert(verdicts.where(!col("verdict").isin("keep", "drop")).count() === 0L)
    assert(verdicts.where(abs(col("ccos")) > 1.0000001).count() === 0L)
    val pairs = operators.Dedup.dedupEmbedding(spark, sf0001)
      .select("vec_a", "vec_b")
    val dropped = verdicts.where(col("verdict") === "drop")
      .select(col("vec_id")).as[Long].collect().toSet
    val unresolved = pairs.as[(Long, Long)].collect()
      .count { case (a, b) => !dropped.contains(a) && !dropped.contains(b) }
    assert(unresolved === 0, "every pair needs at least one dropped member")
    // members == union of pair endpoints, exactly once each
    val members = pairs.select(col("vec_a").as("v"))
      .union(pairs.select(col("vec_b").as("v"))).distinct().count()
    assert(verdicts.count() === members)
    verdicts.unpersist()
  }

  test("count-min estimates never undercount and cover the exact top-20") {
    val cms = operators.TextAnalysis.cmsHitters(spark, sf0001).cache()
    assert(cms.count() === 20L)
    assert(cms.where(col("n_est") < col("n_exact")).count() === 0L,
      "CMS must never underestimate")
    assert(cms.where(col("over_permille") < 0).count() === 0L)
    cms.unpersist()
  }

  test("triplets: positive shares the anchor label, negative does not") {
    val t = Similarity.tripletMine(spark, sf0001).cache()
    assert(t.count() > 0)
    assert(t.select("q_id").distinct().count() === t.count())
    val lab = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("lab"))
    val badPos = t.join(lab.withColumnRenamed("vec_id", "pos_id"), "pos_id")
      .where(col("lab") =!= col("q_label")).count()
    val badNeg = t.join(lab.withColumnRenamed("vec_id", "neg_id"), "neg_id")
      .where(col("lab") === col("q_label")).count()
    assert(badPos === 0L && badNeg === 0L)
    // margin is exactly pos_cos − neg_cos, and the negative is the #1
    // hard negative — identical to q_hard_negatives rank 1
    assert(t.where(col("margin") =!= col("pos_cos") - col("neg_cos"))
      .count() === 0L)
    val hn1 = Similarity.hardNegatives(spark, sf0001)
      .where(col("rk") === 1).select(col("q_id"), col("n_id").as("neg_id"))
    assert(t.select("q_id", "neg_id").join(hn1, Seq("q_id", "neg_id"),
      "left_anti").count() === 0L)
    t.unpersist()
  }

  test("streaming CMS counters == batch sketch over the same tokens") {
    val sp = spark
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val toks = Tables.load(spark, sf0001, "documents")
      .where(col("doc_id") < 30)
      .select(explode(split(col("text"), " ")).as("w"))
      .as[String].collect().toSeq
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, java.sql.Timestamp)]
    val out = graft.streaming.StreamingOps.cmsStream(
      in.toDF().toDF("w", "event_time"))
    val q = out.writeStream.format("memory").queryName("cms_out")
      .outputMode("complete").start()
    try {
      val (b1, b2) = toks.splitAt(toks.size / 2)
      in.addData(b1.map(w => (w, new java.sql.Timestamp(1000L))))
      q.processAllAvailable()
      in.addData(b2.map(w => (w, new java.sql.Timestamp(2000L))))
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("cms_out").select("r", "b", "c")
      .as[(Long, Long, Long)].collect().toSet
    // batch sketch over the same token subset, same salted bucket expr
    val rowIds = array(
      (0 until operators.TextAnalysis.CmsD).map(lit): _*)
    val want = toks.toDF("w")
      .select(explode(rowIds).as("r"), col("w"))
      .select(col("r").cast("long").as("r"),
        operators.TextAnalysis.cmsBucket(col("r"), col("w")).as("b"))
      .groupBy("r", "b").agg(count(lit(1)).as("c"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
  }
}
