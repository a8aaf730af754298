package graft

import graft.operators.{Curation, Dedup}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Curation operators vs independent in-memory models on sf0.001 (the
  * DuckDB oracle pins cross-engine equality at sf0.01; these pin semantics).
  */
class CurationSpec extends SparkSpec {

  test("split assignment is a pure function of doc_id with the declared ratios") {
    val rows = Curation.splitAssign(spark, sf0001).collect()
    val docs = Tables.load(spark, sf0001, "documents").count()
    assert(rows.length == docs)
    rows.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      val split = r.getAs[String]("split")
      assert(bucket >= 0 && bucket < 100)
      val expected = if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
      assert(split == expected, s"doc ${r.get(0)}: bucket $bucket -> $split")
    }
    // determinism: a second run assigns identically
    val again = Curation.splitAssign(spark, sf0001).collect()
    assert(rows.map(_.toSeq.toList).toList == again.map(_.toSeq.toList).toList)
  }

  test("stratified sample counts equal the per-doc hash-threshold test") {
    val perDoc = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"),
        (Tables.portableHash(concat(lit("samp:"), col("doc_id").cast("string")))
          % 1000).as("h"))
      .collect()
      .map(r => (r.getString(1), r.getLong(2)))
    val expected = perDoc.groupBy(_._1).map { case (src, xs) =>
      val thr = src match { case "src0" => 500L; case "src1" => 250L; case _ => 100L }
      (src, thr, xs.length.toLong, xs.count(_._2 < thr).toLong)
    }.toSet
    val got = Curation.stratifiedSample(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("decontamination flags exactly the docs sharing a shingle with the benchmark") {
    val sh = Dedup.shinglesHashedFor(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val benchIds = sh.map(_._1).distinct.filter(_ % 37 == 0).toSet
    val benchH = sh.filter(t => t._1 % 37 == 0).map(_._2).toSet
    val contaminated = sh.filter(t => t._1 % 37 != 0 && benchH(t._2)).map(_._1).toSet
    val rows = Curation.decontaminate(spark, sf0001).collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert((r.getLong(1) == 1L) == (id % 37 == 0))
      assert((r.getLong(2) == 1L) == contaminated(id), s"doc $id contaminated flag")
      assert((r.getLong(3) == 1L) == (id % 37 != 0 && !contaminated(id)))
    }
    // at least one contaminated doc exists in the fixture (else the test is vacuous)
    assert(contaminated.nonEmpty || benchIds.isEmpty)
  }

  test("cluster labels are the connected-component minimum of the pair graph") {
    val pairs = Dedup.dedupNgram(spark, sf0001).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // brute-force union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val allDocs = Tables.load(spark, sf0001, "documents").select("doc_id")
      .collect().map(_.getLong(0))
    val expectedLabel = allDocs.map(d => d -> find(d)).toMap
    // find() roots are always the component minimum because union always
    // points the larger root at the smaller one
    val got = Curation.dedupClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == allDocs.length)
    val sizes = expectedLabel.values.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    got.foreach { case (doc, cluster, size) =>
      assert(cluster == expectedLabel(doc), s"doc $doc cluster")
      assert(size == sizes(cluster), s"doc $doc cluster size")
    }
    // the fixture must actually exercise a multi-doc cluster
    assert(got.exists(_._3 > 1), "no non-singleton cluster in fixture")
  }

  test("trace depth satisfies the longest-path invariant on every strict edge") {
    val iv = Tables.msgs(spark, sf0001)
      .select("id", "start_at_ms", "end_at_ms").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val strict = graft.operators.ChainLink.linkPairs(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (p, c) => iv(p) != iv(c) }
    val depth = graft.operators.ChainLink.traceDepth(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // longest-path: every child is at least one deeper than EACH parent,
    // and exactly one deeper than SOME parent
    strict.foreach { case (p, c) =>
      assert(depth(c) >= depth(p) + 1, s"edge $p->$c: ${depth(p)} ${depth(c)}")
    }
    val parentsOf = strict.groupBy(_._2)
    parentsOf.foreach { case (c, es) =>
      assert(es.exists { case (p, _) => depth(c) == depth(p) + 1 },
        s"$c depth ${depth(c)} not tight")
    }
    // sf0.001's strict graph is shallow (depth 1); non-vacuity = edges exist
    assert(strict.nonEmpty && depth.values.max >= 1)
  }

  test("salted distinct count equals plain countDistinct") {
    val plain = Tables.load(spark, sf0001, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = graft.operators.Relational.qSkewDistinct(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("weighted sample: size-biased, deterministic, group-limited plan") {
    val got = Curation.weightedSample(spark, sf0001).collect()
    val bySrc = got.groupBy(_.getString(0))
    bySrc.foreach { case (src, rows) =>
      assert(rows.length <= 5, src)
      assert(rows.map(_.getLong(1)).sorted.sameElements(
        (1L to rows.length)), s"$src ranks")
      // priorities are the group minima in rank order
      val pr = rows.sortBy(_.getLong(1)).map(_.getLong(4))
      assert(pr.sameElements(pr.sorted), s"$src priorities")
    }
    // size bias: sampled docs skew long — their mean length beats the
    // corpus mean (deterministic corpus, deterministic sample)
    val corpusMean = Tables.load(spark, sf0001, "documents")
      .agg(avg(col("n_chars"))).head().getDouble(0)
    val sampleMean = got.map(_.getLong(3)).sum.toDouble / got.length
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean vs corpus $corpusMean")
    // the rank-limit window must plan as WindowGroupLimit (partial top-k
    // before the exchange), not a full per-group sort of the corpus
    val plan = Curation.weightedSample(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }
}
