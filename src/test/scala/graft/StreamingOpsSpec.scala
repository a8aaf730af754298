package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingOps

class StreamingOpsSpec extends SparkSpec {

  private def ts(ms: Long) = new Timestamp(ms)

  test("streaming exact dedup drops in-watermark duplicates, first wins") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingOps.dedupExactStream(
      in.toDF().toDF("doc_id", "text", "event_time"))
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        (1L, "alpha beta", ts(1000)), (2L, "gamma delta", ts(2000))))
      q.processAllAvailable()
      // duplicate of doc 1's content arriving later, inside the watermark
      in.addData(Seq((3L, "alpha beta", ts(3000)), (4L, "epsilon", ts(4000))))
      q.processAllAvailable()
    } finally q.stop()
    val ids = sp.table("dedup_out").select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L), s"got $ids")
  }

  test("stream-static enrichment joins the broadcast dimension per batch") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val dim = Seq(("click", 10L), ("view", 1L)).toDF("event_type", "weight")
    val in = MemoryStream[(String, Long)]
    val out = StreamingOps.enrichStream(
      in.toDF().toDF("event_type", "user_id"), dim, "event_type")
    val q = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      in.addData(Seq(("click", 7L), ("view", 8L), ("purchase", 9L)))
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("enrich_out")
      .select("event_type", "user_id", "weight").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set(("click", 7L, 10L), ("view", 8L, 1L), ("purchase", 9L, -1L)))
  }

  test("streaming IVF assignment == batch ivfAssign on the same vectors") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val v = graft.operators.Dedup.normedFor(sp, sf0001)
    val cents = graft.operators.Similarity.centroidsFor(v)
    val batch = graft.operators.Similarity.ivfAssign(v, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = v.select(col("vec_id"), col("e")).as[(Long, Seq[Double])]
      .collect().toSeq
    val in = MemoryStream[(Long, Seq[Double])]
    val out = graft.streaming.StreamingOps.ivfAssignStream(
      in.toDF().toDF("vec_id", "e"), cents)
    val q = out.writeStream.format("memory").queryName("ivf_assign_out")
      .outputMode("append").start()
    try {
      // two micro-batches to prove per-batch re-broadcast of the statics
      val (first, second) = rows.splitAt(rows.size / 2)
      in.addData(first)
      q.processAllAvailable()
      in.addData(second)
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("ivf_assign_out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == batch.size)
    assert(got == batch, {
      val diff = batch.keys.filter(k => got.get(k) != batch.get(k)).take(5)
      s"first diverging vec_ids: ${diff.map(k => (k, got.get(k), batch.get(k)))}"
    })
  }

  test("streaming IVF growth == batch incremental-ivf shard counts") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    // batch maintenance report over sf0001: per-bucket shard growth
    val batch = graft.operators.Similarity.incrementalIvf(sp, sf0001)
      .where(col("n_new") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // the same shard (vec_id % 5 = 0) arriving as a stream, two batches
    val shard = graft.operators.Dedup.normedFor(sp, sf0001)
      .where(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("e")).as[(Long, Seq[Double])].collect().toSeq
    val cents = graft.operators.Similarity.centroidsMemoFor(sp, sf0001)
    val in = MemoryStream[(Long, Seq[Double])]
    val out = graft.streaming.StreamingOps.ivfGrowthStream(
      in.toDF().toDF("vec_id", "e"), cents)
    val q = out.writeStream.format("memory").queryName("ivf_growth_out")
      .outputMode("complete").start()
    try {
      val (first, second) = shard.splitAt(shard.size / 2)
      in.addData(first)
      q.processAllAvailable()
      in.addData(second)
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("ivf_growth_out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch, {
      val diff = (batch.keySet ++ got.keySet)
        .filter(k => got.get(k) != batch.get(k)).take(5)
      s"diverging buckets: ${diff.map(k => (k, got.get(k), batch.get(k)))}"
    })
  }

  test("streaming PQ∘IVF serving == batch pq-ivf top-5 on the query sample") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val v = graft.operators.Dedup.normedFor(sp, sf0001)
    val cents = graft.operators.Similarity.centroidsFor(v)
    val member = graft.operators.Similarity.memberCodesFor(sp, sf0001)
    val codebook = graft.operators.Similarity.pqCodebookSub(v)
    // batch truth: the composed PQ∘IVF top-5 relation
    val batch = graft.operators.Similarity.pqIvfTopFor(sp, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(2), r.getLong(1)))
      .toMap
    // stream the SAME query sample (vec_id % 20 == 0) through the server
    val rows = v.where(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("e")).as[(Long, Seq[Double])].collect().toSeq
    val in = MemoryStream[(Long, Seq[Double])]
    val out = graft.streaming.StreamingOps.pqServeStream(
      in.toDF().toDF("vec_id", "e"), cents, member, codebook)
    val q = out.writeStream.format("memory").queryName("pq_serve_out")
      .outputMode("complete").start()
    try {
      // two micro-batches to prove per-batch re-broadcast of the statics
      val (first, second) = rows.splitAt(rows.size / 2)
      in.addData(first)
      q.processAllAvailable()
      in.addData(second)
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("pq_serve_out").select(col("q_id"),
        posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).as("rk"),
        col("t.adc_q"), col("t.n_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == batch, {
      val diff = batch.keys.filter(k => got.get(k) != batch.get(k)).take(5)
      s"first diverging (q_id, rk): ${diff.map(k => (k, got.get(k), batch.get(k)))}"
    })
  }

  test("streaming SQ8∘IVF serving == batch sq-ivf top-5 on the query sample") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val v = graft.operators.Dedup.normedFor(sp, sf0001)
    val cents = graft.operators.Similarity.centroidsFor(v)
    val member = graft.operators.Similarity.memberSqCodesFor(sp, sf0001)
    val scales = graft.operators.Similarity.sqScalesFor(sp, sf0001)
    // batch truth: the composed SQ8∘IVF top-5 (q_id, n_id, dot, rk)
    val batch = graft.operators.Similarity.sqIvfTopFor(sp, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(2), r.getLong(1)))
      .toMap
    val rows = v.where(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("e")).as[(Long, Seq[Double])].collect().toSeq
    val in = MemoryStream[(Long, Seq[Double])]
    val out = graft.streaming.StreamingOps.sqServeStream(
      in.toDF().toDF("vec_id", "e"), cents, member, scales)
    val q = out.writeStream.format("memory").queryName("sq_serve_out")
      .outputMode("complete").start()
    try {
      // two micro-batches to prove per-batch re-broadcast of the statics
      val (first, second) = rows.splitAt(rows.size / 2)
      in.addData(first)
      q.processAllAvailable()
      in.addData(second)
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("sq_serve_out").select(col("q_id"),
        posexplode(col("topk")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).as("rk"),
        (-col("t.negdot")).as("dot"), col("t.n_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == batch, {
      val diff = (batch.keySet ++ got.keySet)
        .filter(k => got.get(k) != batch.get(k)).take(5)
      s"first diverging (q_id, rk): ${diff.map(k => (k, got.get(k), batch.get(k)))}"
    })
  }

  test("streaming embed stats == batch moments after the corpus streams through") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val batch = graft.operators.Similarity.embedStats(sp, sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val rows = graft.operators.Dedup.normedFor(sp, sf0001)
      .select(col("vec_id"), col("e")).as[(Long, Seq[Double])].collect().toSeq
    val in = MemoryStream[(Long, Seq[Double])]
    val out = StreamingOps.embedStatsStream(in.toDF().toDF("vec_id", "e"))
    val q = out.writeStream.format("memory").queryName("embed_stats_out")
      .outputMode("complete").start()
    try {
      val (first, second) = rows.splitAt(rows.size / 2)
      in.addData(first)
      q.processAllAvailable()
      in.addData(second)
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("embed_stats_out")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == batch, {
      val diff = (batch.keySet ++ got.keySet)
        .filter(k => got.get(k) != batch.get(k)).take(3)
      s"diverging dims: ${diff.map(k => (k, got.get(k), batch.get(k)))}"
    })
  }

  test("streaming shard route: stateless, stable, same hash as train order") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, Timestamp)]
    val out = StreamingOps.shardRouteStream(
      in.toDF().toDF("doc_id", "event_time"))
    val q = out.writeStream.format("memory").queryName("shard_route_out")
      .outputMode("append").start()
    try {
      in.addData(Seq((0L, ts(1000)), (1L, ts(2000)), (2L, ts(3000))))
      q.processAllAvailable()
      in.addData(Seq((0L, ts(9000)))) // same doc again → same route
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("shard_route_out")
      .select("doc_id", "hk", "shard").distinct()
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size === 3, "re-arrival of doc 0 must route identically")
    // hk matches the batch permutation's hash for the same docs
    val batchHk = graft.operators.Curation.trainOrder(sp, sf0001)
      .where(col("doc_id") < 3).select("doc_id", "hk")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (id, (hk, shard)) =>
      assert(hk === batchHk(id), s"hash drift for doc $id")
      assert(shard === math.floorMod(hk, 16L), s"bad route for doc $id")
    }
  }

  test("streaming tumbling counts equal the batch shape after watermark passes") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(String, Double, Timestamp)]
    val out = StreamingOps.tumblingCounts(
      in.toDF().toDF("event_type", "value", "event_time"),
      windowLen = "1 minute", watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("tumble_out")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        ("click", 1.25, ts(10000)), ("click", 2.50, ts(20000)),
        ("view", 0.75, ts(30000))))
      q.processAllAvailable()
      in.addData(Seq(("click", 9.99, ts(200000)))) // advances watermark past window 1
      q.processAllAvailable()
    } finally q.stop()
    val rows = sp.table("tumble_out")
      .select("event_type", "n", "sum_value_cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(("click", 2L, 375L), ("view", 1L, 75L)), s"got $rows")
  }

  test("streaming session windows merge events within the gap, split across it") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, Timestamp)]
    val out = StreamingOps.sessionizeStream(
      in.toDF().toDF("user_id", "event_time"),
      gap = "1 minute", watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 1: two events 30 s apart (one session), then one 5 min later
      in.addData(Seq((1L, ts(10000)), (1L, ts(40000)), (2L, ts(15000))))
      q.processAllAvailable()
      in.addData(Seq((1L, ts(340000))))
      q.processAllAvailable()
      in.addData(Seq((9L, ts(10000000)))) // push watermark far past everything
      q.processAllAvailable()
    } finally q.stop()
    val rows = sp.table("sessions_out")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // user 1: session {10s,40s} (n=2) + session {340s} (n=1); user 2: n=1
    assert(rows == Seq((1L, 1L), (1L, 2L), (2L, 1L)), s"got $rows")
  }

  test("streaming changelog compaction tracks the latest event per key") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, String, Long, Double, Timestamp)]
    val out = StreamingOps.latestSnapshotStream(
      in.toDF().toDF("user_id", "event_type", "event_id", "value", "event_time"))
    val q = out.writeStream.format("memory").queryName("snap_out")
      .outputMode("update").start()
    try {
      in.addData(Seq(
        (1L, "click", 10L, 1.00, ts(1000)),
        (1L, "click", 11L, 2.00, ts(5000)),
        (2L, "view", 20L, 3.00, ts(2000))))
      q.processAllAvailable()
      // older event for user 1 must NOT displace the snapshot; newer must
      in.addData(Seq(
        (1L, "click", 9L, 9.00, ts(500)),
        (2L, "view", 21L, 4.00, ts(8000))))
      q.processAllAvailable()
    } finally q.stop()
    // final snapshot per key = last update emitted for that key
    val rows = sp.table("snap_out").collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(4))))
    val latest = rows.zipWithIndex.groupBy(_._1._1)
      .map { case (k, xs) => k -> xs.maxBy(_._2)._1._2 }
    assert(latest == Map(
      (1L, "click") -> ((11L, 200L)),
      (2L, "view") -> ((21L, 400L))), s"got $latest")
  }

  test("streaming text stats are computed per record, stateless") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingOps.textStatsStream(
      in.toDF().toDF("doc_id", "text", "event_time"))
    val q = out.writeStream.format("memory").queryName("stats_out")
      .outputMode("append").start()
    try {
      in.addData(Seq((7L, "a b a c", ts(1000))))
      q.processAllAvailable()
    } finally q.stop()
    val r = sp.table("stats_out").head()
    assert(r.getAs[Long]("n_words") == 4 && r.getAs[Long]("n_distinct_words") == 3)
    assert(r.getAs[Long]("quality_pct") == 75)
  }

  test("streaming prefix dedup collapses truncation variants, first wins") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingOps.prefixDedupStream(
      in.toDF().toDF("doc_id", "text", "event_time"), watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("pfx_out")
      .outputMode("append").start()
    try {
      val base = ("tok " * 30).trim // > 60 chars
      in.addData(Seq(
        (1L, base, ts(1000)),                  // first fetch
        (2L, base + " extra continued", ts(2000)), // longer re-fetch: same prefix
        (3L, "completely different document text padded to sixty characters plus", ts(3000))))
      q.processAllAvailable()
    } finally q.stop()
    val ids = sp.table("pfx_out").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L), s"got $ids")
  }

  test("streaming source drift == hand-computed L1 against the baseline") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(String, String, Timestamp)]
    // reference: all mass in bucket 1 (8-15 words)
    val baseline = Seq.tabulate(16)(b => if (b == 1) 1000L else 0L)
    val out = StreamingOps.sourceDriftStream(
      in.toDF().toDF("source", "text", "event_time"), baseline,
      windowLen = "1 minute", watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      val w8 = "w " * 7 + "w"   // 8 words -> bucket 1
      val w20 = "w " * 19 + "w" // 20 words -> bucket 2
      in.addData(Seq(
        ("srcA", w8, ts(1000)), ("srcA", w8, ts(2000)),   // srcA matches baseline
        ("srcB", w8, ts(3000)), ("srcB", w20, ts(4000)))) // srcB: half drifted
      q.processAllAvailable()
      in.addData(Seq(("srcA", w8, ts(200000)))) // close window 1
      q.processAllAvailable()
    } finally q.stop()
    val rows = sp.table("drift_out")
      .select("source", "n_docs", "drift_permille")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // srcA: |1000-1000| = 0; srcB: |500-1000| + |500-0| = 1000
    assert(rows == Set(("srcA", 2L, 0L), ("srcB", 2L, 1000L)), s"got $rows")
  }

  test("streaming quality gate == batch quality filter on the same documents") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val docs = graft.sources.Tables.load(sp, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), ts(r.getLong(0))))
    val in = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingOps.qualityGateStream(
      in.toDF().toDF("doc_id", "text", "event_time"))
    val q = out.writeStream.format("memory").queryName("qgate_out")
      .outputMode("append").start()
    try {
      in.addData(docs.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row, off: Int) =
      (r.getLong(0), r.getLong(off), r.getLong(off + 1), r.getLong(off + 2),
        r.getLong(off + 3), r.getString(off + 4), r.getLong(off + 5))
    // batch: (doc_id, n_words, mwl10, top_pct, stopword_n, fail_reason, keep)
    val batch = graft.operators.TextAnalysis.qualityFilter(sp, sf0001)
      .collect().map(key(_, 1)).toSet
    val stream = sp.table("qgate_out")
      .select("doc_id", "n_words", "mwl10", "top_pct", "stopword_n",
        "fail_reason", "keep")
      .collect().map(key(_, 1)).toSet
    assert(stream == batch)
    // the gate discriminates on this corpus: both verdicts occur
    assert(batch.exists(_._7 == 1L) && batch.exists(_._7 == 0L))
  }

  test("streaming corpus-probe dedup drop set == batch corpus_dup set") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    // same split as q_incremental_dedup at sf0.01 (13 corpus_dups)
    val shh = graft.operators.Dedup.shinglesHashedFor(sp, sf001)
    val sizes = graft.operators.Dedup.sizesFor(sp, sf001)
    val isInc = col("doc_id") % 5 === 0
    val postings = shh.where(!isInc)
      .select(col("doc_id").as("cand"), col("h"))
    val candSizes = sizes.where(!isInc)
      .select(col("doc_id").as("cand"), col("n_sh").as("n_c"))
    val expected = graft.operators.Dedup.incrementalVerdicts(
        shh, sizes,
        graft.sources.Tables.load(sp, sf001, "documents").select("doc_id"),
        isInc)
      .where(col("verdict") === "corpus_dup")
      .select("doc_id").as[Long].collect().toSet
    assert(expected.nonEmpty, "fixture must bite")
    val rows = shh.where(isInc).join(sizes, "doc_id")
      .select(col("doc_id"), col("h"), col("n_sh")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), ts(1000)))
    val in = MemoryStream[(Long, Long, Long, Timestamp)]
    val out = StreamingOps.corpusProbeDedupStream(
      in.toDF().toDF("doc_id", "h", "n_sh", "event_time"),
      postings, candSizes)
    val q = out.writeStream.format("memory").queryName("cprobe_out")
      .outputMode("append").start()
    try {
      in.addData(rows.toSeq)
      q.processAllAvailable()
      // advance the watermark far past the window so the drop list emits
      in.addData(Seq((-1L, 0L, 1L, ts(3600L * 1000))))
      q.processAllAvailable()
    } finally q.stop()
    val got = sp.table("cprobe_out").select("doc_id").as[Long].collect().toSet
    assert(got == expected, {
      s"stream-only: ${(got -- expected).take(5)}; batch-only: ${(expected -- got).take(5)}"
    })
  }
}
