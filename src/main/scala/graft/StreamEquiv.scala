package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-vs-batch equivalence at ARBITRARY corpus scale — the gate
  * StreamBench (throughput-only) never provides. NinthWaveSpec proves the
  * composed curation funnel's set-level contract at sf0.001 inside CI;
  * this main replays the SAME contract over any sfDir so the streaming
  * personality has a correctness artifact past the test fixtures (the
  * round-13 gap: every streaming equivalence proof stopped at sf0.1).
  *
  * Contract (documented at [[streaming.StreamingOps.curationFunnelStream]]):
  * winner identity under ties is arrival-order in the stream vs min-doc_id
  * in batch, so equivalence is SET-level on the surviving clean content —
  *  1. the survivor clean-content md5 SET equals the batch composition's
  *     (gate → scrub → distinct) over the same planted-PII corpus,
  *  2. no clean-content value survives twice (exact-dedup state held),
  *  3. every survivor's in-row BPE token count equals the batch fold over
  *     its clean text (keyed by content md5, not doc_id),
  *  4. routing is the documented portable hash of the winner's doc_id,
  *  5. the planted PII was actually redacted (Σ n_pii > 0).
  *
  * The corpus arrives as `nBatches` MemoryStream micro-batches with
  * strictly increasing event times, so dedup state must survive batch
  * boundaries (a single-batch run would prove only within-batch dedup).
  *
  * Usage: runMain graft.StreamEquiv <sfDir> [nBatches]
  * Prints ONE JSON line; exits non-zero on any contract violation.
  */
object StreamEquiv {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(s"local[$cpus]", cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val t0 = System.nanoTime()

    // planted-PII corpus (same fixture transform the CI spec uses) so the
    // scrub stage has real redaction work at every scale
    val dirty = operators.Scrub.dirtyText(spark, sfDir)
      .select(col("doc_id"), col("dirty").as("text"))
      .as[(Long, String)].collect().toSeq
    val merges = operators.TextAnalysis.bpeMergesFor(spark, sfDir)

    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = streaming.StreamingOps.curationFunnelStream(
      in.toDF().toDF("doc_id", "text", "event_time"), merges)
    val q = out.writeStream.format("memory").queryName("funnel_equiv")
      .outputMode("append").start()
    try {
      val slice = math.max(1, (dirty.size + nBatches - 1) / nBatches)
      dirty.grouped(slice).zipWithIndex.foreach { case (batch, i) =>
        in.addData(batch.map(d =>
          (d._1, d._2, new java.sql.Timestamp(1000L * (i + 1)))))
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("funnel_equiv").cache()
    val survivors = got.count()

    // batch truth: the same stage functions composed on a static frame
    val batchDf = operators.Scrub.dirtyText(spark, sfDir)
      .select(col("doc_id"), col("dirty").as("text"),
        lit(new java.sql.Timestamp(0L)).as("event_time"))
    val cleanDistinct = streaming.StreamingOps
      .qualityGateStream(batchDf, carry = Seq("text"))
      .where(col("keep") === 1)
      .select(operators.Scrub.scrubbed(col("text")).as("text"))
      .distinct()
    val msRow = merges.agg(array_sort(
      collect_list(struct(col("ord"), col("pat"), col("rep")))).as("ms"))
    val wantTok = cleanDistinct
      .crossJoin(broadcast(msRow))
      .select(md5(col("text")).as("m"),
        operators.TextAnalysis.bpeTokenCountExpr("text", "ms").as("nt"))
      .as[(String, Long)].collect().toMap

    val gotTok = got.select("content_md5", "n_tokens")
      .as[(String, Long)].collect().toMap
    val md5Match = gotTok.keySet == wantTok.keySet
    val noDupSurvivor = gotTok.size.toLong == survivors
    val tokMatch = gotTok == wantTok
    val badShard = got.where(col("shard") =!=
      pmod(sources.Tables.portableHash(
        concat(lit("order:r8:"), col("doc_id").cast("string"))), lit(16L)))
      .count()
    // coalesce: sum() is null over zero survivors (empty/fully-gated
    // corpus) — degrade to a clean match:false, not an NPE (ADVICE r13)
    val piiSum = got.agg(coalesce(sum("n_pii"), lit(0L))).as[Long].head()
    got.unpersist()
    val sec = (System.nanoTime() - t0) / 1e9

    val ok = md5Match && noDupSurvivor && tokMatch && badShard == 0L &&
      piiSum > 0L
    println(s"""{"metric":"stream_equiv","sf":"$sfDir","docs":${dirty.size},""" +
      s""""batches":$nBatches,"survivors":$survivors,""" +
      s""""batch_survivors":${wantTok.size},"md5_set_match":$md5Match,""" +
      s""""no_dup_survivor":$noDupSurvivor,"token_match":$tokMatch,""" +
      s""""bad_shard_rows":$badShard,"pii_redactions":$piiSum,""" +
      s""""match":$ok,"sec":${math.round(sec * 1000) / 1000.0}}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
