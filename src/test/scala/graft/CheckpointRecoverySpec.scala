package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import graft.core.{Linking, Msg}
import graft.streaming.StreamingChainLink

/** S7 — checkpoint/restart semantics, end to end: the chained stateful
  * pipeline is stopped mid-stream and restarted from its checkpoint with
  * more data; the final output must equal the batch spec with every message
  * emitted exactly once (file source offsets + state store + file sink
  * commit log give exactly-once for this topology).
  */
class CheckpointRecoverySpec extends SparkSpec {

  private def m(id: String, src: String, dst: String, s: Long, e: Long): Msg =
    Msg(id, src, dst, s, (e - s).toDouble, e)

  test("restart from checkpoint: no loss, no duplication, spec-equal output") {
    val sp = spark
    import sp.implicits._
    val root = Files.createTempDirectory("graft-ckpt").toString
    val (inDir, ckptDir, outDir) = (s"$root/in", s"$root/ckpt", s"$root/out")
    Files.createDirectories(java.nio.file.Paths.get(inDir))

    val rnd = new scala.util.Random(11)
    val ips = (0 until 5).map(i => s"10.3.0.$i")
    val msgs = (0 until 80).map { i =>
      val s0 = 1000L + rnd.nextInt(15000)
      val e0 = s0 + 100 + rnd.nextInt(6000)
      Msg(s"r$i", ips(rnd.nextInt(ips.size)), ips(rnd.nextInt(ips.size)),
        s0, (e0 - s0).toDouble, e0)
    }
    val flush = m("flush", "10.8.8.8", "10.8.8.9", 10000000L, 10000100L)
    val arrival = rnd.shuffle(msgs)

    def writeBatch(n: Int, batch: Seq[Msg]): Unit =
      sp.createDataset(batch).coalesce(1).write.mode("overwrite")
        .json(f"$inDir/batch_$n%03d")

    def runOnce(): Unit = {
      val src = sp.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Msg]].schema)
        .option("maxFilesPerTrigger", "1")
        .json(s"$inDir/*")
        .as[Msg]
      val q = StreamingChainLink.linked(src, "30 seconds")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // phase 1: first half of the stream, then "failure" (query terminates)
    arrival.grouped(20).zipWithIndex.take(2)
      .foreach { case (b, i) => writeBatch(i, b) }
    runOnce()
    // phase 2: rest of the stream + watermark flush, resumed from checkpoint
    arrival.grouped(20).zipWithIndex.drop(2)
      .foreach { case (b, i) => writeBatch(i, b) }
    writeBatch(99, Seq(flush))
    runOnce()

    val got = sp.read.parquet(outDir).as[graft.core.LinkedMsg].collect()
    val ids = got.map(_.id)
    assert(ids.length == ids.distinct.length, "duplicated emissions after restart")
    val byId = got.map(l => l.id -> (l.parents, l.children)).toMap
    val spec = Linking.linkAllPairs(msgs)
      .map(l => l.id -> (l.parents, l.children)).toMap
    msgs.foreach { mm =>
      assert(byId.contains(mm.id), s"${mm.id} lost across restart")
      assert(byId(mm.id) == spec(mm.id), s"mismatch for ${mm.id}")
    }
  }

  test("restart from checkpoint: composed curation funnel, exactly-once survivors") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val root = Files.createTempDirectory("graft-funnel-ckpt").toString
    val (inDir, ckptDir, outDir) = (s"$root/in", s"$root/ckpt", s"$root/out")
    Files.createDirectories(java.nio.file.Paths.get(inDir))

    val merges = operators.TextAnalysis.bpeMergesFor(spark, sf0001)
    val dirty = operators.Scrub.dirtyText(spark, sf0001)
      .select(col("doc_id"), col("dirty").as("text"))
      .as[(Long, String)].collect().toSeq
    val (p1, p2base) = dirty.splitAt(dirty.size / 2)
    // cross-phase duplicates: phase 2 replays 10 phase-1 TEXTS under new
    // ids — surviving exactly-once requires the dedup state to come back
    // from the checkpoint, not just the sink commit log
    val p2 = p2base ++ p1.take(10).map { case (id, t) => (id + 100000L, t) }

    def writeBatch(n: Int, batch: Seq[(Long, String)], tsMs: Long): Unit =
      sp.createDataset(batch.map { case (i, t) =>
          (i, t, new java.sql.Timestamp(tsMs)) })
        .toDF("doc_id", "text", "event_time")
        .coalesce(1).write.mode("overwrite").json(f"$inDir/batch_$n%03d")

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("event_time",
        org.apache.spark.sql.types.TimestampType)))
    def runOnce(): Unit = {
      val src = sp.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(s"$inDir/*")
      val q = graft.streaming.StreamingOps.curationFunnelStream(src, merges)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // phase 1 -> "failure" (query terminates) -> phase 2 resumes from ckpt
    writeBatch(0, p1, 1000L)
    runOnce()
    writeBatch(1, p2, 2000L)
    runOnce()

    val got = sp.read.parquet(outDir).cache()
    // exactly-once on clean content: the replayed texts must not re-emit
    val md5s = got.select("content_md5").as[String].collect()
    assert(md5s.length === md5s.distinct.length,
      "duplicate survivors after restart")
    // surviving clean-content set == batch composition over ALL input
    val batchDf = sp.createDataset(p1 ++ p2)
      .toDF("doc_id", "text")
      .withColumn("event_time", lit(new java.sql.Timestamp(0L)))
    val want = graft.streaming.StreamingOps
      .qualityGateStream(batchDf, carry = Seq("text"))
      .where(col("keep") === 1)
      .select(md5(operators.Scrub.scrubbed(col("text"))).as("m"))
      .distinct().as[String].collect().toSet
    assert(md5s.toSet === want, "surviving clean-content set across restart")
    // the shipped token accounting survives the restart too
    val msRow = merges.agg(array_sort(
      collect_list(struct(col("ord"), col("pat"), col("rep")))).as("ms"))
    val wantTok = graft.streaming.StreamingOps
      .qualityGateStream(batchDf, carry = Seq("text"))
      .where(col("keep") === 1)
      .select(operators.Scrub.scrubbed(col("text")).as("text"))
      .distinct().crossJoin(broadcast(msRow))
      .select(md5(col("text")).as("m"),
        operators.TextAnalysis.bpeTokenCountExpr("text", "ms").as("nt"))
      .as[(String, Long)].collect().toMap
    val gotTok = got.select("content_md5", "n_tokens")
      .as[(String, Long)].collect().toMap
    assert(gotTok === wantTok, "per-survivor token counts across restart")
    got.unpersist()
  }
}
