package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.core.{Linking, Msg}
import graft.streaming.{ProcTimeChainLink, StreamingChainLink}

/** W4 — the idle-flush gap, pinned and closed.
  *
  * A bounded stream that ENDS leaves messages whose `end_at_ms` lies beyond
  * the final watermark stuck in the event-time pipeline forever — the
  * reference's 60 s processing-time idle flush emits them
  * (`simpy_kafka_reader.py:303-310`). The first test pins exactly which ids
  * the event-time personality drops; the second shows the processing-time
  * personality ([[ProcTimeChainLink]]) emits ALL of them with values equal
  * to the all-pairs batch spec.
  */
class ProcTimeFlushSpec extends SparkSpec {

  private def m(id: String, src: String, dst: String, s: Long, e: Long): Msg =
    Msg(id, src, dst, s, (e - s).toDouble, e)

  /** A chain whose tail messages end AFTER the final watermark
    * (max start 1200 − 30 000 ⇒ watermark < every end): on a bounded run
    * nothing can be emitted by watermark passage alone.
    */
  private val tailMsgs = Seq(
    m("t1", "10.2.0.1", "10.2.0.2", 1000, 9000),
    m("t2", "10.2.0.2", "10.2.0.3", 1100, 8000),
    m("t3", "10.2.0.3", "10.2.0.4", 1200, 7000))

  test("event-time personality drops the tail of a bounded stream (the W4 gap)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[Msg]
    val out = StreamingChainLink.linked(input.toDS(), "30 seconds")
    val name = s"w4_gap_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(tailMsgs)
      q.processAllAvailable()
    } finally q.stop()
    // every id's end_at_ms is beyond the final watermark → all dropped
    assert(sp.table(name).count() == 0)
  }

  test("processing-time personality flushes the full tail, values == batch spec") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[Msg]
    val out = ProcTimeChainLink.linked(input.toDS(),
      maxOutOfOrderMs = 30000L, idleFlushMs = 1000L)
    val name = s"w4_flush_${System.nanoTime()}"
    // NOTE: in TimeMode.ProcessingTime the engine self-triggers batches
    // (shouldRunAnotherBatch is unconditionally true so due timers always
    // fire) — processAllAvailable() therefore never observes quiescence and
    // must not be used; poll the sink instead.
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      input.addData(tailMsgs)
      val deadline = System.currentTimeMillis() + 120000
      while (sp.table(name).count() < tailMsgs.size &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
    } finally q.stop()
    val got = sp.table(name).as[graft.core.LinkedMsg].collect()
      .filter(l => l.id.startsWith("t"))
      .map(l => l.id -> (l.parents.sorted, l.children.sorted)).toMap
    val spec = Linking.linkAllPairs(tailMsgs)
      .map(l => l.id -> (l.parents.sorted, l.children.sorted)).toMap
    assert(got.keySet == spec.keySet,
      s"missing: ${spec.keySet -- got.keySet}; extra: ${got.keySet -- spec.keySet}")
    spec.foreach { case (id, pc) => assert(got(id) == pc, s"mismatch for $id") }
  }

  test("proc-time personality: state + idle timers survive checkpoint restart") {
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-pt-ckpt").toString
    val (inDir, ckptDir, outDir) = (s"$root/in", s"$root/ckpt", s"$root/out")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    sp.createDataset(tailMsgs).coalesce(1).write.mode("overwrite")
      .json(s"$inDir/batch_0")

    def start() = {
      val src = sp.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Msg]].schema)
        .json(s"$inDir/*")
        .as[Msg]
      ProcTimeChainLink.linked(src, maxOutOfOrderMs = 30000L, idleFlushMs = 3000L)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
        .start()
    }

    // phase 1: ingest the input, then "fail" before the 3 s idle horizon
    // (if a slow machine lets the flush fire first, the exactly-once
    // assertion below still must hold — emission is then in phase 1)
    val q1 = start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      def ingested: Long =
        q1.recentProgress.map(p => p.numInputRows).sum
      while (ingested < tailMsgs.size && // source rows (pre-fan-out)
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q1.stop()

    // phase 2: restart from the checkpoint; recovered state + timers must
    // flush every message exactly once. A restarted query with NO new data
    // and no replayable batch never executes a batch (the PT self-trigger
    // only primes after a first execution), so nudge it with one unrelated
    // record — the batch it triggers fires all recovered overdue timers.
    val q2 = start()
    try {
      sp.createDataset(Seq(m("nudge", "10.9.9.1", "10.9.9.2", 500, 600)))
        .coalesce(1).write.mode("overwrite").json(s"$inDir/batch_1")
      val deadline = System.currentTimeMillis() + 120000
      def emitted: Long =
        try sp.read.parquet(outDir)
          .where(org.apache.spark.sql.functions.col("id").startsWith("t")).count()
        catch { case _: Throwable => 0L }
      while (emitted < tailMsgs.size &&
        System.currentTimeMillis() < deadline) Thread.sleep(300)
    } finally q2.stop()

    val got = sp.read.parquet(outDir).as[graft.core.LinkedMsg].collect()
      .filter(_.id.startsWith("t"))
    assert(got.map(_.id).length == got.map(_.id).distinct.length,
      "duplicated emissions across restart")
    val byId = got.map(l => l.id -> (l.parents.sorted, l.children.sorted)).toMap
    val spec = Linking.linkAllPairs(tailMsgs)
      .map(l => l.id -> (l.parents.sorted, l.children.sorted)).toMap
    assert(byId.keySet == spec.keySet,
      s"missing: ${spec.keySet -- byId.keySet}; extra: ${byId.keySet -- spec.keySet}")
    spec.foreach { case (id, pc) => assert(byId(id) == pc, s"mismatch for $id") }
  }

  test("proc-time personality matches the spec on a random bounded replay") {
    val rnd = new scala.util.Random(11)
    val ips = (0 until 6).map(i => s"10.3.0.$i")
    val msgs = (0 until 80).map { i =>
      val s = 1000L + rnd.nextInt(15000)
      val e = s + 100 + rnd.nextInt(8000)
      Msg(s"p$i", ips(rnd.nextInt(ips.size)), ips(rnd.nextInt(ips.size)),
        s, (e - s).toDouble, e)
    }
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[Msg]
    val out = ProcTimeChainLink.linked(input.toDS(),
      maxOutOfOrderMs = 30000L, idleFlushMs = 1000L)
    val name = s"w4_rand_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      // single batch: a mid-feed idle flush would emit partial arrays, the
      // reference's own behavior under a stalled stream — the deterministic
      // contract under test here is the END-of-stream flush. Poll the sink
      // (processAllAvailable never returns under self-triggering PT mode).
      input.addData(rnd.shuffle(msgs))
      val deadline = System.currentTimeMillis() + 120000
      while (sp.table(name).count() < msgs.size &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
    } finally q.stop()
    val got = sp.table(name).as[graft.core.LinkedMsg].collect()
      .filter(l => l.id.startsWith("p"))
      .map(l => l.id -> (l.parents.sorted, l.children.sorted)).toMap
    val spec = Linking.linkAllPairs(msgs)
      .map(l => l.id -> (l.parents.sorted, l.children.sorted)).toMap
    assert(got.keySet == spec.keySet,
      s"missing: ${spec.keySet -- got.keySet}")
    spec.foreach { case (id, pc) => assert(got(id) == pc, s"mismatch for $id") }
  }
}
