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
