package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.core.{Linking, Msg}
import graft.streaming.StreamingChainLink

/** Streaming ≡ batch: the chained transformWithState pipeline must produce
  * the all-pairs spec's output for every message the watermark has passed,
  * under adversarial (out-of-order) arrival.
  */
class StreamingSpec extends SparkSpec {

  private def m(id: String, src: String, dst: String, s: Long, e: Long): Msg =
    Msg(id, src, dst, s, (e - s).toDouble, e)

  /** Run msgs through the streaming pipeline in the given batches, return
    * emitted LinkedMsg rows, keyed by id.
    */
  private def run(batches: Seq[Seq[Msg]], watermark: String = "0 seconds")
      : Map[String, (Seq[String], Seq[String])] = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[Msg]
    val out = StreamingChainLink.linked(input.toDS(), watermark)
    val name = s"stream_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    sp.table(name).as[graft.core.LinkedMsg].collect()
      .map(l => l.id -> (l.parents, l.children)).toMap
  }

  // far-future sentinel that advances the watermark past everything
  private val flush = m("flush", "10.9.9.9", "10.9.9.8", 1000000L, 1000001L)

  test("golden case 1 (linear chain) through the streaming pipeline") {
    val msgs = Seq(
      m("id1", "10.0.0.1", "10.0.0.2", 1000, 1500),
      m("id2", "10.0.0.2", "10.0.0.3", 1100, 1300),
      m("id3", "10.0.0.3", "10.0.0.4", 1120, 1220))
    val got = run(Seq(msgs, Seq(flush)))
    assert(got("id1") == (Seq(), Seq("id2")))
    assert(got("id2") == (Seq("id1"), Seq("id3")))
    assert(got("id3") == (Seq("id2"), Seq()))
    assert(!got.contains("flush")) // watermark never passed its end
  }

  test("out-of-order arrival across micro-batches heals like the reference watermark test") {
    // child before parent, in different batches (test_chain_linking.py:170-185)
    val got = run(Seq(
      Seq(m("id2", "10.0.0.2", "10.0.0.3", 1100, 1500)),
      Seq(m("id1", "10.0.0.1", "10.0.0.2", 900, 2000)),
      Seq(flush)), watermark = "30 seconds")
    assert(got("id2") == (Seq("id1"), Seq()))
    assert(got("id1") == (Seq(), Seq("id2")))
  }

  test("streaming output == all-pairs batch spec on a random message set") {
    val rnd = new scala.util.Random(42)
    val ips = (0 until 8).map(i => s"10.0.0.$i")
    val msgs = (0 until 120).map { i =>
      val s = 1000L + rnd.nextInt(20000)
      val e = s + 100 + rnd.nextInt(8000)
      Msg(s"m$i", ips(rnd.nextInt(ips.size)), ips(rnd.nextInt(ips.size)),
        s, (e - s).toDouble, e)
    }
    // adversarial arrival: shuffled, split into 5 batches
    val arrival = rnd.shuffle(msgs).grouped(30).toSeq
    val got = run(arrival :+ Seq(flush), watermark = "30 seconds")
    val spec = Linking.linkAllPairs(msgs)
      .map(l => l.id -> (l.parents, l.children)).toMap
    msgs.foreach { mm =>
      assert(got.contains(mm.id), s"${mm.id} never emitted")
      assert(got(mm.id) == spec(mm.id), s"mismatch for ${mm.id}")
    }
  }

  test("built-in stream-stream join variant == all-pairs spec link set") {
    val rnd = new scala.util.Random(7)
    val ips = (0 until 6).map(i => s"10.1.0.$i")
    val msgs = (0 until 100).map { i =>
      val s = 1000L + rnd.nextInt(15000)
      val e = s + 100 + rnd.nextInt(9000) // span ≤ 9.1s < maxSpanMs
      Msg(s"j$i", ips(rnd.nextInt(ips.size)), ips(rnd.nextInt(ips.size)),
        s, (e - s).toDouble, e)
    }
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[Msg]
    val out = StreamingChainLink.linksViaStreamJoin(input.toDS(), "30 seconds")
    val name = s"ssj_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (rnd.shuffle(msgs).grouped(25).toSeq :+ Seq(flush))
        .foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = sp.table(name).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val spec = (for {
      p <- msgs; c <- msgs if Linking.matches(p, c)
    } yield (p.id, c.id)).toSet
    assert(got == spec)
  }

  test("aggregation stage: orphan update lists expire after the grace window") {
    // drive the aggregation processor alone: an add_parent whose base
    // never arrives inside watermark + 30s grace must be DISCARDED (its
    // state TTL'd), while the same shape with the base inside the window
    // keeps the parent — the event-time form of the reference's
    // orphan-discard (simpy_kafka_reader.py:266-269)
    import graft.streaming.{AggregationProcessor, UpdateEvent}
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    def upd(t: String, key: String, other: String, endMs: Long, atMs: Long) =
      UpdateEvent(t, key, other, "a", "b", math.max(endMs - 100, 0L), 1.0, endMs, ts(atMs))
    val in = MemoryStream[UpdateEvent]
    val out = in.toDS()
      .withWatermark("event_time", "30 seconds")
      .groupByKey(_.key_id)
      .transformWithState(new AggregationProcessor, TimeMode.EventTime, OutputMode.Append)
    val name = s"agg_orphan_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // mX: orphan update (base comes 5 min later); mW: update + base together
      in.addData(upd("add_parent", "mX", "pY", 0L, 1000),
        upd("add_parent", "mW", "pY", 0L, 1000),
        upd("message", "mW", "", 5000L, 5000))
      q.processAllAvailable()
      // advance the watermark far past 1s + 30s grace (fires mX's orphan
      // cleanup and mW's emission timer)
      in.addData(upd("message", "zz", "", 200500L, 200000))
      q.processAllAvailable()
      // mX's base finally arrives — admissible, but its updates are gone
      in.addData(upd("message", "mX", "", 300500L, 300500))
      q.processAllAvailable()
      in.addData(upd("message", "flush", "", 400500L, 400000))
      q.processAllAvailable()
    } finally q.stop()
    val rows = sp.table(name).as[graft.core.LinkedMsg].collect()
      .map(m => m.id -> m).toMap
    assert(rows("mW").parents == Seq("pY"), "in-window update must survive")
    assert(rows.contains("mX"), "late base must still emit")
    assert(rows("mX").parents.isEmpty,
      s"orphan update must have been TTL'd, got ${rows("mX").parents}")
  }

  test("aggregation stage: orphan grace is anchored in the updates' event-time frame") {
    // First micro-batch: the watermark is still 0 but the update's event
    // time is far ahead of it. The base arrives two batches later — still
    // admissible within the 30 s bound measured in the UPDATE's own
    // event-time frame — so its parent list must survive. A TTL anchored
    // at the lagging watermark (0 + 30 s) would already have fired in the
    // second batch and purged the list before the base could claim it.
    import graft.streaming.{AggregationProcessor, UpdateEvent}
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    def upd(t: String, key: String, other: String, endMs: Long, atMs: Long) =
      UpdateEvent(t, key, other, "a", "b", math.max(endMs - 100, 0L), 1.0, endMs, ts(atMs))
    val in = MemoryStream[UpdateEvent]
    val out = in.toDS()
      .withWatermark("event_time", "30 seconds")
      .groupByKey(_.key_id)
      .transformWithState(new AggregationProcessor, TimeMode.EventTime, OutputMode.Append)
    val name = s"agg_anchor_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // orphan update at event time 100s while the watermark is 0
      in.addData(upd("add_parent", "mA", "pZ", 0L, 100000))
      q.processAllAvailable()
      // advance the watermark to 90s: past a watermark-anchored timer
      // (0 + 30s), short of the event-time-anchored one (100s + 30s)
      in.addData(upd("message", "zz", "", 200000L, 120000))
      q.processAllAvailable()
      // base arrives in a third batch, admissible (event time 120s >= wm 90s)
      in.addData(upd("message", "mA", "", 125000L, 120000))
      q.processAllAvailable()
      in.addData(upd("message", "flush", "", 500000L, 500000))
      q.processAllAvailable()
    } finally q.stop()
    val rows = sp.table(name).as[graft.core.LinkedMsg].collect()
      .map(m => m.id -> m).toMap
    assert(rows.contains("mA"), "base admissible within the bound must emit")
    assert(rows("mA").parents == Seq("pZ"),
      s"update accumulated before an admissible base must survive the TTL, got ${rows("mA").parents}")
  }
}
