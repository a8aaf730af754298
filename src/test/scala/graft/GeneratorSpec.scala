package graft

import graft.core.{Linking, Msg}
import graft.sources.TraceGenerator
import graft.sources.TraceGenerator.GenConfig
import graft.streaming.StreamingChainLink

/** Generator-fixture parity with the reference simulator + the W6
  * end-to-end adversarial streaming test.
  */
class GeneratorSpec extends SparkSpec {

  test("trace structure matches the reference call tree") {
    val msgs = TraceGenerator.traces(GenConfig(nTraces = 50)).map(_.msg)
    val byTrace = msgs.grouped(1).toSeq // flat; regroup via main messages
    val mains = msgs.filter(m => m.latency_msec == 130.0 || m.latency_msec == 170.0)
    assert(mains.size == 50, "one main call per trace")
    // 4 msgs for short traces, 6 for branched
    assert(msgs.size == mains.map(m => if (m.latency_msec == 170.0) 6 else 4).sum)
    // every non-main call is contained in its trace's main interval and
    // carries the IP handoff from its caller
    val branched = mains.count(_.latency_msec == 170.0)
    assert(branched > 0 && branched < 50, "40% branch probability exercised")
    msgs.filter(m => m.latency_msec == 30.0).foreach { sub1 =>
      val main = mains.find(m => m.start_at_ms == sub1.start_at_ms - 20 ||
        m.start_at_ms == sub1.start_at_ms - 90)
      assert(main.isDefined, s"sub call ${sub1.id} has no owning main interval")
    }
  }

  test("deterministic: same seed, same stream") {
    val a = TraceGenerator.traces(GenConfig(nTraces = 20))
    val b = TraceGenerator.traces(GenConfig(nTraces = 20))
    assert(a == b)
  }

  test("delivery delays are capped and create disorder") {
    val ds = TraceGenerator.traces(GenConfig(nTraces = 200))
    ds.foreach(d => assert(d.deliver_ts >= d.msg.end_at_ms &&
      d.deliver_ts <= d.msg.end_at_ms + 30000))
    val arrival = TraceGenerator.arrivalOrder(GenConfig(nTraces = 200))
    val disordered = arrival.sliding(2).count {
      case Seq(x, y) => x.start_at_ms > y.start_at_ms
      case _ => false
    }
    assert(disordered > 10, "arrival order must be genuinely out-of-order")
    // round-robin partitioner (S5)
    assert(ds.map(_.partition).take(10) == (0 until 10).map(_ % 5))
  }

  test("W6 end-to-end: generator workload through streaming == batch spec") {
    val sp = spark
    import sp.implicits._
    val cfg = GenConfig(nTraces = 40, meanIntervalMs = 3000.0, stdDevMs = 500.0)
    val arrival = TraceGenerator.arrivalOrder(cfg)
    val maxEnd = arrival.map(_.end_at_ms).max
    val flush = Msg("flush", "10.255.0.1", "10.255.0.2", maxEnd + 200000L, 1.0,
      maxEnd + 200001L)

    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Msg]
    val q = StreamingChainLink.linked(input.toDS(), "60 seconds")
      .writeStream.format("memory").queryName("gen_out")
      .outputMode("append").start()
    try {
      (arrival.grouped(45).toSeq :+ Seq(flush)).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()

    val got = sp.table("gen_out").as[graft.core.LinkedMsg].collect()
      .map(l => l.id -> (l.parents, l.children)).toMap
    val spec = Linking.linkAllPairs(arrival)
      .map(l => l.id -> (l.parents, l.children)).toMap
    arrival.foreach { m =>
      assert(got.contains(m.id), s"${m.id} never emitted")
      assert(got(m.id) == spec(m.id), s"mismatch for ${m.id}")
    }
    // the call tree must actually link: every trace's main has children
    assert(got.values.exists(_._2.nonEmpty))
  }
}
