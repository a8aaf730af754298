package graft

import graft.core.Msg
import graft.streaming.Pipeline

/** P1 lenient-parse semantics, matched against the reference's
  * `_to_int`/`_to_float` behavior table (simpy_kafka_reader.py:42-77).
  */
class PipelineSpec extends SparkSpec {

  private def parse(jsons: String*): Seq[Msg] = {
    val sp = spark
    import sp.implicits._
    Pipeline.parseMsgs(jsons.toDS()).collect().toSeq
  }

  test("well-formed message parses exactly") {
    val Seq(m) = parse(
      """{"id":"msg_1","src_ip":"10.0.0.1","dst_ip":"10.0.0.2",
        |"start_at_ms":1000,"latency_msec":12.5,"end_at_ms":1013}""".stripMargin)
    assert(m == Msg("msg_1", "10.0.0.1", "10.0.0.2", 1000L, 12.5, 1013L))
  }

  test("missing fields default to ''/0/0.0 (reference parse_message)") {
    val Seq(m) = parse("""{"id":"msg_2"}""")
    assert(m == Msg("msg_2", "", "", 0L, 0.0, 0L))
  }

  test("numeric strings coerce via int(float(x)) — trunc toward zero") {
    val Seq(m) = parse(
      """{"id":"x","start_at_ms":"1000.9","latency_msec":"3.25","end_at_ms":"-5.5"}""")
    assert(m.start_at_ms == 1000L) // int(float("1000.9")) == 1000
    assert(m.latency_msec == 3.25)
    assert(m.end_at_ms == -5L) // Python int() truncates toward zero, not floor
  }

  test("non-numeric garbage in numeric field defaults to 0") {
    val Seq(m) = parse("""{"id":"x","start_at_ms":"oops"}""")
    assert(m.start_at_ms == 0L)
  }

  test("malformed JSON yields a fully-defaulted row (divergence: reference crashes)") {
    val Seq(m) = parse("""not json at all""")
    assert(m == Msg("", "", "", 0L, 0.0, 0L))
  }

  test("linked-message JSON sink serialization matches the reference shape") {
    val sp = spark
    import sp.implicits._
    val linked = Seq(graft.core.LinkedMsg("msg_1", "10.0.0.1", "10.0.0.2",
      1000L, 12.5, 1013L, Seq("msg_0"), Seq("msg_2", "msg_3"))).toDS()
    val Seq(json) = Pipeline.toLinkedJson(linked).as[String].collect().toSeq
    assert(json ==
      """{"id":"msg_1","src_ip":"10.0.0.1","dst_ip":"10.0.0.2","start_at_ms":1000,""" +
        """"latency_msec":12.5,"end_at_ms":1013,"parents":["msg_0"],""" +
        """"children":["msg_2","msg_3"]}""")
  }

  test("kafka source needs the connector jar (deploy-time dep, absent offline)") {
    val e = intercept[Exception](Pipeline.kafkaSource(spark, "broker:9092"))
    assert(e.getMessage.contains("kafka"))
  }

  test("e2e wire path: file source -> parse -> watermark -> link -> aggregate -> JSON sink") {
    // runKafkaJob's full topology through the streaming file source — every
    // stage of the Kafka job runs except the connector jar itself. Input
    // exercises the lenient parse on the wire (numeric string, float ms);
    // output must be byte-identical to the reference's linked JSON shape
    // (reference README.md:49-60).
    val base = java.nio.file.Files.createTempDirectory("graft-e2e")
    val inDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val outDir = base.resolve("out").toString
    val ckDir = base.resolve("ck").toString
    java.nio.file.Files.writeString(inDir.resolve("batch0.jsonl"),
      """{"id":"id2","src_ip":"10.0.0.2","dst_ip":"10.0.0.3","start_at_ms":"1100.4","latency_msec":200,"end_at_ms":1300}
        |{"id":"id1","src_ip":"10.0.0.1","dst_ip":"10.0.0.2","start_at_ms":1000,"latency_msec":500.0,"end_at_ms":1500}
        |""".stripMargin)
    val q = Pipeline.runFileJob(spark, inDir.toString, outDir, ckDir,
      maxOutOfOrder = "0 seconds")
    try {
      q.processAllAvailable()
      // second file advances the watermark past both ends (event-time flush)
      java.nio.file.Files.writeString(inDir.resolve("batch1.jsonl"),
        """{"id":"flush","src_ip":"10.9.9.9","dst_ip":"10.9.9.8","start_at_ms":1000000,"latency_msec":1.0,"end_at_ms":1000001}
          |""".stripMargin)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.text(outDir).collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq(
      """{"id":"id1","src_ip":"10.0.0.1","dst_ip":"10.0.0.2","start_at_ms":1000,""" +
        """"latency_msec":500.0,"end_at_ms":1500,"parents":[],"children":["id2"]}""",
      """{"id":"id2","src_ip":"10.0.0.2","dst_ip":"10.0.0.3","start_at_ms":1100,""" +
        """"latency_msec":200.0,"end_at_ms":1300,"parents":["id1"],"children":[]}"""))
  }

  test("JSON-lines file source flows through the lenient wire parse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    java.nio.file.Files.writeString(dir.resolve("part0.jsonl"),
      """{"id":"f1","src_ip":"10.0.0.1","dst_ip":"10.0.0.2","start_at_ms":100,"latency_msec":5.0,"end_at_ms":200}
        |{"id":"f2","src_ip":"10.0.0.2","start_at_ms":"150.7"}
        |not json at all
        |""".stripMargin)
    val got = Pipeline.jsonFileMsgs(spark, dir.toString).collect()
      .map(m => m.id -> m).toMap
    assert(got("f1").end_at_ms == 200L)
    // missing fields default; numeric string coerces via int(float(x))
    assert(got("f2").dst_ip == "" && got("f2").start_at_ms == 150L &&
      got("f2").end_at_ms == 0L)
    // malformed line defaults the whole row (id "")
    assert(got("").start_at_ms == 0L)
    assert(got.size == 3)
  }
}
