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
}
