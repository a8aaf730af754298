package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.Msg
import graft.sources.Tables
import graft.streaming.StreamingChainLink

/** Demo main: drives the streaming chain-linking pipeline end-to-end on
  * real testdata msgs, delivered out-of-order across micro-batches, and
  * prints the enriched output. Usage: runMain graft.StreamDemo [sfDir] [n]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val n = args.lift(1).map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // take n msgs from testdata, scramble arrival order (seeded) like the
    // reference's chi-square sender delays (W6)
    val msgs = Tables.msgs(spark, sfDir).as[Msg].collect().toSeq
      .sortBy(_.start_at_ms).take(n)
    val arrival = new scala.util.Random(42).shuffle(msgs).grouped(50).toSeq
    val maxEnd = msgs.map(_.end_at_ms).max
    val flush = Msg("flush", "10.255.0.1", "10.255.0.2", maxEnd + 60000L, 1.0,
      maxEnd + 60001L)

    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[Msg]
    val q = StreamingChainLink.linked(input.toDS(), "30 seconds")
      .writeStream.format("memory").queryName("demo_out")
      .outputMode("append").start()
    (arrival :+ Seq(flush)).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    val out = spark.table("demo_out").orderBy("id")
    val linkedRows = out.where("size(parents) > 0 OR size(children) > 0")
    println(s"emitted=${out.count()} of ${msgs.size} fed; linked=${linkedRows.count()}")
    linkedRows.show(20, truncate = false)

    // streaming training-data ops on a documents-derived stream
    val docIn = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = docIn.toDF().toDF("doc_id", "text", "event_time")
    val dq = graft.streaming.StreamingOps.dedupExactStream(docs)
      .writeStream.format("memory").queryName("demo_dedup")
      .outputMode("append").start()
    val docRows = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").limit(50).collect()
      .map(r => (r.getLong(0), r.getString(1), new java.sql.Timestamp(r.getLong(0) * 1000)))
    val withDups = docRows ++ docRows.take(10).map { case (i, t, ts) =>
      (i + 100000L, t, new java.sql.Timestamp(ts.getTime + 1000))
    }
    docIn.addData(withDups.toSeq)
    dq.processAllAvailable()
    dq.stop()
    val kept = spark.table("demo_dedup").count()
    println(s"stream-dedup: fed=${withDups.length} kept=$kept " +
      s"(dropped ${withDups.length - kept} in-watermark duplicates)")

    // batch flagship through the public facade for comparison
    val batchLinked = Engine.chainLink(spark, sfDir)
      .where("size(parents) > 0 OR size(children) > 0").count()
    println(s"facade batch chain_link: $batchLinked linked messages in $sfDir")
    spark.stop()
  }
}
