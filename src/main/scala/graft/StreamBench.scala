package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.core.Msg
import graft.sources.TraceGenerator
import graft.sources.TraceGenerator.GenConfig
import graft.streaming.StreamingChainLink

/** Streaming-throughput bench: generator workload (SimPy-parity traces,
  * chi-square out-of-order delivery) through the full chained
  * transformWithState pipeline. Prints one JSON line with msgs/sec —
  * directly comparable to the reference's published ~100 msg/s
  * (`README.md:204-207`, BASELINE.md).
  *
  * Usage: runMain graft.StreamBench [nTraces] [batchSize]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nTraces = args.headOption.map(_.toInt).getOrElse(5000)
    val batchSize = args.lift(1).map(_.toInt).getOrElse(5000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val arrival = TraceGenerator.arrivalOrder(
      GenConfig(nTraces = nTraces, meanIntervalMs = 100.0, stdDevMs = 20.0))
    val maxEnd = arrival.map(_.end_at_ms).max
    val flush = Msg("flush", "10.255.0.1", "10.255.0.2", maxEnd + 100000L, 1.0,
      maxEnd + 100001L)

    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[Msg]
    val q = StreamingChainLink.linked(input.toDS(), "60 seconds")
      .writeStream.format("memory").queryName("bench_out")
      .outputMode("append").start()
    val loadBefore = BenchLoad.sample()
    val t0 = System.nanoTime()
    (arrival.grouped(batchSize).toSeq :+ Seq(flush)).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val emitted = spark.table("bench_out").count()
    q.stop()
    val rate = arrival.size / secs
    val loadJson = BenchLoad.jsonFields(loadBefore, BenchLoad.sample(), rate)
    println(f"""{"metric":"stream_msgs_per_sec","value":$rate%.1f,"unit":"msg/sec","msgs":${arrival.size},"emitted":$emitted,"wall_sec":$secs%.2f,"batches":${arrival.size / batchSize + 1}$loadJson}""")
    spark.stop()
  }
}
