package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingDedup

/** Input row for the dedup streaming bench (top-level for the encoder). */
final case class BenchDoc(doc_id: Long, text: String, ts_ms: Long)

/** Streaming-curation throughput bench: documents (sf0.01 texts cycled
  * with fresh ids — every repetition is a genuine near-dup, the heavy
  * collision regime) through the chained MinHash-LSH dedup topology.
  * Prints one JSON line with docs/sec. Not driver-invoked; evidence for
  * the streaming-curation personality alongside StreamBench's chain-link
  * number.
  *
  * Usage: runMain graft.DedupStreamBench [nDocs] [batchSize]
  */
object DedupStreamBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val batchSize = args.lift(1).map(_.toInt).getOrElse(5000)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedup-stream-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val texts = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))
    val docs = (0 until nDocs).map(i =>
      BenchDoc(i.toLong, texts(i % texts.length), 1000L + i))
    val flush = BenchDoc(9999999L, "zz zz zz flush sentinel zz", 1000000000L)

    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[BenchDoc]
    val q = StreamingDedup.minhashDedupStream(input.toDS().toDF(), "30 seconds")
      .writeStream.format("memory").queryName("dedup_bench_out")
      .outputMode("append").start()
    val loadBefore = BenchLoad.sample()
    val t0 = System.nanoTime()
    (docs.grouped(batchSize).toSeq :+ Seq(flush)).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val emitted = spark.table("dedup_bench_out").count()
    val dropped = spark.table("dedup_bench_out").where(!$"kept").count()
    q.stop()
    val rate = nDocs / wall
    val loadJson = BenchLoad.jsonFields(loadBefore, BenchLoad.sample(), rate)
    println(f"""{"metric":"dedup_docs_per_sec","value":$rate%.1f,""" +
      s""""unit":"docs/sec","docs":$nDocs,"emitted":$emitted,""" +
      f""""near_dups":$dropped,"wall_sec":$wall%.2f$loadJson}""")
    spark.stop()
  }
}
