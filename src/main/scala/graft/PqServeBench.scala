package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Micro-benchmark for the streaming PQ∘IVF server: pre-builds the index
  * statics (memoized parquet relations), then streams the query sample
  * through [[graft.streaming.StreamingOps.pqServeStream]] in fixed
  * micro-batches (one untimed warm-up) and reports sustained queries/sec.
  * Args: repeats (default 8). `SPARK_GRAFT_SF_DIR` selects the corpus.
  */
object PqServeBench {
  def main(args: Array[String]): Unit = {
    val repeats = args.headOption.map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pq-serve-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val v = operators.Dedup.normedFor(spark, sfDir)
    val cents = operators.Similarity.centroidsMemoFor(spark, sfDir)
    val member = operators.Similarity.memberCodesFor(spark, sfDir)
    val codebook = operators.Similarity.pqCodebookSub(v)
    member.count() // force the serving-index build before timing

    val qs = v.where(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("e")).as[(Long, Seq[Double])].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val input = MemoryStream[(Long, Seq[Double])]
    val out = streaming.StreamingOps.pqServeStream(
      input.toDF().toDF("vec_id", "e"), cents, member, codebook)
    val q = out.writeStream.format("memory").queryName("pq_serve_bench")
      .outputMode("update").start()
    try {
      input.addData(qs) // untimed warm-up micro-batch
      q.processAllAvailable()
      // Per-batch timings + update mode: each micro-batch emits only its
      // own keys, so the reported number is repeat-count-invariant (the
      // old complete-mode total re-emitted ALL previously served queries
      // every batch, degrading with the repeats argument).
      val loadBefore = BenchLoad.sample()
      val batchSec = (1 to repeats).map { i =>
        // fresh q_ids per repeat so state keeps growing realistically
        // instead of collapsing onto the same keys
        val t0 = System.nanoTime()
        input.addData(qs.map { case (id, e) => (id + i * 10000000L, e) })
        q.processAllAvailable()
        (System.nanoTime() - t0) / 1e9
      }
      val med = batchSec.sorted.apply(batchSec.size / 2)
      val sec = batchSec.sum
      val n = repeats * qs.size
      val loadJson = BenchLoad.jsonFields(loadBefore, BenchLoad.sample(), qs.size / med)
      println(f"""{"metric":"pq_serve_queries_per_sec","value":${qs.size / med}%.1f,""" +
        s""""unit":"q/sec","queries":$n,"batches":$repeats,""" +
        f""""batch_sec_median":$med%.3f,"batch_sec_min":${batchSec.min}%.3f,""" +
        f""""batch_sec_max":${batchSec.max}%.3f,"wall_sec":$sec%.2f$loadJson}""")
    } finally q.stop()
    spark.stop()
  }
}
