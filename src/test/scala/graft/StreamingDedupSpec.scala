package graft

import java.security.MessageDigest

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.Tables
import graft.streaming.{DedupVerdict, StreamingDedup}

/** Test input row (top-level: Spark encoders can't reach spec-inner types). */
final case class DocRow(doc_id: Long, text: String, ts_ms: Long)

/** Streaming MinHash-LSH dedup ≡ batch greedy first-wins pass in (ts,
  * doc_id) order, under shuffled multi-batch arrival. The model recomputes
  * signatures independently (own md5, own permutations, own banding).
  */
class StreamingDedupSpec extends SparkSpec {

  private val P = 1000000007L

  private def md5Hash60(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  private def bandSigs(text: String): Seq[String] = {
    val w = text.split(" ", -1)
    val grams =
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSeq.distinct
      else Seq(w.mkString(" "))
    val hs = grams.map(g => md5Hash60(g) % P)
    val mh = (0 to 15).map(j =>
      hs.map(h => (h * (j * 4097L + 1L) + (j * 12289L + 7L)) % P).min)
    (0 to 3).map(b => s"$b:" + (4 * b to 4 * b + 3)
      .map(j => f"$j%02d@${mh(j)}").mkString(":"))
  }

  test("streaming LSH dedup == greedy batch pass under shuffled arrival") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]

    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => DocRow(r.getLong(0), r.getString(1), 1000L + r.getLong(0)))

    // greedy model in (ts, doc_id) order: kept iff no band sig seen before
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.sortBy(d => (d.ts_ms, d.doc_id)).map { d =>
      val sigs = bandSigs(d.text)
      val beaten = sigs.count(seen)
      seen ++= sigs
      d.doc_id -> ((beaten == 0, beaten.toLong))
    }.toMap

    // shuffled, multi-batch, out-of-order (within the watermark bound)
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(docs.toSeq)
    val batches = shuffled.grouped(120).toSeq
    val flush = DocRow(999999L, "zz zz zz flush sentinel doc zz", 100000000L)

    val input = MemoryStream[DocRow]
    val out = StreamingDedup.minhashDedupStream(
      input.toDS().toDF(), maxOutOfOrder = "30 seconds")
    val name = s"dedup_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(Seq(flush)); q.processAllAvailable()
    } finally q.stop()

    val got = sp.table(name).as[DedupVerdict].collect()
      .map(v => v.doc_id -> ((v.kept, v.n_bands_beaten))).toMap
    assert(got.size == docs.length, s"expected ${docs.length} verdicts, got ${got.size}")
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"doc $id: got $v expected ${expected(id)}")
    }
    val dupCount = got.count(!_._2._1)
    info(s"streamed ${docs.length} docs, $dupCount near-dup drops")
  }

  test("proc-time personality flushes all verdicts with no sentinel") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => DocRow(r.getLong(0), r.getString(1), 1000L + r.getLong(0)))
      .take(150)
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.sortBy(d => (d.ts_ms, d.doc_id)).map { d =>
      val sigs = bandSigs(d.text)
      val beaten = sigs.count(seen)
      seen ++= sigs
      d.doc_id -> ((beaten == 0, beaten.toLong))
    }.toMap

    val input = MemoryStream[DocRow]
    val out = graft.streaming.StreamingDedup.minhashDedupStreamProcTime(
      input.toDS().toDF(), idleFlushMs = 1500L)
    val name = s"dedup_pt_${System.nanoTime()}"
    // ProcessingTime mode self-triggers micro-batches, so
    // processAllAvailable() would hang — poll the sink instead
    // (ProcTimeFlushSpec pattern).
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      input.addData(docs.toSeq)
      val deadline = System.currentTimeMillis() + 120000
      while (sp.table(name).count() < docs.length &&
        System.currentTimeMillis() < deadline) Thread.sleep(300)
      val got = sp.table(name).as[DedupVerdict].collect()
        .map(v => v.doc_id -> ((v.kept, v.n_bands_beaten))).toMap
      assert(got.size == docs.length,
        s"expected ${docs.length} flushed verdicts, got ${got.size}")
      got.foreach { case (id, v) => assert(v == expected(id), s"doc $id") }
    } finally q.stop()
  }

  test("random small-vocab corpora: stream == greedy model across seeds") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    // tiny vocabulary + short docs → many exact/near dups → dense band
    // collisions, the adversarial regime for first-wins ordering
    val vocab = Vector("a", "b", "c", "d")
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 60).map { i =>
        val len = 3 + rnd.nextInt(4)
        DocRow(i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "),
          1000L + i)
      }
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = docs.sortBy(d => (d.ts_ms, d.doc_id)).map { d =>
        val sigs = bandSigs(d.text)
        val beaten = sigs.count(seen)
        seen ++= sigs
        d.doc_id -> ((beaten == 0, beaten.toLong))
      }.toMap
      val flush = DocRow(999999L, "zz zz zz flush zz", 100000000L)
      val arrival = rnd.shuffle(docs)

      val input = MemoryStream[DocRow]
      val out = StreamingDedup.minhashDedupStream(input.toDS().toDF(), "30 seconds")
      val name = s"dedup_rand_${seed}_${System.nanoTime()}"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        arrival.grouped(25).foreach { b => input.addData(b); q.processAllAvailable() }
        input.addData(Seq(flush)); q.processAllAvailable()
      } finally q.stop()
      val got = sp.table(name).as[DedupVerdict].collect()
        .map(v => v.doc_id -> ((v.kept, v.n_bands_beaten))).toMap
      assert(got.size == docs.length, s"seed $seed: missing verdicts")
      got.foreach { case (id, v) =>
        assert(v == expected(id), s"seed $seed doc $id")
      }
      val drops = got.count(!_._2._1)
      assert(drops > 0, s"seed $seed produced no dups — vocabulary not adversarial")
    }
  }

  test("late-beyond-watermark docs are dropped whole: no verdict, never a wrong one") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val docs = Seq(
      DocRow(1L, "alpha beta gamma delta epsilon", 1000L),
      DocRow(2L, "zeta eta theta iota kappa", 2000L))
    val pastWm = DocRow(3L, "far future words here now", 500000L) // advances wm
    val late = DocRow(4L, "alpha beta gamma delta epsilon", 1000L) // < wm - 30s
    val flush = DocRow(999999L, "zz zz zz flush zz", 100000000L)

    val input = MemoryStream[DocRow]
    val out = StreamingDedup.minhashDedupStream(input.toDS().toDF(), "30 seconds")
    val name = s"dedup_late_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(docs); q.processAllAvailable()
      input.addData(Seq(pastWm)); q.processAllAvailable()
      input.addData(Seq(late)); q.processAllAvailable() // dropped by watermark
      input.addData(Seq(flush)); q.processAllAvailable()
    } finally q.stop()
    val got = sp.table(name).as[DedupVerdict].collect()
      .map(v => v.doc_id -> v.kept).toMap
    // on-time docs all verdict; the late duplicate gets NO verdict (its
    // signature rows were dropped at the watermark) — it can never appear
    // as a spurious "kept"
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) && got(2L) && got(3L))
  }

  test("dedup pipeline restarts from checkpoint: no loss, no duplication") {
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-dedup-ckpt").toString
    val (inDir, ckptDir, outDir) = (s"$root/in", s"$root/ckpt", s"$root/out")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))

    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => DocRow(r.getLong(0), r.getString(1), 1000L + r.getLong(0)))
      .take(200)
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = docs.sortBy(d => (d.ts_ms, d.doc_id)).map { d =>
      val sigs = bandSigs(d.text)
      val beaten = sigs.count(seen)
      seen ++= sigs
      d.doc_id -> ((beaten == 0, beaten.toLong))
    }.toMap
    val flush = DocRow(999999L, "zz zz zz flush sentinel doc zz", 100000000L)
    val arrival = new scala.util.Random(13).shuffle(docs.toSeq)

    def writeBatch(n: Int, batch: Seq[DocRow]): Unit =
      sp.createDataset(batch).coalesce(1).write.mode("overwrite")
        .json(f"$inDir/batch_$n%03d")

    def runOnce(): Unit = {
      val src = sp.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[DocRow]].schema)
        .option("maxFilesPerTrigger", "1")
        .json(s"$inDir/*")
      val q = StreamingDedup.minhashDedupStream(src, "30 seconds")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    arrival.grouped(50).zipWithIndex.take(2)
      .foreach { case (b, i) => writeBatch(i, b) }
    runOnce() // "failure" between the two runs
    arrival.grouped(50).zipWithIndex.drop(2)
      .foreach { case (b, i) => writeBatch(i, b) }
    writeBatch(99, Seq(flush))
    runOnce()

    val got = sp.read.parquet(outDir).as[DedupVerdict].collect()
    assert(got.map(_.doc_id).distinct.length == got.length,
      "duplicated verdicts after restart")
    assert(got.length == docs.length, s"${docs.length - got.length} verdicts lost")
    got.foreach { v =>
      assert((v.kept, v.n_bands_beaten) == expected(v.doc_id), s"doc ${v.doc_id}")
    }
  }
}
