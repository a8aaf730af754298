package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Corpus
import graft.sources.Tables
import graft.streaming.{ParaDocStats, StreamingDedup}

/** Streaming paragraph dedup ≡ the batch `q_para_dedup` operator on the
  * same corpus, under shuffled multi-batch arrival. With ts_ms strictly
  * increasing in doc_id, the streaming ownership order (ts, doc_id, pos)
  * coincides with the batch winner rule min(doc_id, pos), so the per-doc
  * stats rows must match exactly.
  */
class StreamingParaDedupSpec extends SparkSpec {

  test("streaming para dedup == batch q_para_dedup under shuffled arrival") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]

    val expected = Corpus.paraDedup(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => DocRow(r.getLong(0), r.getString(1), 1000L + r.getLong(0)))

    val rnd = new scala.util.Random(11)
    val batches = rnd.shuffle(docs.toSeq).grouped(120).toSeq
    val flush = DocRow(999999L, "zz zz zz zz flush sentinel doc zz zz zz",
      100000000L)

    val input = MemoryStream[DocRow]
    val out = StreamingDedup.paraDedupStream(
      input.toDS().toDF(), maxOutOfOrder = "30 seconds")
    val name = s"para_out_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      input.addData(Seq(flush)); q.processAllAvailable()
    } finally q.stop()

    val got = sp.table(name).as[ParaDocStats].collect()
      .filter(_.doc_id != flush.doc_id)
      .map(s => s.doc_id -> ((s.n_paras, s.n_removed, s.kept_chars))).toMap
    assert(got.size == expected.size,
      s"expected ${expected.size} docs, got ${got.size}")
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"doc $id: got $v expected ${expected(id)}")
    }
    // the corpus genuinely contains repeated paragraphs — the test is vacuous
    // otherwise
    assert(got.values.map(_._2).sum > 0, "no paragraph was ever removed")
  }

  test("within-doc repeats: first block owns, later blocks removed") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      sp.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val para = "alpha beta gamma delta epsilon zeta eta theta" // one 8-word block
    val docs = Seq(
      DocRow(1L, para + " " + para, 1001L), // same block twice in one doc
      DocRow(2L, para, 1002L))              // and again in a later doc
    val flush = DocRow(99L, "zz zz zz zz zz zz zz flush", 100000000L)

    val input = MemoryStream[DocRow]
    val out = StreamingDedup.paraDedupStream(input.toDS().toDF())
    val name = s"para_wd_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(docs); q.processAllAvailable()
      input.addData(Seq(flush)); q.processAllAvailable()
    } finally q.stop()

    val got = sp.table(name).as[ParaDocStats].collect()
      .filter(_.doc_id < 99L).map(s => s.doc_id -> s).toMap
    assert(got(1L).n_paras == 2 && got(1L).n_removed == 1 &&
      got(1L).kept_chars == para.length.toLong)
    assert(got(2L).n_paras == 1 && got(2L).n_removed == 1 &&
      got(2L).kept_chars == 0L)
  }
}
