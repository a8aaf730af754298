package graft

import org.apache.spark.sql.functions._
import graft.operators.{Scrub, Similarity, TextAnalysis}
import graft.sources.Tables

/** Brute-force models for the round-3 curation/embedding operators:
  * quality gates recomputed per-doc in plain Scala, quantization checked
  * against its reconstruction-error bound, Zipf table against direct
  * counting.
  */
class QualityOpsSpec extends SparkSpec {

  test("pii scrub == per-source Scala regex model; residual is zero") {
    val docs = Tables.load(spark, sf001, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val model = docs.map { case (id, src, text) =>
      val dirty = text +
        (if (id % 3 == 0) s" reach user$id@example.com" else "") +
        (if (id % 5 == 0) f" call 800-555-${id % 10000}%04d" else "") +
        (if (id % 7 == 0) s" from 10.0.${id % 256}.${id % 250 + 1}" else "") +
        (if (id % 11 == 0) s" token sk-${md5hex(s"key:$id").take(16)}" else "")
      val per = Scrub.Families.map { case (_, re, _) =>
        re.r.findAllIn(dirty).toSeq }
      val clean = Scrub.Families.foldLeft(dirty) { case (c, (_, re, tok)) =>
        c.replaceAll(re, java.util.regex.Matcher.quoteReplacement(tok)) }
      val residual = Scrub.Families.map { case (_, re, _) =>
        re.r.findAllIn(clean).size.toLong }.sum
      (src, per.map(_.size.toLong), per.flatten.map(_.length.toLong).sum,
        residual)
    }.groupBy(_._1).map { case (src, rows) =>
      src -> ((rows.size.toLong,
        rows.toSeq.map(_._2).transpose.map(_.sum),
        rows.map(_._3).sum, rows.map(_._4).sum))
    }
    val got = Scrub.piiScrub(spark, sf001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      val (nDocs, fams, chars, resid) = model(r.getString(0))
      assert(r.getLong(1) == nDocs, s"n_docs ${r.getString(0)}")
      assert(Seq(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        == fams, s"family counts ${r.getString(0)}")
      assert(r.getLong(6) == chars, s"chars_removed ${r.getString(0)}")
      assert(r.getLong(7) == resid && resid == 0L,
        s"residual ${r.getString(0)}")
    }
    // every family must have true positives somewhere in the corpus
    val totals = got.toSeq.map(r => Seq(r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))).transpose.map(_.sum)
    assert(totals.forall(_ > 0), s"family totals $totals")
  }

  test("quality filter == per-doc Scala model (gates, order of rules, keep flag)") {
    val docs = Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val model = docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      val nWords = w.length.toLong
      val wordChars = text.length.toLong - (nWords - 1)
      val mwl10 = 10 * wordChars / nWords
      val topN = w.groupBy(identity).values.map(_.length).max.toLong
      val topPct = 100 * topN / nWords
      val stop = w.count(Set("the", "a", "of", "and")).toLong
      val reason =
        if (nWords < 20) "too_short"
        else if (nWords > 90) "too_long"
        else if (mwl10 < 30 || mwl10 > 80) "word_len"
        else if (topPct > 15) "repetition"
        else if (stop == 0) "no_stopword"
        else "ok"
      id -> ((nWords, mwl10, topPct, stop, reason, if (reason == "ok") 1L else 0L))
    }
    val got = TextAnalysis.qualityFilter(spark, sf001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val exp = model(id)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5), r.getLong(6)) == exp, s"doc $id")
    }
    // the gate thresholds must actually discriminate on this corpus
    val reasons = got.map(_.getString(5)).toSet
    assert(reasons.contains("ok") && reasons.size >= 2)
  }

  test("int8 quantization: reconstruction error within half a scale step") {
    val v = Tables.load(spark, sf001, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val dims = v.values.head.length
    val maxabs = Array.tabulate(dims)(d => v.values.map(e => math.abs(e(d))).max)
    val got = Similarity.vectorQuantize(spark, sf001).collect()
    assert(got.length == v.size * dims)
    got.foreach { r =>
      val (id, d, q) = (r.getLong(0), r.getLong(1).toInt, r.getLong(2))
      assert(math.abs(q) <= 127, s"q out of int8 range: $q")
      val deq = q * maxabs(d) / 127.0
      assert(math.abs(deq - v(id)(d)) <= maxabs(d) / 127.0 / 2 + 1e-12,
        s"vec $id dim $d: reconstruction error beyond half step")
    }
  }

  test("zipf table == direct counting, ranks dense and frequency-sorted") {
    val counts = Tables.load(spark, sf001, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(30)
    val got = TextAnalysis.zipfTerms(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (1L to got.length))
    got.zip(expected).foreach { case ((rk, term, freq, rxf), (et, ef)) =>
      assert(term == et && freq == ef && rxf == rk * freq)
    }
  }
}
