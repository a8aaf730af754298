package graft

import graft.operators.Corpus
import graft.sources.Tables

/** Brute-force Scala models for the corpus-hygiene reports: 3-gram
  * document frequency, cross-source overlap, length-histogram drift, and
  * LPT striping recomputed directly from the raw documents.
  */
class CorpusSpec extends SparkSpec {

  private def docsRaw: Map[Long, (String, String)] =
    Tables.load(spark, sf001, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap

  private def grams(text: String): Seq[String] = {
    val w = text.split(" ", -1)
    if (w.length < 3) Seq.empty
    else w.sliding(3).map(_.mkString(" ")).toSeq.distinct
  }

  test("boilerplate grams == per-source Scala model (df >= 3)") {
    val docs = docsRaw
    val perDoc = docs.map { case (id, (_, t)) => id -> grams(t) }
    val df = perDoc.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    val common = df.filter(_._2 >= Corpus.BoilerplateDf).keySet
    val bySrc = perDoc.filter(_._2.nonEmpty).toSeq
      .map { case (id, g) =>
        (docs(id)._1, g.size.toLong, g.count(common).toLong) }
      .groupBy(_._1)
    val model = bySrc.map { case (src, rows) =>
      val nSh = rows.map(_._2).sum
      val nC = rows.map(_._3).sum
      src -> ((rows.size.toLong, nSh, nC, 1000 * nC / nSh,
        rows.count(r => 2 * r._3 >= r._2).toLong))
    }
    val got = Corpus.boilerplateGrams(spark, sf001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      val exp = model(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == exp, s"source ${r.getString(0)}")
    }
    // the threshold must discriminate: some but not all grams are common
    assert(common.nonEmpty && common.size < df.size)
  }

  test("source overlap == pairwise Scala model over the df-capped index") {
    val docs = docsRaw
    val perDoc = docs.map { case (id, (_, t)) => id -> grams(t) }
    val df = perDoc.values.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    val kept = df.filter(_._2 <= 64).keySet
    val bySrc = perDoc.toSeq
      .flatMap { case (id, g) => g.filter(kept).map(docs(id)._1 -> _) }
      .groupBy(_._1).map { case (s, gs) => s -> gs.map(_._2).toSet }
    val pairs = (for {
      (sa, ga) <- bySrc.toSeq; (sb, gb) <- bySrc.toSeq if sa < sb
      shared = (ga & gb).size.toLong if shared > 0
    } yield (sa, sb, ga.size.toLong, gb.size.toLong, shared,
        1000 * shared / (ga.size + gb.size - shared)))
      .sortBy(p => (-p._5, p._1, p._2)).take(20)
    val got = Corpus.sourceOverlap(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // the driver's compare is order-insensitive within the top-k cut and
    // the sort key is total, so exact sequence equality must hold here
    assert(got.toSeq == pairs, s"got ${got.toSeq}")
  }

  test("source drift == histogram L1 Scala model") {
    val docs = docsRaw
    val bucket = docs.map { case (id, (_, t)) =>
      id -> math.min(t.split(" ", -1).length / 8, 15).toLong }
    val n = docs.size.toLong
    val byAll = bucket.values.groupBy(identity).map { case (b, o) => b -> o.size.toLong }
    val bySrc = docs.toSeq.map { case (id, (s, _)) => (s, bucket(id)) }
      .groupBy(_._1).map { case (s, bs) =>
        s -> bs.map(_._2).groupBy(identity).map { case (b, o) => b -> o.size.toLong } }
    val model = bySrc.map { case (s, h) =>
      val ns = h.values.sum
      s -> ((ns, byAll.keys.toSeq.map(b =>
        math.abs(1000 * h.getOrElse(b, 0L) / ns - 1000 * byAll(b) / n)).sum))
    }
    val got = Corpus.sourceDrift(spark, sf001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == model(r.getString(0)),
        s"source ${r.getString(0)}")
    }
  }

  test("ngram novelty == first-occurrence Scala model; monotone start") {
    val docs = docsRaw
    val perDoc = docs.map { case (id, (_, t)) => id -> grams(t) }
      .filter(_._2.nonEmpty)
    val firstDoc = perDoc.toSeq.flatMap { case (id, g) => g.map(_ -> id) }
      .groupBy(_._1).map { case (g, o) => g -> o.map(_._2).min }
    val model = perDoc.map { case (id, g) =>
      val novel = g.count(s => firstDoc(s) == id).toLong
      id -> ((g.size.toLong, novel, 1000 * novel / g.size))
    }
    val got = Corpus.ngramNovelty(spark, sf001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == model(r.getLong(0)),
        s"doc ${r.getLong(0)}")
    }
    // the smallest doc_id is all-novel by construction
    val first = got.minBy(_.getLong(0))
    assert(first.getLong(3) == 1000L)
  }

  test("prefix dups == brute-force containment scan; finds planted pairs") {
    val docs = docsRaw
    val model = (for {
      (ia, (_, ta)) <- docs.toSeq; (ib, (_, tb)) <- docs.toSeq
      if ta.length >= Corpus.PrefixKeyLen
      if tb.length >= Corpus.PrefixKeyLen
      if ta.length < tb.length || (ta.length == tb.length && ia < ib)
      if tb.startsWith(ta)
    } yield (ia, ib, ta.length.toLong, tb.length.toLong))
      .sortBy(p => (p._1, p._2))
    val got = Corpus.prefixDups(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == model, s"got ${got.toSeq}")
    // the generator plants truncation dups — the operator must find some
    assert(model.nonEmpty)
  }

  test("para dedup == brute-force first-wins Scala model over 8-word blocks") {
    val docs = docsRaw
    // (doc_id, pos, paragraph) for every qualifying block, in corpus order
    val blocks = docs.toSeq.flatMap { case (id, (_, t)) =>
      val w = t.split(" ", -1)
      w.grouped(Corpus.ParaWords).zipWithIndex.collect {
        case (b, i) if b.length >= Corpus.MinParaWords =>
          (id, i.toLong, b.mkString(" "))
      }
    }
    // first occurrence of each paragraph TEXT wins (hash is injective here
    // in the model; the operator hashes — collision-free at this scale)
    val winner = blocks.groupBy(_._3).map { case (p, os) =>
      p -> os.map(o => (o._1, o._2)).min }
    val model = blocks.groupBy(_._1).map { case (id, bs) =>
      val kept = bs.filter(b => winner(b._3) == ((b._1, b._2)))
      id -> ((bs.size.toLong, (bs.size - kept.size).toLong,
        kept.map(_._3.length.toLong).sum))
    }
    val got = Corpus.paraDedup(spark, sf001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      val exp = model(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == exp,
        s"doc ${r.getLong(0)}")
    }
    // the corpus must actually contain cross-document repeats to dedup
    assert(model.values.map(_._2).sum > 0)
  }

  test("pack bins: exact LPT striping and near-even token balance") {
    val docs = docsRaw
    val toks = docs.toSeq.map { case (id, (_, t)) =>
      id -> t.split(" ", -1).length.toLong }
    val ranked = toks.sortBy { case (id, n) => (-n, id) }.zipWithIndex
    val model = ranked.groupBy(_._2 % Corpus.PackShards).map { case (b, rows) =>
      b.toLong -> ((rows.size.toLong, rows.map(_._1._2).sum)) }
    val total = toks.map(_._2).sum
    val got = Corpus.packBins(spark, sf001).collect()
    assert(got.length == Corpus.PackShards)
    got.foreach { r =>
      val exp = model(r.getLong(0))
      assert((r.getLong(1), r.getLong(2)) == exp, s"shard ${r.getLong(0)}")
      assert(r.getLong(3) == Corpus.PackShards * 1000 * exp._2 / total)
      // LPT balance: every shard within 20% of even on this tiny corpus
      assert(math.abs(r.getLong(3) - 1000) <= 200, s"imbalanced: $r")
    }
  }
}
