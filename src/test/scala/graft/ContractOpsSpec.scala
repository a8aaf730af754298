package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational, Similarity}
import graft.sources.Tables

/** Independent Scala models for the sketch-contract queries: minhash
  * accuracy recomputed from raw text (own md5 hashing, own permutations,
  * own banding), IVF stats from a brute-force cosine argmax over raw
  * embeddings, unpivot from a direct collect.
  */
class ContractOpsSpec extends SparkSpec {

  private def md5Hash60(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("minhash accuracy == independent Scala sketch model") {
    val P = 1000000007L
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val shingles = docs.view.mapValues { t =>
      val w = t.split(" ", -1)
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSet
      else Set(w.mkString(" "))
    }.toMap
    val mh = shingles.view.mapValues { sh =>
      val hs = sh.map(s => md5Hash60(s) % P)
      (0 to 15).map(j => hs.map(h => (h * (j * 4097L + 1L) + j * 12289L + 7L) % P).min)
    }.toMap
    val ids = docs.keys.toSeq.sorted
    val cand = for {
      i <- ids; j <- ids if i < j
      if (0 to 3).exists(b => (4 * b to 4 * b + 3).forall(k => mh(i)(k) == mh(j)(k)))
    } yield (i, j)
    val model = cand.map { case (a, b) =>
      val m = (0 to 15).count(k => mh(a)(k) == mh(b)(k)).toLong
      val inter = (shingles(a) & shingles(b)).size.toLong
      val union = shingles(a).size + shingles(b).size - inter
      val est = m * 1000 / 16
      val exact = inter * 1000 / union
      (a, b) -> ((est, exact, (est - exact).abs))
    }.toMap
    val got = Dedup.minhashAccuracy(spark, sf0001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(model.contains(k), s"unexpected pair $k")
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) == model(k), s"pair $k")
    }
  }

  test("IVF stats == brute-force cosine argmax over raw embeddings") {
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def nrm(e: Array[Double]) = math.sqrt(e.foldLeft(0.0)((a, x) => a + x * x))
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    // fixed-K hash-min centroid model: 64 smallest portable id hashes
    val cents = vecs.keys.toSeq
      .sortBy(id => (md5Hash60(id.toString), id)).take(64).sorted
    val assign = vecs.keys.map { id =>
      val best = cents.map(c =>
        (-dot(vecs(id), vecs(c)) / (nrm(vecs(id)) * nrm(vecs(c))), c)).min
      id -> best._2
    }
    val buckets = assign.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val total = vecs.size.toLong
    val got = Similarity.ivfStats(spark, sf0001).collect()
    assert(got.length == buckets.size)
    got.foreach { r =>
      val c = r.getLong(0)
      assert(r.getLong(1) == buckets(c), s"bucket $c size")
      assert(r.getLong(2) == buckets(c) * 1000 / total, s"bucket $c share")
    }
    assert(got.map(_.getLong(1)).sum == total)
  }

  test("source mixture == Scala mixture model (weights, allocs, sample counts)") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySource = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTotal = docs.length.toLong
    val weight = bySource.view.mapValues(n => math.sqrt(n.toDouble).floor.toLong).toMap
    val wTotal = weight.values.sum
    val model = bySource.map { case (s, n) =>
      val alloc = (nTotal / 2) * weight(s) / wTotal
      val rate = math.min(1000L, alloc * 1000 / n)
      val sampled = docs.count { case (id, src) =>
        src == s && md5Hash60(s"mix:$id") % 1000 < rate
      }.toLong
      s -> ((n, weight(s), alloc, rate, sampled))
    }
    val got = graft.operators.Curation.sourceMixture(spark, sf0001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        == model(r.getString(0)), s"source ${r.getString(0)}")
    }
  }

  test("token budget == sequential prefix-sum model (BPE token counts)") {
    // Per-word token counts come from the learned BPE vocab (its training
    // is pinned against a brute-force model in SixthWaveSpec); THIS test
    // pins the budget arithmetic and the prefix-sum cut on top of it.
    val wt = graft.operators.TextAnalysis.bpeVocabFor(spark, sf0001)
      .select("word", "wt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ", -1).map(wt).sum))
      .sortBy(_._1)
    val budget = docs.map(_._2).sum * 6 / 10
    var cum = 0L
    val exp = docs.flatMap { case (id, n) =>
      cum += n
      if (cum <= budget) Some((id, n, cum)) else None
    }
    val got = graft.operators.Curation.tokenBudget(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
  }

  test("MAD outliers == per-group Scala model") {
    val rows = Tables.load(spark, sf0001, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def medianAtCeilHalf(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val model = rows.groupBy(_._1).map { case (t, vs) =>
      val v = vs.map(_._2).toSeq
      val med = medianAtCeilHalf(v)
      val dv = v.map(x => (x - med).abs)
      val mad = medianAtCeilHalf(dv)
      t -> ((med, mad, v.size.toLong, dv.count(_ > 3 * mad).toLong))
    }
    val got = graft.operators.Analytics.madOutliers(spark, sf0001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        == model(r.getString(0)), s"type ${r.getString(0)}")
    }
  }

  test("A/B lift == Scala split + conversion model") {
    val rows = Tables.load(spark, sf0001, "events")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = rows.map(_._1).distinct
    def grp(u: Long) = if (md5Hash60(s"ab:$u") % 2 == 0) "control" else "treatment"
    val purch = rows.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.length).toMap
    val per = users.groupBy(grp).map { case (g, us) =>
      val conv = us.count(u => purch.getOrElse(u, 0) > 13).toLong
      g -> ((us.length.toLong, conv, conv * 1000 / us.length))
    }
    val ctl = per("control")._3
    val got = graft.operators.Analytics.abLift(spark, sf0001).collect()
    assert(got.length == per.size)
    got.foreach { r =>
      val exp = per(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
        == ((exp._1, exp._2, exp._3, exp._3 - ctl)), s"grp ${r.getString(0)}")
    }
  }

  test("log2 latency histogram == Scala bit-length model") {
    val vs = Tables.msgs(spark, sf0001)
      .select("start_at_ms", "end_at_ms").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (s, e) => e >= s }
      .map { case (s, e) => e - s + 1 }
    val model = vs.groupBy(v => 64 - java.lang.Long.numberOfLeadingZeros(v))
      .map { case (b, xs) => b.toLong -> ((xs.length.toLong, xs.min, xs.max)) }
    val got = graft.operators.Analytics.latencyLog2(spark, sf0001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == model(r.getLong(0)),
        s"bucket ${r.getLong(0)}")
    }
  }

  test("type-pair Jaccard == Scala set model") {
    val rows = Tables.load(spark, sf0001, "events")
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = byType.keys.toSeq.sorted
    val model = (for {
      a <- types; b <- types if a < b
      inter = (byType(a) & byType(b)).size.toLong
      if inter > 0 // zero-intersection pairs drop from the join by design
      union = (byType(a) | byType(b)).size.toLong
    } yield (a, b) -> ((inter, union, inter * 1000 / union))).toMap
    val got = graft.operators.Analytics.typeUserJaccard(spark, sf0001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      assert((r.getLong(2), r.getLong(3), r.getLong(4))
        == model((r.getString(0), r.getString(1))))
    }
  }

  test("DAU/WAU == Scala sliding-window model") {
    val rows = Tables.load(spark, sf0001, "events")
      .select(col("user_id"), (expr("(ts div 1000000)") / lit(86400000L))
        .cast("long").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDay = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val days = byDay.keys.toSeq.sorted
    val got = graft.operators.Analytics.dauWau(spark, sf0001).collect()
    assert(got.length == days.length)
    got.foreach { r =>
      val d = r.getLong(0)
      val dau = byDay(d).size.toLong
      val wau = (d - 6 to d).flatMap(byDay.get).flatten.distinct.size.toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3))
        == ((dau, wau, dau * 1000 / wau)), s"day $d")
    }
  }

  test("doc fluency == Scala corpus-LM model") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val uni = docs.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = docs.values.map(_.size).sum.toLong
    val allBigrams = docs.values.toSeq.flatMap(w => w.zip(w.tail))
    val big = allBigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val model = docs.collect { case (id, w) if w.length >= 2 =>
      val scores = w.zip(w.tail).map { case (a, b) =>
        big((a, b)) * nTotal * 100 / (uni(a) * uni(b))
      }
      id -> ((scores.length.toLong, scores.sum, scores.sum / scores.length))
    }
    val got = graft.operators.TextAnalysis.docFluency(spark, sf0001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == model(r.getLong(0)),
        s"doc ${r.getLong(0)}")
    }
  }

  test("time-to-convert == Scala first-touch model") {
    val rows = Tables.load(spark, sf0001, "events")
      .where(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_type"), expr("(ts div 1000000)").as("em"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    val deltas = byUser.flatMap { case (u, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val fv = views.min
        val p = es.filter(e => e._2 == "purchase" && e._3 >= fv).map(_._3 - fv)
        if (p.isEmpty) None else Some(u -> p.min)
      }
    }
    val model = deltas.groupBy(_._1 % 8).map { case (c, ds) =>
      val sorted = ds.map(_._2).toSeq.sorted
      c -> ((sorted.size.toLong, sorted((sorted.size + 1) / 2 - 1)))
    }
    val got = graft.operators.Analytics.timeToConvert(spark, sf0001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == model(r.getLong(0)),
        s"cohort ${r.getLong(0)}")
    }
  }

  test("peak concurrency == brute-force interval sweep model") {
    val msgs = Tables.msgs(spark, sf0001)
      .select("dst_ip", "start_at_ms", "end_at_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .filter { case (_, s, e) => e >= s }
    val model = msgs.groupBy(_._1).map { case (ip, iv) =>
      val events = iv.flatMap { case (_, s, e) => Seq((s, 1L), (e + 1, -1L)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      var cur = 0L; var peak = 0L
      events.foreach { case (_, d) => cur += d; if (cur > peak) peak = cur }
      ip -> ((peak, iv.length.toLong))
    }
    val expTop = model.toSeq.sortBy { case (ip, (p, _)) => (-p, ip) }.take(20)
    val got = graft.operators.ChainLink.peakConcurrency(spark, sf0001).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
    assert(got.toSeq == expTop)
  }

  test("unpivot == direct collect model") {
    val rows = Tables.load(spark, sf0001, "events")
      .select((expr("(ts div 1000000)") / lit(86400000L)).cast("long").as("day"),
        col("user_id"), round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDay = rows.groupBy(_._1)
    val exp = byDay.flatMap { case (d, rs) =>
      Seq((d, "n_events", rs.size.toLong),
        (d, "n_users", rs.map(_._2).distinct.size.toLong),
        (d, "value_cents", rs.map(_._3).sum))
    }.toSet
    val got = Relational.qUnpivotDaily(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == exp)
  }
}
