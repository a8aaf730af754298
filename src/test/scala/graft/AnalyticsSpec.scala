package graft

import graft.operators.Analytics
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Second-wave analytics operators vs brute-force Scala references on
  * sf0.001 (the DuckDB oracle pins exact cross-engine equality at sf0.01;
  * these specs pin the semantics against an independent in-memory model).
  */
class AnalyticsSpec extends SparkSpec {

  test("asof join == brute-force most-recent-view-at-or-before") {
    val ev = Tables.load(spark, sf0001, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000000").as("em"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val views = ev.filter(_._4 == "view")
    val expected = ev.filter(_._4 == "purchase").map { case (id, u, em, _) =>
      val prior = views.filter(v => v._2 == u && v._3 <= em)
      if (prior.isEmpty) (id, u, em, -1L, -1L)
      else {
        val best = prior.maxBy(v => (v._3, v._1)) // latest ms, then max id
        (id, u, em, best._1, best._3)
      }
    }.sortBy(_._1).toSeq
    val got = Analytics.asofLastView(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
  }

  test("overlap count == brute-force quadratic overlap scan") {
    val msgs = Tables.msgs(spark, sf0001)
      .where(col("end_at_ms") >= col("start_at_ms"))
      .select("id", "src_ip", "start_at_ms", "end_at_ms")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = msgs.map { case (id, ip, s, e) =>
      id -> msgs.count(o => o._1 != id && o._2 == ip && s <= o._4 && o._3 <= e).toLong
    }.sortBy(_._1).toSeq
    val got = Analytics.overlapCount(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("percentiles: ranks hit the ceil(p*n) element of the sorted group") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = li.groupBy(_._1).map { case (rf, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      def at(num: Long, den: Long) = sorted(((num + den - 1) / den - 1).toInt)
      (rf, at(n, 4), at(n, 2), at(9L * n, 10), sorted.last, n.toLong)
    }.toSeq.sortBy(_._1)
    val got = Analytics.quantityPercentiles(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
  }

  test("lsh cosine: verified candidates are a non-empty subset of exact pairs >= 0.45") {
    val exact = operators.Dedup.normedFor(spark, sf0001)
      .as("a").join(operators.Dedup.normedFor(spark, sf0001).as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        (graft.functions.VectorOps.dot(col("a.e"), col("b.e")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .where(col("cos") >= 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Analytics.lshCosine(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet.subsetOf(exact), "LSH produced a false positive")
    assert(got.length == got.toSet.size, "duplicate pairs")
    // deterministic corpus → the contract must bite (non-empty) and pin
    // the observed 4-bit-band recall (3 of 7 exact pairs at sf0.001) so
    // collapses surface; 4-band/4-bit SRP at cos 0.45 is a ~0.5-recall
    // design point by construction, so the pin is recall ≥ 1/3
    assert(got.nonEmpty, "LSH contract is vacuous (0 rows) at sf0.001")
    assert(got.length * 3 >= exact.size,
      s"recall collapsed: ${got.length}/${exact.size}")
  }

  test("pivot row sums == per-bucket event counts") {
    val totals = Tables.load(spark, sf0001, "events")
      .groupBy((col("user_id") % 8).as("bucket")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Analytics.pivotEventCounts(spark, sf0001).collect().foreach { r =>
      val sum = (1 to 5).map(r.getLong).sum
      assert(sum == totals(r.getLong(0)))
    }
  }

  test("tfidf top term: unique row per doc, score consistent with tf/df") {
    val rows = Analytics.tfidfTopTerm(spark, sf0001).collect()
    val docs = Tables.load(spark, sf0001, "documents").count()
    assert(rows.length == docs)
    rows.foreach { r =>
      assert(r.getLong(4) == r.getLong(2) * 1000000L / r.getLong(3))
    }
  }

  test("funnel stages count users by deepest ordered subsequence") {
    // brute-force the stage over the same event subset, per user
    val ev = Tables.load(spark, sf0001, "events")
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), expr("ts div 1000000").as("em"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val stages = ev.groupBy(_._1).map { case (_, es) =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4.head).mkString
      if (seq.matches(".*v.*c.*p.*")) 3L
      else if (seq.matches(".*v.*c.*")) 2L
      else if (seq.contains("v")) 1L
      else 0L
    }
    val expected = stages.groupBy(identity)
      .map { case (k, v) => (k, v.size.toLong) }
    val got = graft.operators.Analytics.funnelStages(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
    assert(got.keySet.exists(_ >= 2), "fixture should reach stage 2+")
  }

  test("lshBandBits: integer form equals ceil-log2 closed form, clamped to [4,16]") {
    // The SQL oracle mirrors the same integer comparison (smallest b in
    // [4,16] with 256*2^b >= N), so this pins the Scala side to the
    // mathematical definition across the decades and the clamp edges.
    def closedForm(n: Long): Int = {
      // exact integer ceil-log2 of ceil(n/256), clamped
      val m = (n + 255L) / 256L
      var b = 0
      while ((1L << b) < m) b += 1
      math.min(16, math.max(4, b))
    }
    val interesting = Seq(1L, 200L, 2000L, 2048L, 4095L, 4096L, 4097L,
      20000L, 200000L, 256L << 4, (256L << 4) + 1, 256L << 7,
      (256L << 7) + 1, 256L << 16, (256L << 16) + 1, Long.MaxValue / 4)
    for (n <- interesting ++ (1L to 10000L by 37L))
      assert(graft.operators.Analytics.lshBandBits(n) == closedForm(n),
        s"n=$n")
    // the pinned values the oracles and the curve rely on
    assert(graft.operators.Analytics.lshBandBits(200L) == 4)    // sf0.01
    assert(graft.operators.Analytics.lshBandBits(2000L) == 4)   // sf0.1
    assert(graft.operators.Analytics.lshBandBits(20000L) == 7)  // sf1.0
  }

  test("adaptive index sizes: pinned at oracle scales, growing beyond") {
    import graft.operators.Similarity.{centroidKFor, panelStep}
    assert(centroidKFor(200L) == 64 && panelStep(200L) == 20L)    // sf0.01
    assert(centroidKFor(2000L) == 64 && panelStep(2000L) == 20L)  // sf0.1
    assert(centroidKFor(20000L) == 198 && panelStep(20000L) == 200L) // sf1.0
    // the exact-audit stride (Dedup.exactPairsFor's cap formula)
    def stride(n: Long) = math.max(1L, (n + 1999L) / 2000L)
    assert(stride(2000L) == 1L && stride(20000L) == 10L)
  }
}
