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

  test("lshBandPlan: first capacity-order fit, capped, bucket window bounded") {
    // The SQL oracle mirrors the same integer comparison (smallest (b, j)
    // in capacity order with 2^(b+10) >= N*(8-j), encoded 4b+j), so this
    // pins the Scala side to the mathematical definition across the
    // decades and the clamp edges.
    import graft.operators.Analytics.lshBandPlan
    def closedForm(n: Long): (Int, Int) = {
      val all = for { b <- 4 to 15; j <- 0 to 3 } yield (b, j)
      (all :+ ((16, 0))).find { case (b, j) =>
        b == 16 || (1024L << b) >= n * (8 - j)
      }.get
    }
    val interesting = Seq(1L, 200L, 2000L, 2048L, 2049L, 4095L, 4096L,
      4097L, 20000L, 200000L, 1024L << 4, (1024L << 4) + 1, 1024L << 7,
      (1024L << 7) + 1, (1024L << 15) / 5, (1024L << 15) / 5 + 1,
      (1024L << 16) / 8, (1024L << 16) / 8 + 1)
    for (n <- interesting ++ (1L to 10000L by 37L))
      assert(lshBandPlan(n) == closedForm(n), s"n=$n")
    // the pinned values the oracles and the curve rely on: (4,0) —
    // byte-identical to the old uniform bits=4 plan — at both gate scales
    assert(lshBandPlan(200L) == ((4, 0)))     // sf0.01
    assert(lshBandPlan(2000L) == ((4, 0)))    // sf0.1
    assert(lshBandPlan(20000L) == ((7, 2)))   // sf1.0
    assert(lshBandPlan(200000L) == ((10, 3))) // sf10
    // expected per-vector candidate volume N*(8-j)/2^(b+1) stays inside
    // a fixed window for every corpus size up to the (16,0) cap — the
    // structural claim that makes the candidate join linear in N
    for (n <- 2048L to ((1024L << 15) / 5) by 997L) {
      val (b, j) = lshBandPlan(n)
      val pvc = n.toDouble * (8 - j) / (1L << (b + 1)).toDouble
      assert(pvc <= 512.0 + 1e-9, s"n=$n pvc=$pvc")
      // trough right after the largest capacity step ((b,3)->(b+1,0),
      // ratio 5/4) is 512/1.25 = 409.6
      assert(pvc > 409.0, s"n=$n pvc=$pvc")
    }
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
