package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, ChainLink, Graph, Relational, RuntimeFilter, TextAnalysis}
import graft.sources.Tables

/** Brute-force models for the fourth-wave operators: integer PageRank
  * recomputed in plain Scala from the links relation, triangles by direct
  * enumeration, the bloom-prefiltered semi-join against the unfiltered
  * join, skyline by O(n²) dominance, streaks/dup-grams by per-key Scala.
  */
class GraphOpsSpec extends SparkSpec {

  test("pageRank == plain-Scala integer recurrence on the links graph") {
    val edges = ChainLink.linksFor(spark, sf0001)
      .select("parent_id", "child_id").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val nodes = Tables.msgs(spark, sf0001).select("id").collect()
      .map(_.getString(0))
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    def step(r: Map[String, Long]): Map[String, Long] = {
      val contrib = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (p, _) => 850L * (r(p) / outdeg(p)) }.sum
      }.toMap
      nodes.map(n => n -> (150L + contrib.getOrElse(n, 0L) / 1000L)).toMap
    }
    val r1 = step(nodes.map(_ -> 1000L).toMap)
    val r2 = step(r1)
    val got = Graph.pageRank(spark, sf0001).collect()
    assert(got.length == nodes.length)
    got.foreach { r =>
      val id = r.getString(0)
      assert(r.getLong(1) == r1(id), s"pr_prev mismatch at $id")
      assert(r.getLong(2) == r2(id), s"pr mismatch at $id")
    }
  }

  test("triangles == direct enumeration over the co-occurrence graph") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keySet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triCount = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((u, v) <- edges; w <- adj.getOrElse(v, Set.empty) if edges((u, w))) {
      triCount(u) += 1; triCount(v) += 1; triCount(w) += 1
    }
    val expTop = triCount.toSeq.sortBy { case (pk, n) => (-n, pk) }.take(20)
    val got = Graph.triangles(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expTop)
  }

  test("bloom-prefiltered semi-join == plain semi-join (exactness)") {
    val got = RuntimeFilter.bloomSemiRevenue(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val o = Tables.load(spark, sf0001, "orders")
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val li = Tables.load(spark, sf0001, "lineitem")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == plain.toSeq)
  }

  test("bloom build on an empty key set yields the all-reject bitmap") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("k")
    val bits = RuntimeFilter.build(empty).head().getSeq[Long](0)
    assert(bits.length == 16 && bits.forall(_ == 0L),
      "empty build side must produce an all-zero (reject-everything) bitmap, not NULLs")
  }

  test("skyline == O(n²) strict-dominance model") {
    val parts = Tables.load(spark, sf0001, "part")
      .select(col("p_partkey"), round(col("p_retailprice") * 100).cast("long"),
        col("p_size").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exp = parts.filter { case (_, pc, sz) =>
      !parts.exists { case (_, pc2, sz2) =>
        pc2 <= pc && sz2 >= sz && (pc2 < pc || sz2 > sz)
      }
    }.sortBy { case (pk, pc, _) => (pc, pk) }
    val got = Relational.qSkylineParts(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq)
  }

  test("activity streaks == per-user Scala gaps-and-islands") {
    val days = Tables.load(spark, sf0001, "events")
      .select(col("user_id"), Tables.epochMsBucket(86400000L).as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    def runs(sorted: Seq[Long]): Seq[Long] = {
      val out = scala.collection.mutable.ListBuffer.empty[Long]
      var len = 0L
      var prev = Long.MinValue
      sorted.foreach { d =>
        if (d == prev + 1) len += 1 else { if (len > 0) out += len; len = 1 }
        prev = d
      }
      if (len > 0) out += len
      out.toSeq
    }
    val model = days.groupBy(_._1).map { case (u, ds) =>
      val r = runs(ds.map(_._2).sorted)
      u -> ((r.sum, r.length.toLong, r.max))
    }
    val got = Analytics.activityStreaks(spark, sf0001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      val exp2 = model(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == exp2,
        s"user ${r.getLong(0)}")
    }
  }

  test("dup-ngram fraction == per-doc Scala model") {
    val docs = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val model = docs.collect { case (id, text) =>
      val w = text.split(" ", -1)
      val grams = w.sliding(3).map(_.mkString(" ")).toSeq
      id -> ((w.length.toLong, w.distinct.length.toLong,
        grams.length.toLong, (grams.length - grams.distinct.length).toLong))
    }.filter(_._2._1 >= 3)
    val got = TextAnalysis.dupNgramFraction(spark, sf0001).collect()
    assert(got.length == model.size)
    got.foreach { r =>
      val (nw, ndw, ng, ndg) = model(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((nw, ndw, ng, ndg)), s"doc ${r.getLong(0)}")
      assert(r.getLong(5) == 100 * (nw - ndw) / nw)
      assert(r.getLong(6) == 100 * ndg / ng)
    }
  }
}
