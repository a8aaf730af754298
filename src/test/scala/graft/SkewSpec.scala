package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salting must never change results — only the distribution of work. */
class SkewSpec extends SparkSpec {

  private def skewed = {
    val sp = spark
    import sp.implicits._
    // 90% of rows share key "hot"
    (0 until 2000).map { i =>
      val k = if (i % 10 == 0) s"cold_${i % 50}" else "hot"
      (k, i.toLong, s"v${i % 97}")
    }.toDF("k", "n", "v")
  }

  private def dim = {
    val sp = spark
    import sp.implicits._
    (Seq(("hot", "H")) ++ (0 until 50).map(i => (s"cold_$i", s"C$i")))
      .toDF("k", "label")
  }

  test("shingle df cap bounds boilerplate posting lists") {
    val sp = spark
    import sp.implicits._
    // 200 docs, each carrying the same boilerplate shingle (hash 1) plus
    // one unique shingle — the license-header corpus shape that makes an
    // uncapped inverted index quadratic
    val shh = (1 to 200).flatMap(i =>
      Seq((i.toLong, 1L), (i.toLong, 1000L + i))).toDF("doc_id", "h")
    def candidatePairs(idx: org.apache.spark.sql.DataFrame): Long =
      idx.as("a").join(idx.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id")).count()
    // uncapped: the boilerplate key alone yields 200*199/2 candidates
    assert(candidatePairs(shh) == 19900L)
    val capped = graft.operators.Dedup.dfCapped(shh, 64)
    // the boilerplate posting list is dropped, discriminative ones kept
    assert(capped.where(col("h") === 1L).count() == 0L)
    assert(capped.count() == 200L)
    assert(candidatePairs(capped) == 0L)
    // a posting list AT the cap survives untouched
    val atCap = (1 to 64).flatMap(i =>
      Seq((i.toLong, 1L), (i.toLong, 1000L + i))).toDF("doc_id", "h")
    assert(graft.operators.Dedup.dfCapped(atCap, 64).count() == 128L)
  }

  test("saltedJoinPositional == plain join on skewed data (any salt)") {
    val plain = skewed.join(dim, "k")
      .select("k", "n", "v", "label")
      .collect().map(_.toSeq).toSet
    Seq(1, 4, 16).foreach { s =>
      val salted = Skew.saltedJoinPositional(skewed, dim, "k", s)
        .select("k", "n", "v", "label")
        .collect().map(_.toSeq).toSet
      assert(salted == plain, s"salt=$s diverged")
    }
    // the salt must be part of the physical join key
    val p = Skew.saltedJoinPositional(skewed, dim, "k", 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("__graft_salt"), "salt not in the plan")
  }

  test("saltedJoin with content-derived salt == plain join, and spreads the hot key") {
    val plain = skewed.join(dim, "k")
      .select("k", "n", "v", "label")
      .collect().map(_.toSeq).toSet
    Seq(1, 4, 16).foreach { s =>
      val salted = Skew.saltedJoin(skewed, dim, "k", s, Seq(col("n")))
        .select("k", "n", "v", "label")
        .collect().map(_.toSeq).toSet
      assert(salted == plain, s"salt=$s diverged")
    }
    // the hash salt actually fans the hot key out across sub-keys
    val spread = skewed
      .withColumn("salt", pmod(xxhash64(col("k"), col("n")), lit(8L)).cast("int"))
      .where(col("k") === "hot")
      .select("salt").distinct().count()
    assert(spread > 1, s"hot key not spread (got $spread sub-keys)")
  }

  test("saltedCollectSet == direct sorted collect_set") {
    val direct = skewed.groupBy("k")
      .agg(array_sort(collect_set(col("v"))).as("values"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val salted = Skew.saltedCollectSet(skewed, "k", col("v"), 8)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(salted == direct)
  }

  test("saltedCountDistinct == direct countDistinct") {
    val direct = skewed.groupBy("k").agg(countDistinct(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(skewed, "k", col("v"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }
}
