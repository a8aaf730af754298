package graft

import org.apache.spark.sql.functions._
import graft.sources.Materialized
import graft.operators.{Dedup, Similarity}

/** Pins the memo-INVALIDATION contract: when a builder's output contract
  * changes, its logical key is bumped, so shared-store entries published
  * by the old code are never adopted — and session-scoped scalar memos
  * die with their session instead of leaking process-globally.
  */
class MemoInvalidationSpec extends SparkSpec {

  private def deleteTree(p: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(q => java.nio.file.Files.deleteIfExists(q))
    finally walk.close()
  }

  test("a shared-store entry under the pre-r10 'embexact:' key is NOT adopted") {
    // r10 changed exactPairsFor's output contract (audit-stride sampling
    // for N > 2000), so its key moved embexact: -> embexact2:. A store
    // carrying an old-code entry must be ignored, not served against the
    // sampled oracle.
    val shared = java.nio.file.Files.createTempDirectory("graft-spec-keybump-")
    try {
      val expected = Dedup.exactPairsFor(spark, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // poison: a plausible-schema entry published under the OLD key
      val s1 = spark.newSession()
      s1.conf.set("spark.graft.materialized.dir", shared.toString)
      Materialized.of(s1, s"embexact:$sf0001")(
        s1.range(1).select(lit(-1L).as("vec_a"), lit(-2L).as("vec_b"),
          lit(9.9).as("cos")))
      // a fresh application over the same store must rebuild under the
      // bumped key and reproduce the live contract exactly
      val s2 = spark.newSession()
      s2.conf.set("spark.graft.materialized.dir", shared.toString)
      val got = Dedup.exactPairsFor(s2, sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(!got.contains((-1L, -2L)), "old-key poison row served")
      assert(got == expected)
    } finally deleteTree(shared)
  }

  test("scalarOf memoizes per session; a fresh session recomputes") {
    var builds = 0
    def build: Long = { builds += 1; 42L }
    assert(Materialized.scalarOf(spark, "spec:scalar")(build) == 42L)
    assert(Materialized.scalarOf(spark, "spec:scalar")(build) == 42L)
    assert(builds == 1, "same session must serve the cached scalar")
    val s2 = spark.newSession()
    assert(Materialized.scalarOf(s2, "spec:scalar")(build) == 42L)
    assert(builds == 2,
      "a new session must not inherit another session's scalar (the old " +
        "identityHashCode-keyed global map did exactly that)")
  }

  test("corpusN equals the live normed-embedding count") {
    assert(Similarity.corpusN(spark, sf0001) ==
      Dedup.normedFor(spark, sf0001).count())
  }
}
