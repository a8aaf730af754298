package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Iterative, Neighbors}

/** Equivalence proof for the alternating large-star / small-star kernel
  * ([[Iterative.connectedComponentsStars]]) against the default min-label
  * fixpoint — on crafted worst-case shapes AND the two corpus graphs the
  * engine actually clusters. Same contract: (node, label = component min)
  * for every node with ≥ 1 edge.
  */
class StarContractionSpec extends SparkSpec {

  private def sym(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    val e = pairs.toDF("src", "dst")
    e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("stars ≡ min-label on a long path, a star, a clique, and a 2-cycle pair") {
    // path 1..40 (the diameter shape the min-label loop prices per hop),
    // a hub star, a 5-clique, an isolated 2-node component
    val path = (1L until 40L).map(i => (i, i + 1))
    val star = (101L to 110L).map(v => (100L, v))
    val clique = for { a <- 200L to 204L; b <- (a + 1) to 204L } yield (a, b)
    val pair = Seq((301L, 300L))
    val edges = sym(path ++ star ++ clique ++ pair)
    val exp = labelsOf(Iterative.connectedComponents(edges))
    val got = labelsOf(Iterative.connectedComponentsStars(edges))
    assert(got == exp)
    // component mins are the labels
    assert(got(40L) == 1L && got(110L) == 100L && got(204L) == 200L &&
      got(301L) == 300L)
  }

  test("stars ≡ min-label on the dedup-cluster and mutual-kNN corpus graphs") {
    val pairs = Dedup.dedupNgram(spark, sf001).select("doc_a", "doc_b")
    val dedupEdges = pairs.unionAll(
      pairs.select(col("doc_b"), col("doc_a"))).toDF("src", "dst")
    assert(labelsOf(Iterative.connectedComponentsStars(dedupEdges)) ==
      labelsOf(Curation.ccLabelsFor(spark, sf001)))

    val knn = Neighbors.knnEdgesFor(spark, sf001).select("src", "dst")
    val mutual = knn.join(
      knn.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_semi")
    val mutualSym = mutual   // already symmetric by construction
    val exp = labelsOf(Iterative.connectedComponents(mutualSym))
    val got = labelsOf(Iterative.connectedComponentsStars(mutualSym))
    assert(got == exp)
    assert(got.nonEmpty)
  }

  test("min-label auto-hands-off to stars when the round budget is exceeded") {
    // 40-hop path with a 2-round budget: the min-label loop covers ≤ 4
    // hops per 2 rounds, so CORRECT labels here prove the star handoff
    // fired and finished the job (stderr logs `[graft-cc] round budget 2
    // hit — star-contraction handoff` as the visible witness)
    val path = sym((1L until 40L).map(i => (i, i + 1)))
    val got = labelsOf(Iterative.connectedComponents(path, handoffBudget = 2))
    assert(got == (1L to 40L).map(_ -> 1L).toMap)
    // default budget (48) leaves corpus-scale behavior untouched: same
    // graph, no handoff, identical labels
    assert(labelsOf(Iterative.connectedComponents(path)) == got)
  }

  test("stars: empty edge relation yields an empty label relation") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Iterative.connectedComponentsStars(empty).count() == 0L)
  }
}
