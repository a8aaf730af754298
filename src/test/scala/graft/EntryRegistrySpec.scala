package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.entry._

/** Guards the round-9 split of the SparkEntry monolith into per-family
  * registries: the merged driver contract must be exactly the union of the
  * families, families must be pairwise disjoint (so `++` order carries no
  * override semantics), and every query key must have its oracle in the
  * SAME family file (no cross-family drift).
  */
class EntryRegistrySpec extends AnyFunSuite {

  private val families: Seq[(String, Map[String, _], Map[String, String])] = Seq(
    ("Chain", ChainQueries.queries, ChainQueries.oracles),
    ("Relational", RelationalQueries.queries, RelationalQueries.oracles),
    ("Analytics", AnalyticsQueries.queries, AnalyticsQueries.oracles),
    ("Dedup", DedupQueries.queries, DedupQueries.oracles),
    ("Similarity", SimilarityQueries.queries, SimilarityQueries.oracles),
    ("Text", TextQueries.queries, TextQueries.oracles),
    ("Multimodal", MultimodalQueries.queries, MultimodalQueries.oracles),
    ("Curation", CurationQueries.queries, CurationQueries.oracles))

  test("families are pairwise disjoint") {
    val all = families.flatMap { case (name, qs, _) => qs.keys.map(_ -> name) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"keys in multiple families: $dups")
  }

  test("merged contract is exactly the union of the families") {
    val union = families.flatMap(_._2.keys).toSet
    assert(SparkEntry.queries.keySet == union)
    assert(SparkEntry.oracleSql.keySet == families.flatMap(_._3.keys).toSet)
  }

  test("each family's query and oracle key sets match") {
    families.foreach { case (name, qs, os) =>
      assert(qs.keySet == os.keySet,
        s"$name: queries vs oracles differ by ${qs.keySet.diff(os.keySet) ++ os.keySet.diff(qs.keySet)}")
    }
  }

  test("query count is preserved (172 as of round 9)") {
    assert(SparkEntry.queries.size >= 172)
    assert(SparkEntry.queries.size == SparkEntry.oracleSql.size)
  }
}
