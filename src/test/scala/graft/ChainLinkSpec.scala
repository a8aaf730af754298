package graft

import org.apache.spark.sql.functions._
import graft.core.{Linking, Msg}
import graft.operators.ChainLink
import graft.sources.Tables

/** The banded-interval-join implementation must agree with the O(N²)
  * all-pairs executable spec (A2) on real testdata.
  */
class ChainLinkSpec extends SparkSpec {

  test("banded links == all-pairs spec on sf0.001 msgs") {
    import spark.implicits._
    val msgsDf = Tables.msgs(spark, sf0001)
    val msgs = msgsDf.as[Msg].collect().toSeq
    val expected = (for {
      p <- msgs; c <- msgs
      if p.id != c.id && Linking.isParent(p, c)
    } yield (p.id, c.id)).toSet
    val got = ChainLink.links(msgsDf)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "derivation should produce a non-trivial call graph")
  }

  test("chain_link arrays == all-pairs spec on sf0.001") {
    import spark.implicits._
    val msgs = Tables.msgs(spark, sf0001).as[Msg].collect().toSeq
    val spec = Linking.linkAllPairs(msgs).map(l => l.id -> (l.parents, l.children)).toMap
    val out = ChainLink.chainLink(spark, sf0001).collect()
    assert(out.length == msgs.length)
    out.foreach { r =>
      val (p, c) = spec(r.getString(0))
      assert(r.getSeq[String](6) == p, s"parents of ${r.getString(0)}")
      assert(r.getSeq[String](7) == c, s"children of ${r.getString(0)}")
    }
  }

  test("entry returns non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has runnable plan and oracle coverage is declared") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    // every oracle refers to an existing query
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"orphan oracle $k"))
  }
}
