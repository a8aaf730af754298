package graft

import graft.core.{Linking, Msg}
import graft.operators.ChainLink

/** Adversarial inputs for the banded interval join: every case where the
  * bucketing/replication scheme could diverge from the all-pairs spec.
  */
class BandedJoinEdgeSpec extends SparkSpec {

  private def check(msgs: Seq[Msg]): Unit = {
    val sp = spark
    import sp.implicits._
    // Contract: the spec's complete matching rule (F1 + F6 + corrupt-
    // interval guard), stated once in Linking.matches.
    val expected = (for {
      p <- msgs; c <- msgs if Linking.matches(p, c)
    } yield (p.id, c.id)).toSet
    val got = ChainLink.links(msgs.toDF())
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expected, s"banded != spec: extra=${got -- expected} missing=${expected -- got}")
  }

  private def m(id: String, src: String, dst: String, s: Long, e: Long): Msg =
    Msg(id, src, dst, s, (e - s).toDouble, e)

  test("equal intervals with reciprocal IPs link both directions") {
    check(Seq(
      m("a", "1", "2", 0, 100),
      m("b", "2", "1", 0, 100)))
  }

  test("src_ip == dst_ip never self-links") {
    check(Seq(
      m("self", "9", "9", 0, 100),
      m("other", "9", "9", 10, 90))) // but nests inside the twin-IP message
  }

  test("zero-length and boundary-touching intervals") {
    check(Seq(
      m("p", "1", "2", 0, 100),
      m("exact", "2", "3", 0, 100), // identical interval, one-way IPs
      m("point", "2", "3", 100, 100), // zero-length at right boundary
      m("zero", "2", "3", 0, 0))) // zero-length at left boundary
  }

  test("outlier-length interval (replication-capped path) still finds all pairs") {
    val outlier = m("giant", "1", "2", 0, 1000000)
    val small = (0 until 50).map(i =>
      m(s"s$i", "2", "3", i * 20000L, i * 20000L + 10))
    // giant contains every small (IP handoff 2→3 matches via src "2")
    check(outlier +: small)
  }

  test("parent spanning many buckets with children scattered inside") {
    val p = m("p", "1", "2", 0, 900000)
    val kids = (0 until 30).map(i => m(s"c$i", "2", "3", i * 30000L, i * 30000L + 5000))
    val decoys = (0 until 30).map(i => m(s"d$i", "4", "5", i * 30000L, i * 30000L + 5000))
    check(p +: (kids ++ decoys))
  }

  test("inverted intervals are excluded from both sides (ADVICE r1)") {
    check(Seq(
      m("p", "1", "2", 0, 100),
      m("inv_child", "2", "3", 90, 10), // end < start: would "nest" under raw F1
      m("inv_parent", "1", "2", 50, 0), // end < start: cannot parent anything
      m("ok", "2", "3", 10, 90)))
  }

  test("lenient-parse end=0 rows (wire defaults) never crash or mislink") {
    check(Seq(
      m("p", "1", "2", 1000, 2000),
      m("broken", "2", "3", 1500, 0), // parse default end_at_ms=0
      m("c", "2", "3", 1200, 1800)))
  }

  test("empty input yields empty output (no NPE on null aggregates)") {
    val sp = spark
    import sp.implicits._
    assert(ChainLink.links(Seq.empty[Msg].toDF()).count() === 0L)
  }

  test("all rows inverted yields empty output") {
    check(Seq(m("a", "1", "2", 100, 0), m("b", "2", "3", 200, 50)))
  }

  test("random sets with 10% inverted intervals: banded == spec across 10 seeds") {
    (0 until 10).foreach { seed =>
      val rnd = new scala.util.Random(seed + 1000)
      val msgs = (0 until 60).map { i =>
        val s = rnd.nextInt(50000).toLong
        val e =
          if (i % 10 == 0) s - 1 - rnd.nextInt(40000) // inverted
          else s + rnd.nextInt(if (i % 7 == 0) 200000 else 5000)
        m(s"m$i", rnd.nextInt(5).toString, rnd.nextInt(5).toString, s, e)
      }
      check(msgs)
    }
  }

  test("random sets: banded == spec across 10 seeds") {
    (0 until 10).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val msgs = (0 until 60).map { i =>
        val s = rnd.nextInt(50000).toLong
        val e = s + rnd.nextInt(if (i % 7 == 0) 200000 else 5000)
        m(s"m$i", rnd.nextInt(5).toString, rnd.nextInt(5).toString, s, e)
      }
      check(msgs)
    }
  }
}
