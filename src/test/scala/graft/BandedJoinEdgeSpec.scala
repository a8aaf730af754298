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
    val expected = (for {
      p <- msgs; c <- msgs if p.id != c.id && Linking.isParent(p, c)
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
