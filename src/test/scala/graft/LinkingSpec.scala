package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Linking, LinkedMsg, Msg, WatermarkMatcher}

/** Golden cases from the reference's own executable spec
  * (`test_chain_linking.py`, worked examples `requirements-v2.md:96-164`).
  */
class LinkingSpec extends AnyFunSuite {

  private def m(id: String, src: String, dst: String, s: Long, e: Long): Msg =
    Msg(id, src, dst, s, (e - s).toDouble, e)

  private def byId(out: Seq[LinkedMsg]): Map[String, LinkedMsg] =
    out.map(l => l.id -> l).toMap

  test("case 1 — linear chain (test_chain_linking.py:20-50)") {
    val msgs = Seq(
      m("id1", "10.0.0.1", "10.0.0.2", 1000, 1500),
      m("id2", "10.0.0.2", "10.0.0.3", 1100, 1300),
      m("id3", "10.0.0.3", "10.0.0.4", 1120, 1220))
    val out = byId(Linking.linkAllPairs(msgs))
    assert(out("id1").parents == Seq() && out("id1").children == Seq("id2"))
    assert(out("id2").parents == Seq("id1") && out("id2").children == Seq("id3"))
    assert(out("id3").parents == Seq("id2") && out("id3").children == Seq())
  }

  test("case 2 — concurrent branches (test_chain_linking.py:60-87)") {
    val msgs = Seq(
      m("id1", "10.0.0.1", "10.0.0.2", 1000, 1500),
      m("id2", "10.0.0.2", "10.0.0.3", 1100, 1300),
      m("id3", "10.0.0.2", "10.0.0.4", 1200, 1400))
    val out = byId(Linking.linkAllPairs(msgs))
    assert(out("id1").children == Seq("id2", "id3"))
    assert(out("id2").parents == Seq("id1") && out("id2").children == Seq())
    assert(out("id3").parents == Seq("id1") && out("id3").children == Seq())
  }

  test("case 3 — multiple parents, compared as set (test_chain_linking.py:97-124)") {
    val msgs = Seq(
      m("id1", "10.0.0.1", "10.0.0.3", 1000, 1400),
      m("id2", "10.0.0.2", "10.0.0.3", 1050, 1400),
      m("id3", "10.0.0.3", "10.0.0.4", 1200, 1300))
    val out = byId(Linking.linkAllPairs(msgs))
    assert(out("id3").parents.toSet == Set("id1", "id2"))
    assert(out("id1").children == Seq("id3") && out("id2").children == Seq("id3"))
  }

  test("containment predicate edge cases") {
    val p = m("p", "a", "b", 1000, 2000)
    // equal intervals: mutual parent/child is allowed by F1 (SURVEY §7 risk 6)
    val twin = m("t", "b", "a", 1000, 2000)
    assert(Linking.isParent(p, twin) && Linking.isParent(twin, p))
    // boundary-touching child
    assert(Linking.isParent(p, m("c", "b", "x", 1000, 2000)))
    // child ends later — no containment
    assert(!Linking.isParent(p, m("c", "b", "x", 1500, 2500)))
    // IP mismatch
    assert(!Linking.isParent(p, m("c", "z", "x", 1200, 1800)))
  }

  test("watermark buffering — emission on watermark pass (test_chain_linking.py:147-167)") {
    val wm = new WatermarkMatcher(0)
    assert(wm.add(m("id1", "10.0.0.1", "10.0.0.2", 1000, 2000)).isEmpty)
    assert(wm.add(m("id2", "10.0.0.2", "10.0.0.3", 1100, 1500)).isEmpty)
    // id3 advances watermark to 3000 → id1, id2 emitted, linked
    val emitted = wm.add(m("id3", "10.0.0.9", "10.0.0.9", 3000, 3100))
    assert(emitted.map(_.id) == Seq("id1", "id2"))
    val e = byId(emitted)
    assert(e("id1").children == Seq("id2") && e("id2").parents == Seq("id1"))
    // id3 still buffered until manual flush
    assert(wm.flush().map(_.id) == Seq("id3"))
  }

  test("watermark healing — late-arriving parent (test_chain_linking.py:170-185)") {
    val wm = new WatermarkMatcher(200)
    assert(wm.add(m("id2", "10.0.0.2", "10.0.0.3", 1100, 1500)).isEmpty)
    // parent arrives late (start 900 < current max-start 1100)
    assert(wm.add(m("id1", "10.0.0.1", "10.0.0.2", 900, 2000)).isEmpty)
    val emitted = wm.add(m("id3", "10.0.0.9", "10.0.0.9", 3000, 3100))
    val e = byId(emitted)
    assert(e.contains("id1") && e.contains("id2"))
    assert(e("id2").parents == Seq("id1") && e("id1").children == Seq("id2"))
  }
}
