package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Linking, Msg, WatermarkMatcher}

/** ScalaCheck properties over the pure watermark-matching kernel (J2),
  * pinning the two invariants the streaming operators rely on:
  *  1. in-order arrival (sorted by start) loses nothing at ANY watermark
  *     bound — containment guarantees parents arrive first;
  *  2. arbitrary arrival order loses nothing when the bound exceeds the
  *     total disorder (the reference's delay-cap == watermark-bound design).
  */
class WatermarkPropertySpec extends AnyFunSuite {

  private val genMsgs: Gen[List[Msg]] = for {
    n <- Gen.choose(0, 40)
    msgs <- Gen.listOfN(n, for {
      ipA <- Gen.choose(0, 4)
      ipB <- Gen.choose(0, 4)
      start <- Gen.choose(0L, 10000L)
      lat <- Gen.choose(1L, 4000L)
    } yield (ipA, ipB, start, lat))
  } yield msgs.zipWithIndex.map { case ((a, b, s, l), i) =>
    Msg(s"m$i", s"10.0.0.$a", s"10.0.0.$b", s, l.toDouble, s + l)
  }

  private def results(out: Seq[graft.core.LinkedMsg]) =
    out.map(l => (l.id, l.parents, l.children)).toSet

  private def spec(msgs: Seq[Msg]) = results(Linking.linkAllPairs(msgs))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("sorted-by-start arrival is lossless at any watermark bound") {
    check(Prop.forAll(genMsgs, Gen.choose(0L, 5000L)) { (msgs, bound) =>
      val wm = new WatermarkMatcher(bound)
      val emitted = msgs.sortBy(m => (m.start_at_ms, m.id)).flatMap(wm.add)
      results(emitted ++ wm.flush()) == spec(msgs)
    })
  }

  test("any arrival order is lossless when the bound exceeds total disorder") {
    check(Prop.forAll(genMsgs, Gen.long) { (msgs, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(msgs)
      val wm = new WatermarkMatcher(Long.MaxValue / 2) // nothing evicts early
      val emitted = shuffled.flatMap(wm.add)
      results(emitted ++ wm.flush()) == spec(msgs)
    })
  }

  test("emission respects the watermark: end_at_ms <= max(start) - bound") {
    check(Prop.forAll(genMsgs, Gen.choose(0L, 5000L)) { (msgs, bound) =>
      val wm = new WatermarkMatcher(bound)
      var maxStart = Long.MinValue
      msgs.sortBy(m => (m.start_at_ms, m.id)).forall { m =>
        maxStart = math.max(maxStart, m.start_at_ms)
        wm.add(m).forall(_.end_at_ms <= maxStart - bound)
      }
    })
  }
}
