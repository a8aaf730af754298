package graft.core

import scala.collection.mutable

/** Core record of the reference pipeline.
  *
  * One logical entity flows through the whole reference system: the
  * service-call log message (reference: `simpy_message_generator.py:196-203`,
  * parsed at `flink-jobs/simpy_kafka_reader.py:42-77`). Field names are kept
  * snake_case so the Spark schema derived from this case class matches the
  * wire format and the DuckDB oracle column names bit-for-bit.
  */
final case class Msg(
    id: String,
    src_ip: String,
    dst_ip: String,
    start_at_ms: Long,
    latency_msec: Double,
    end_at_ms: Long)

/** Output record: input + linked parent/child id arrays
  * (reference: `simpy_kafka_reader.py:80-91`, `README.md:49-60`).
  * Arrays are kept sorted (set semantics) — the reference's arrival-order
  * lists are an artifact of scheduling, and its own tests compare as sets
  * (`test_chain_linking.py:124`).
  */
final case class LinkedMsg(
    id: String,
    src_ip: String,
    dst_ip: String,
    start_at_ms: Long,
    latency_msec: Double,
    end_at_ms: Long,
    parents: Seq[String],
    children: Seq[String])

object LinkedMsg {
  def of(m: Msg, parents: Seq[String], children: Seq[String]): LinkedMsg =
    LinkedMsg(m.id, m.src_ip, m.dst_ip, m.start_at_ms, m.latency_msec,
      m.end_at_ms, parents.distinct.sorted, children.distinct.sorted)
}

/** Pure linking semantics — the executable spec every Spark operator is
  * tested against.
  */
object Linking {

  /** F1 — THE matching predicate (reference: `linking_utils.py:17-23`):
    * IP handoff (parent.dst_ip == child.src_ip) + interval CONTAINMENT
    * (parent starts first, ends last). Note `requirements-v2.md:53-54` states
    * the inequalities inverted; all executable artifacts implement
    * containment, which is what we implement (SURVEY.md §0).
    */
  def isParent(p: Msg, c: Msg): Boolean =
    p.dst_ip == c.src_ip &&
      p.start_at_ms <= c.start_at_ms &&
      p.end_at_ms >= c.end_at_ms

  /** Corrupt-interval guard: inverted intervals (`end_at_ms < start_at_ms`,
    * e.g. lenient wire-parse defaults producing `end_at_ms = 0`) never
    * participate in linking, on either side. This is THE single statement
    * of the rule every implementation applies (batch banded join, streaming
    * processors, stream-stream join, DuckDB `linksCte` oracle) — declared
    * once in the spec so implementations and tests can't drift (ADVICE r1).
    */
  def wellFormed(m: Msg): Boolean = m.end_at_ms >= m.start_at_ms

  /** The complete pair-matching rule: F1 containment + F6 self-exclusion +
    * the corrupt-interval guard.
    */
  def matches(p: Msg, c: Msg): Boolean =
    p.id != c.id && wellFormed(p) && wellFormed(c) && isParent(p, c)

  /** A2 — all-pairs O(N²) golden spec (reference: `test_chain_linking.py:32-42`).
    * Self-pairs excluded by id (F6): containment is reflexive, so a message
    * would otherwise always match itself. Corrupt rows still appear in the
    * output — with empty arrays — exactly like the batch/streaming output.
    */
  def linkAllPairs(msgs: Seq[Msg]): Seq[LinkedMsg] =
    msgs.map { m =>
      val parents = msgs.collect { case o if matches(o, m) => o.id }
      val children = msgs.collect { case o if matches(m, o) => o.id }
      LinkedMsg.of(m, parents, children)
    }
}

/** J2 — symmetric nested-loop matcher with a watermark-driven emission buffer
  * (reference: `linking_utils.py:45-87`). Used as the executable spec for
  * watermark semantics: buffer every message, match new arrivals both
  * directions against the buffer, advance watermark to
  * `max(start_at_ms) - maxOutOfOrderMs`, emit (and evict) messages whose
  * `end_at_ms <= watermark`.
  */
final class WatermarkMatcher(maxOutOfOrderMs: Long) {

  private final case class Buffered(
      msg: Msg,
      parents: mutable.LinkedHashSet[String] = mutable.LinkedHashSet.empty,
      children: mutable.LinkedHashSet[String] = mutable.LinkedHashSet.empty)

  private val buffer = mutable.LinkedHashMap.empty[String, Buffered]
  private var maxStart = Long.MinValue

  def watermark: Long =
    if (maxStart == Long.MinValue) Long.MinValue else maxStart - maxOutOfOrderMs

  /** Add one message; returns messages emitted by the advancing watermark,
    * in buffer (arrival) order.
    */
  def add(m: Msg): Seq[LinkedMsg] = {
    val entry = Buffered(m)
    buffer.valuesIterator.foreach { other =>
      if (Linking.matches(other.msg, m)) { // buffered is parent of new
        other.children += m.id
        entry.parents += other.msg.id
      }
      if (Linking.matches(m, other.msg)) { // new is parent of buffered
        other.parents += m.id
        entry.children += other.msg.id
      }
    }
    buffer.put(m.id, entry)
    if (m.start_at_ms > maxStart) maxStart = m.start_at_ms
    emitRipe()
  }

  private def emitRipe(): Seq[LinkedMsg] = {
    val wm = watermark
    val ripe = buffer.valuesIterator.filter(_.msg.end_at_ms <= wm).toSeq
    ripe.foreach(b => buffer.remove(b.msg.id))
    ripe.map(b => LinkedMsg.of(b.msg, b.parents.toSeq, b.children.toSeq))
  }

  /** Flush everything still buffered (reference's manual flush / end-of-stream). */
  def flush(): Seq[LinkedMsg] = {
    val all = buffer.valuesIterator
      .map(b => LinkedMsg.of(b.msg, b.parents.toSeq, b.children.toSeq)).toSeq
    buffer.clear()
    all
  }
}
