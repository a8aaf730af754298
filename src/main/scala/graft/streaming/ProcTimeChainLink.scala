package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}
import graft.core.{Linking, LinkedMsg, Msg}

/** W4 — the idle-flush personality (SURVEY.md §2.6 W4 option (a)).
  *
  * Flink mixes event-time eviction timers with processing-time idle-flush
  * timers in one operator (reference `simpy_kafka_reader.py:159, 186-193,
  * 303-310`); a Spark stateful operator has a single `TimeMode`, and
  * EventTime mode rejects TTL, so [[StreamingChainLink.linked]] (the
  * flagship low-latency path) cannot flush a stream that goes globally
  * idle or simply ENDS — messages whose `end_at_ms` lies beyond the final
  * watermark are never emitted there.
  *
  * This variant runs both processors in `TimeMode.ProcessingTime` and
  * maintains the event-time watermark MANUALLY in state, per key
  * (`max(start_at_ms) − maxOutOfOrder`, exactly the reference
  * `WatermarkMatcher`'s rule, `linking_utils.py:59-76`), while a rolling
  * processing-time timer per key reproduces the reference's 60 s idle
  * flush: the linking stage clears its match state silently
  * (`simpy_kafka_reader.py:186-193`), the aggregation stage EMITS the
  * accumulated message and clears (`:303-310`). A bounded replay therefore
  * emits every message — including the tail the event-time personality
  * must drop — `idleFlushMs` after the stream quiesces.
  *
  * Trade-offs vs the event-time personality, both documented divergences:
  *   - the per-key manual watermark advances only with that key's records
  *     (conservative: eviction later than the reference's global watermark,
  *     links a superset within the disorder bound — same direction as the
  *     flagship path's rolling-timer note);
  *   - aggregation emission is idle-driven (≤ `idleFlushMs` after a key's
  *     last update) rather than watermark-driven, so emission LATENCY
  *     differs; emitted values are identical, and a mid-stream idle flush
  *     that beats a late link loses that link exactly as the reference
  *     does (late updates re-create orphan state that is silently
  *     discarded, `simpy_kafka_reader.py:266-269`).
  */
final class ProcTimeLinkingProcessor(maxOutOfOrderMs: Long, idleFlushMs: Long)
    extends StatefulProcessor[String, RoleRecord, UpdateEvent] {

  @transient private var parentState: org.apache.spark.sql.streaming.MapState[String, Msg] = _
  @transient private var childState: org.apache.spark.sql.streaming.MapState[String, Msg] = _
  @transient private var wmState: org.apache.spark.sql.streaming.ValueState[Long] = _
  @transient private var idleAt: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val msgEnc = Encoders.product[Msg]
    val strEnc = Encoders.STRING
    parentState = getHandle.getMapState[String, Msg]("parent_state", strEnc, msgEnc, TTLConfig.NONE)
    childState = getHandle.getMapState[String, Msg]("child_state", strEnc, msgEnc, TTLConfig.NONE)
    wmState = getHandle.getValueState[Long]("manual_wm", Encoders.scalaLong, TTLConfig.NONE)
    idleAt = getHandle.getValueState[Long]("idle_at", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def rearmIdle(timers: TimerValues): Unit = {
    val fireAt = timers.getCurrentProcessingTimeInMs() + idleFlushMs
    if (idleAt.exists()) getHandle.deleteTimer(idleAt.get())
    getHandle.registerTimer(fireAt)
    idleAt.update(fireAt)
  }

  override def handleInputRows(key: String, rows: Iterator[RoleRecord],
      timers: TimerValues): Iterator[UpdateEvent] = {
    val out = Seq.newBuilder[UpdateEvent]
    val pBuf = scala.collection.mutable.LinkedHashMap.empty[String, Msg]
    val cBuf = scala.collection.mutable.LinkedHashMap.empty[String, Msg]
    parentState.iterator().foreach { case (k, v) => pBuf(k) = v }
    childState.iterator().foreach { case (k, v) => cBuf(k) = v }
    var wm = if (wmState.exists()) wmState.get() else Long.MinValue
    val pAdded = Seq.newBuilder[Msg]
    val cAdded = Seq.newBuilder[Msg]
    rows.foreach { r =>
      val cur = r.msg
      val wellFormed = Linking.wellFormed(cur)
      if (r.role == "parent") {
        if (wellFormed) {
          cBuf.valuesIterator.foreach { child =>
            if (Linking.matches(cur, child)) {
              val t = new Timestamp(math.max(cur.start_at_ms, child.start_at_ms))
              out += UpdateEvent("add_child", cur.id, child.id, "", "", 0L, 0.0, 0L, t)
              out += UpdateEvent("add_parent", child.id, cur.id, "", "", 0L, 0.0, 0L, t)
            }
          }
          pBuf(cur.id) = cur
          pAdded += cur
        }
        out += UpdateEvent("message", cur.id, "", cur.src_ip, cur.dst_ip,
          cur.start_at_ms, cur.latency_msec, cur.end_at_ms,
          new Timestamp(cur.start_at_ms))
      } else if (wellFormed) {
        pBuf.valuesIterator.foreach { parent =>
          if (Linking.matches(parent, cur)) {
            val t = new Timestamp(math.max(parent.start_at_ms, cur.start_at_ms))
            out += UpdateEvent("add_child", parent.id, cur.id, "", "", 0L, 0.0, 0L, t)
            out += UpdateEvent("add_parent", cur.id, parent.id, "", "", 0L, 0.0, 0L, t)
          }
        }
        cBuf(cur.id) = cur
        cAdded += cur
      }
      // manual watermark: max over every record this key has seen (both
      // role copies — max is idempotent) minus the disorder bound, the
      // WatermarkMatcher rule (linking_utils.py:59-63)
      if (cur.start_at_ms - maxOutOfOrderMs > wm)
        wm = cur.start_at_ms - maxOutOfOrderMs
    }
    pAdded.result().foreach(m => parentState.updateValue(m.id, m))
    cAdded.result().foreach(m => childState.updateValue(m.id, m))
    // manual-watermark eviction, one scan per (key, batch): drop entries the
    // per-key watermark has passed (reference eviction predicate
    // `end_at_ms <= watermark`, simpy_kafka_reader.py:176-181)
    Seq(parentState, childState).foreach { st =>
      val expired = Seq.newBuilder[String]
      st.iterator().foreach { case (k, m) => if (m.end_at_ms <= wm) expired += k }
      expired.result().foreach(st.removeKey)
    }
    wmState.update(wm)
    rearmIdle(timers)
    out.result().iterator
  }

  /** Idle flush: clear match state silently (reference :186-193). */
  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[UpdateEvent] = {
    if (idleAt.exists() && idleAt.get() == expired.getExpiryTimeInMs()) {
      parentState.clear(); childState.clear(); idleAt.clear()
    }
    Iterator.empty
  }
}

/** Stage-2 idle-flush aggregation: accumulate exactly like the event-time
  * [[AggregationProcessor]], but emit on the rolling idle timer —
  * emit-then-clear when a base message exists (reference :303-310), silent
  * discard of orphan updates (reference :266-269).
  */
final class ProcTimeAggregationProcessor(idleFlushMs: Long)
    extends StatefulProcessor[String, UpdateEvent, LinkedMsg] {

  @transient private var base: org.apache.spark.sql.streaming.ValueState[Msg] = _
  @transient private var parents: org.apache.spark.sql.streaming.ListState[String] = _
  @transient private var children: org.apache.spark.sql.streaming.ListState[String] = _
  @transient private var idleAt: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    base = getHandle.getValueState[Msg]("base", Encoders.product[Msg], TTLConfig.NONE)
    parents = getHandle.getListState[String]("parents", Encoders.STRING, TTLConfig.NONE)
    children = getHandle.getListState[String]("children", Encoders.STRING, TTLConfig.NONE)
    idleAt = getHandle.getValueState[Long]("idle_at", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[UpdateEvent],
      timers: TimerValues): Iterator[LinkedMsg] = {
    val pSet = scala.collection.mutable.LinkedHashSet.empty[String]
    val cSet = scala.collection.mutable.LinkedHashSet.empty[String]
    if (parents.exists()) parents.get().foreach(pSet += _)
    if (children.exists()) children.get().foreach(cSet += _)
    val (p0, c0) = (pSet.size, cSet.size)
    rows.foreach { u =>
      u.event_type match {
        case "message" =>
          if (!base.exists()) {
            base.update(Msg(u.key_id, u.src_ip, u.dst_ip, u.start_at_ms,
              u.latency_msec, u.end_at_ms))
          }
        case "add_parent" => if (u.other_id.nonEmpty) pSet += u.other_id
        case "add_child" => if (u.other_id.nonEmpty) cSet += u.other_id
        case _ => ()
      }
    }
    if (pSet.size != p0) parents.put(pSet.toArray)
    if (cSet.size != c0) children.put(cSet.toArray)
    val fireAt = timers.getCurrentProcessingTimeInMs() + idleFlushMs
    if (idleAt.exists()) getHandle.deleteTimer(idleAt.get())
    getHandle.registerTimer(fireAt)
    idleAt.update(fireAt)
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[LinkedMsg] = {
    if (idleAt.exists() && idleAt.get() == expired.getExpiryTimeInMs()) {
      idleAt.clear()
      if (base.exists()) {
        val m = base.get()
        val out = LinkedMsg.of(m, parents.get().toSeq, children.get().toSeq)
        base.clear(); parents.clear(); children.clear()
        Iterator.single(out)
      } else {
        // orphan updates with no base message: discarded without output
        parents.clear(); children.clear()
        Iterator.empty
      }
    } else Iterator.empty
  }
}

/** The idle-flush streaming topology: identical two-shuffle shape to
  * [[StreamingChainLink.linked]], in `TimeMode.ProcessingTime`.
  *
  * Operational note: with processing-time timers the engine considers
  * another batch always warranted (due timers must fire even with no new
  * data), so the query self-triggers continuously — use a throttled
  * `Trigger.ProcessingTime(...)` in production, and poll the sink rather
  * than `processAllAvailable()` in tests (the latter waits for a
  * quiescence that never comes). One asymmetry survives restarts: a query
  * resumed from a checkpoint with no new data and no replayable batch does
  * not execute a batch at all (the self-trigger only primes after a first
  * execution), so recovered overdue timers fire once any record arrives —
  * pinned by the restart test in ProcTimeFlushSpec.
  */
object ProcTimeChainLink {

  def linked(msgs: Dataset[Msg], maxOutOfOrderMs: Long = 30000L,
      idleFlushMs: Long = 60000L): Dataset[LinkedMsg] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    val roles = msgs
      .withColumn("event_time", timestamp_millis(col("start_at_ms")))
      .as[TimedMsg]
      .flatMap { m =>
        Seq(RoleRecord("parent", m.dst_ip, m.id, m.src_ip, m.dst_ip,
            m.start_at_ms, m.latency_msec, m.end_at_ms, m.event_time),
          RoleRecord("child", m.src_ip, m.id, m.src_ip, m.dst_ip,
            m.start_at_ms, m.latency_msec, m.end_at_ms, m.event_time))
      }
    roles
      .groupByKey(_.ip_key)
      .transformWithState(new ProcTimeLinkingProcessor(maxOutOfOrderMs, idleFlushMs),
        TimeMode.ProcessingTime, OutputMode.Append)
      .groupByKey(_.key_id)
      .transformWithState(new ProcTimeAggregationProcessor(idleFlushMs),
        TimeMode.ProcessingTime, OutputMode.Append)
  }
}
