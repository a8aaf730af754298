package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}
import graft.core.{Linking, LinkedMsg, Msg}

/** P3 role fan-out record (reference: `simpy_kafka_reader.py:94-102`), flat
  * so the event-time column threads through the typed pipeline.
  */
final case class RoleRecord(
    role: String,
    ip_key: String,
    id: String,
    src_ip: String,
    dst_ip: String,
    start_at_ms: Long,
    latency_msec: Double,
    end_at_ms: Long,
    event_time: Timestamp) {
  def msg: Msg = Msg(id, src_ip, dst_ip, start_at_ms, latency_msec, end_at_ms)
}

/** Msg + its event-time column (watermark carrier). */
final case class TimedMsg(
    id: String,
    src_ip: String,
    dst_ip: String,
    start_at_ms: Long,
    latency_msec: Double,
    end_at_ms: Long,
    event_time: Timestamp)

/** Stage-1 → stage-2 update event. Folds the reference's link event + P4
  * `expand_updates` flatMap into one shape: `message` carries the payload
  * keyed by its own id; `add_parent`/`add_child` carry the other side's id
  * (reference: `simpy_kafka_reader.py:105-115, 149-157`).
  */
final case class UpdateEvent(
    event_type: String,
    key_id: String,
    other_id: String,
    src_ip: String,
    dst_ip: String,
    start_at_ms: Long,
    latency_msec: Double,
    end_at_ms: Long,
    event_time: Timestamp)

/** J1 — the streaming self theta-join as a symmetric hash on per-IP keyed
  * state (reference `IpLinkingProcess`, `simpy_kafka_reader.py:118-193`).
  *
  * A parent-role record scans `child_state` for contained children, emits
  * one update pair per match, inserts itself into `parent_state`, and emits
  * its message payload; a child-role record does the mirror image. Exactly
  * one link per matching pair: only the later-arriving side scans the
  * earlier one. Event-time timers at each record's `end_at_ms` evict state
  * once the watermark passes (reference eviction scan `:162-184`).
  *
  * Divergences from the reference, both deliberate:
  *   - Self-links: the reference's streaming path would link a
  *     `src_ip == dst_ip` message to itself (reflexive containment, no id
  *     guard at `:146-157`), contradicting its own executable spec
  *     (`test_chain_linking.py:34-35` skips i==j). We follow the spec and
  *     guard on id, keeping streaming ≡ batch.
  *   - Idle flush (W4): Flink mixes processing-time idle timers with
  *     event-time eviction; one Spark operator has one TimeMode, and Spark
  *     rejects state TTL in EventTime mode outright — there is NO
  *     processing-time escape hatch here. In practice the divergence is
  *     liveness-only and narrower than it looks: the micro-batch watermark
  *     is global (min across partitions), so a sparse KEY still flushes
  *     whenever any data flows anywhere; only a globally idle stream stalls
  *     emission, where the reference's 60 s flush would emit. Values are
  *     never affected (SURVEY.md §7 risk 1).
  */
final class LinkingProcessor
    extends StatefulProcessor[String, RoleRecord, UpdateEvent] {

  @transient private var parentState: org.apache.spark.sql.streaming.MapState[String, Msg] = _
  @transient private var childState: org.apache.spark.sql.streaming.MapState[String, Msg] = _
  @transient private var evictAt: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val msgEnc = Encoders.product[Msg]
    val strEnc = Encoders.STRING
    parentState = getHandle.getMapState[String, Msg]("parent_state", strEnc, msgEnc, TTLConfig.NONE)
    childState = getHandle.getMapState[String, Msg]("child_state", strEnc, msgEnc, TTLConfig.NONE)
    evictAt = getHandle.getValueState[Long]("evict_at", Encoders.scalaLong, TTLConfig.NONE)
  }

  /** One rolling eviction timer per key (earliest pending end) instead of a
    * timer per record: the reference registers a timer at every record's
    * `end_at_ms` and linearly rescans state on each firing (`:159-184`) —
    * semantically a per-record eviction point, but k timers per batch means
    * k full scans. The rolling form evicts everything at or below the
    * watermark in ONE scan per firing and re-arms at the earliest surviving
    * end. Eviction can only happen later (never earlier) than the
    * reference's, so links are a superset within the watermark bound —
    * i.e., closer to the batch spec (equivalence tests pin this).
    */
  private def armTimer(candidateEnd: Long): Unit =
    if (!evictAt.exists() || candidateEnd < evictAt.get()) {
      if (evictAt.exists()) getHandle.deleteTimer(evictAt.get())
      getHandle.registerTimer(candidateEnd)
      evictAt.update(candidateEnd)
    }

  private def ts(ms: Long, wmMs: Long): Timestamp =
    // output event time must not be behind the operator watermark
    new Timestamp(math.max(ms, wmMs + 1))

  override def handleInputRows(key: String, rows: Iterator[RoleRecord],
      timers: TimerValues): Iterator[UpdateEvent] = {
    val wm = timers.getCurrentWatermarkInMs()
    val out = Seq.newBuilder[UpdateEvent]
    // Load both state maps ONCE per (key, micro-batch) and write back only
    // the additions at the end: per-record processing order (and thus the
    // reference's scan-opposite-then-insert-self semantics) is unchanged,
    // but the state store is touched O(state + additions) per batch instead
    // of O(records × state) probes against RocksDB.
    val pBuf = scala.collection.mutable.LinkedHashMap.empty[String, Msg]
    val cBuf = scala.collection.mutable.LinkedHashMap.empty[String, Msg]
    parentState.iterator().foreach { case (k, v) => pBuf(k) = v }
    childState.iterator().foreach { case (k, v) => cBuf(k) = v }
    val pAdded = Seq.newBuilder[Msg]
    val cAdded = Seq.newBuilder[Msg]
    rows.foreach { r =>
      val cur = r.msg
      // Inverted intervals (lenient-parse defaults can yield end=0) are
      // corrupt: excluded from matching/state on both roles, identical to
      // the batch banded join's filter — the record still flows through as
      // a `message` event, so it reaches the output with empty arrays.
      val wellFormed = Linking.wellFormed(cur)
      if (r.role == "parent") {
        if (wellFormed) {
          cBuf.valuesIterator.foreach { child =>
            if (Linking.matches(cur, child)) {
              val t = ts(math.max(cur.start_at_ms, child.start_at_ms), wm)
              out += UpdateEvent("add_child", cur.id, child.id, "", "", 0L, 0.0, 0L, t)
              out += UpdateEvent("add_parent", child.id, cur.id, "", "", 0L, 0.0, 0L, t)
            }
          }
          pBuf(cur.id) = cur
          pAdded += cur
        }
        out += UpdateEvent("message", cur.id, "", cur.src_ip, cur.dst_ip,
          cur.start_at_ms, cur.latency_msec, cur.end_at_ms, ts(cur.start_at_ms, wm))
      } else if (wellFormed) {
        pBuf.valuesIterator.foreach { parent =>
          if (Linking.matches(parent, cur)) {
            val t = ts(math.max(parent.start_at_ms, cur.start_at_ms), wm)
            out += UpdateEvent("add_child", parent.id, cur.id, "", "", 0L, 0.0, 0L, t)
            out += UpdateEvent("add_parent", cur.id, parent.id, "", "", 0L, 0.0, 0L, t)
          }
        }
        cBuf(cur.id) = cur
        cAdded += cur
      }
      if (wellFormed) armTimer(cur.end_at_ms)
    }
    pAdded.result().foreach(m => parentState.updateValue(m.id, m))
    cAdded.result().foreach(m => childState.updateValue(m.id, m))
    out.result().iterator
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[UpdateEvent] = {
    val cutoff = math.max(expired.getExpiryTimeInMs(), timers.getCurrentWatermarkInMs())
    var minSurviving = Long.MaxValue
    Seq(parentState, childState).foreach { st =>
      val expiredKeys = Seq.newBuilder[String]
      st.iterator().foreach { case (k, m) =>
        if (m.end_at_ms <= cutoff) expiredKeys += k
        else if (m.end_at_ms < minSurviving) minSurviving = m.end_at_ms
      }
      expiredKeys.result().foreach(st.removeKey)
    }
    evictAt.clear()
    if (minSurviving != Long.MaxValue) armTimer(minSurviving)
    Iterator.empty
  }
}

/** A1 — group-by-id incremental list aggregation (reference
  * `MessageAggregationProcess`, `simpy_kafka_reader.py:196-310`): store the
  * base message first-write-wins, accumulate deduped parent/child id lists,
  * emit exactly once when the watermark passes `end_at_ms`, then clear.
  * Updates arriving before the base message accumulate; orphan updates
  * (no base) are never emitted — reference behavior (`:266-269`).
  *
  * Orphan-state TTL: update lists created with no base self-expire via a
  * cleanup timer — without it, an update landing after its key's base
  * emitted (the watermark-boundary corner) would recreate list state with
  * no timer and leak it for the life of the query (the ProcTime twin
  * discards orphans explicitly; this is the event-time equivalent). The
  * timer is anchored at `max(current watermark, max event_time of the
  * orphan updates seen for the key) + the 30 s bound`, and re-arms
  * forward when a later orphan update arrives: anchoring at the watermark
  * alone is wrong when event times run ahead of it (first micro-batch,
  * where the watermark is still 0, or bursty arrival) — the timer would
  * fire while a base carrying those event times is still admissible,
  * purging lists the base is about to claim. Measured in the updates' own
  * event-time frame, a base admissible within the bound always arrives
  * before the cleanup fires and disarms it; a base later than that is
  * late by the pipeline's own policy, and its updates are discarded
  * exactly as the reference discards orphans.
  */
final class AggregationProcessor
    extends StatefulProcessor[String, UpdateEvent, LinkedMsg] {

  private val OrphanGraceMs = 30001L

  @transient private var base: org.apache.spark.sql.streaming.ValueState[Msg] = _
  @transient private var parents: org.apache.spark.sql.streaming.ListState[String] = _
  @transient private var children: org.apache.spark.sql.streaming.ListState[String] = _
  @transient private var orphanAt: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    base = getHandle.getValueState[Msg]("base", Encoders.product[Msg], TTLConfig.NONE)
    parents = getHandle.getListState[String]("parents", Encoders.STRING, TTLConfig.NONE)
    children = getHandle.getListState[String]("children", Encoders.STRING, TTLConfig.NONE)
    orphanAt = getHandle.getValueState[Long]("orphan_at",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[UpdateEvent],
      timers: TimerValues): Iterator[LinkedMsg] = {
    // load lists once per (key, micro-batch); write back only if changed
    val pSet = scala.collection.mutable.LinkedHashSet.empty[String]
    val cSet = scala.collection.mutable.LinkedHashSet.empty[String]
    if (parents.exists()) parents.get().foreach(pSet += _)
    if (children.exists()) children.get().foreach(cSet += _)
    val (p0, c0) = (pSet.size, cSet.size)
    var maxUpdateEvtMs = Long.MinValue // orphan updates' own event-time frame
    rows.foreach { u =>
      u.event_type match {
        case "message" =>
          if (!base.exists()) { // first-write-wins (reference :232-236)
            val m = Msg(u.key_id, u.src_ip, u.dst_ip, u.start_at_ms,
              u.latency_msec, u.end_at_ms)
            base.update(m)
            getHandle.registerTimer(m.end_at_ms)
            // the base's own emission timer owns cleanup from here on
            if (orphanAt.exists()) {
              getHandle.deleteTimer(orphanAt.get())
              orphanAt.clear()
            }
          }
        case "add_parent" =>
          if (u.other_id.nonEmpty) pSet += u.other_id
          if (u.event_time != null)
            maxUpdateEvtMs = math.max(maxUpdateEvtMs, u.event_time.getTime)
        case "add_child" =>
          if (u.other_id.nonEmpty) cSet += u.other_id
          if (u.event_time != null)
            maxUpdateEvtMs = math.max(maxUpdateEvtMs, u.event_time.getTime)
        case _ => ()
      }
    }
    if (pSet.size != p0) parents.put(pSet.toArray)
    if (cSet.size != c0) children.put(cSet.toArray)
    if (!base.exists() && (pSet.nonEmpty || cSet.nonEmpty)) {
      // Anchor the grace window in the updates' event-time frame, not the
      // (possibly lagging) watermark; re-arm forward for later orphans.
      val at =
        math.max(timers.getCurrentWatermarkInMs(), maxUpdateEvtMs) + OrphanGraceMs
      if (!orphanAt.exists()) {
        getHandle.registerTimer(at)
        orphanAt.update(at)
      } else if (at > orphanAt.get()) {
        getHandle.deleteTimer(orphanAt.get())
        getHandle.registerTimer(at)
        orphanAt.update(at)
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[LinkedMsg] = {
    if (base.exists() && base.get().end_at_ms <= expired.getExpiryTimeInMs()) {
      val m = base.get()
      val out = LinkedMsg.of(m, parents.get().toSeq, children.get().toSeq)
      base.clear(); parents.clear(); children.clear()
      Iterator.single(out)
    } else if (!base.exists() && orphanAt.exists() &&
        orphanAt.get() == expired.getExpiryTimeInMs()) {
      // orphan cleanup: no base ever arrived inside the grace window
      parents.clear(); children.clear(); orphanAt.clear()
      Iterator.empty
    } else Iterator.empty
  }
}

/** The full streaming personality: role fan-out → per-IP linking → per-id
  * aggregation, as two chained `transformWithState` operators with watermark
  * propagation through the declared output event-time column — the same
  * two-shuffle topology as the reference job graph (SURVEY.md §3.1), minus
  * the Python/JVM boundary.
  */
object StreamingChainLink {

  /** msgs (any source: Kafka-parsed, MemoryStream, files) → enriched
    * LinkedMsg stream. `maxOutOfOrder` mirrors SIMPY_MAX_OUT_OF_ORDER_MS.
    */
  def linked(msgs: Dataset[Msg], maxOutOfOrder: String = "30 seconds")
      : Dataset[LinkedMsg] = {
    val spark = msgs.sparkSession
    import spark.implicits._
    val roles = msgs
      .withColumn("event_time", timestamp_millis(col("start_at_ms")))
      .withWatermark("event_time", maxOutOfOrder)
      .as[TimedMsg]
      .flatMap { m =>
        Seq(RoleRecord("parent", m.dst_ip, m.id, m.src_ip, m.dst_ip,
            m.start_at_ms, m.latency_msec, m.end_at_ms, m.event_time),
          RoleRecord("child", m.src_ip, m.id, m.src_ip, m.dst_ip,
            m.start_at_ms, m.latency_msec, m.end_at_ms, m.event_time))
      }
    val updates = roles
      .groupByKey(_.ip_key)
      .transformWithState(new LinkingProcessor, "event_time", OutputMode.Append)
    updates
      .groupByKey(_.key_id)
      .transformWithState(new AggregationProcessor, TimeMode.EventTime, OutputMode.Append)
  }

  /** J1's pure-DataFrame streaming alternative (SURVEY.md §2.4): the link
    * relation as Spark's BUILT-IN watermarked stream-stream self-join — no
    * custom processor, no explicit state management. The engine's symmetric
    * hash-join state replaces `parent_state`/`child_state`, and state
    * cleanup falls out of the event-time range bound: a child starts inside
    * its parent's interval, and intervals are bounded by `maxSpanMs`
    * (reference spec: call latency ≤ 20 s, `requirements-v2.md:16-17`), so
    * `c_time ∈ [p_time, p_time + maxSpanMs]` lets Spark drop buffered rows
    * once the watermark passes. Messages with spans longer than `maxSpanMs`
    * would be dropped from the join state before matching — the
    * processor-based [[linked]] pipeline has no such bound, which is why it
    * is the flagship path and this is the capability-parity alternative.
    *
    * Both sides hash-partition on the IP equi-key (`p.dst_ip = c.src_ip`) —
    * the same partition-pruned match space as the reference's `key_by` and
    * the batch banded join.
    */
  def linksViaStreamJoin(msgs: Dataset[Msg], maxOutOfOrder: String = "30 seconds",
      maxSpanMs: Long = 30000L): org.apache.spark.sql.DataFrame = {
    val p = msgs.toDF().select(col("id").as("p_id"), col("dst_ip").as("p_dst_ip"),
        col("start_at_ms").as("p_start"), col("end_at_ms").as("p_end"))
      .withColumn("p_time", timestamp_millis(col("p_start")))
      .withWatermark("p_time", maxOutOfOrder)
    val c = msgs.toDF().select(col("id").as("c_id"), col("src_ip").as("c_src_ip"),
        col("start_at_ms").as("c_start"), col("end_at_ms").as("c_end"))
      .withColumn("c_time", timestamp_millis(col("c_start")))
      .withWatermark("c_time", maxOutOfOrder)
    p.join(c,
      col("p_dst_ip") === col("c_src_ip") &&
        col("p_id") =!= col("c_id") &&
        col("p_start") <= col("c_start") &&
        col("p_end") >= col("c_end") &&
        col("p_end") >= col("p_start") && col("c_end") >= col("c_start") &&
        col("c_time") >= col("p_time") &&
        col("c_time") <= col("p_time") + expr(s"INTERVAL $maxSpanMs MILLISECONDS"))
      .select(col("p_id").as("parent_id"), col("c_id").as("child_id"))
  }
}
