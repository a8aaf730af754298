package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** One (doc, band) signature record on the stream. */
final case class SigRecord(
    doc_id: Long,
    band: Int,
    sig: String,
    ts_ms: Long,
    event_time: Timestamp)

/** Stage-1 verdict: was this doc's band signature introduced earlier by
  * another doc?
  */
final case class BandVerdict(
    doc_id: Long,
    band: Int,
    beaten: Boolean,
    event_time: Timestamp)

/** Terminal per-doc verdict. */
final case class DedupVerdict(doc_id: Long, kept: Boolean, n_bands_beaten: Long)

/** (ts, doc) ownership tuple — the total order deciding "earlier". */
final case class SigOwner(ts_ms: Long, doc_id: Long)

private final case class PendingSig(doc_id: Long, band: Int, ts_ms: Long)

/** Stage 1 — keyed by band signature. State is the signature's OWNER (the
  * minimum (ts, doc_id) ever seen — the streaming form of the batch
  * inverted signature index) plus the records awaiting finality. A record
  * (t, d) is "beaten" iff some record with (ts, doc) < (t, d) shares the
  * signature; every such record has ts ≤ t, so once the watermark passes t
  * the owner comparison is final — verdicts emit on a rolling event-time
  * timer exactly like the chain-link eviction scan.
  *
  * The owner entry is the per-signature index and is never evicted (a
  * future document may near-dup anything seen so far) — identical growth
  * to the batch index, sharded by signature across executors. Deployments
  * that only need dedup within a horizon attach a TTL to `owner`.
  */
final class SigIndexProcessor
    extends StatefulProcessor[String, SigRecord, BandVerdict] {

  @transient private var owner: org.apache.spark.sql.streaming.ValueState[SigOwner] = _
  @transient private var pending: org.apache.spark.sql.streaming.ListState[PendingSig] = _
  @transient private var timerAt: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    owner = getHandle.getValueState[SigOwner]("owner",
      Encoders.product[SigOwner], TTLConfig.NONE)
    pending = getHandle.getListState[PendingSig]("pending",
      Encoders.product[PendingSig], TTLConfig.NONE)
    timerAt = getHandle.getValueState[Long]("timer_at",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  private def armTimer(at: Long): Unit =
    if (!timerAt.exists() || at < timerAt.get()) {
      if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
      getHandle.registerTimer(at)
      timerAt.update(at)
    }

  override def handleInputRows(key: String, rows: Iterator[SigRecord],
      timers: TimerValues): Iterator[BandVerdict] = {
    var cur = if (owner.exists()) owner.get() else null
    rows.foreach { r =>
      if (cur == null || r.ts_ms < cur.ts_ms ||
        (r.ts_ms == cur.ts_ms && r.doc_id < cur.doc_id))
        cur = SigOwner(r.ts_ms, r.doc_id)
      pending.appendValue(PendingSig(r.doc_id, r.band, r.ts_ms))
      armTimer(r.ts_ms)
    }
    if (cur != null) owner.update(cur)
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[BandVerdict] = {
    val wm = math.max(expired.getExpiryTimeInMs(), timers.getCurrentWatermarkInMs())
    val own = owner.get()
    val out = Seq.newBuilder[BandVerdict]
    val keep = Seq.newBuilder[PendingSig]
    var minSurviving = Long.MaxValue
    pending.get().foreach { p =>
      if (p.ts_ms <= wm) {
        val beaten = own.ts_ms < p.ts_ms ||
          (own.ts_ms == p.ts_ms && own.doc_id < p.doc_id)
        out += BandVerdict(p.doc_id, p.band, beaten,
          new Timestamp(math.max(p.ts_ms, wm + 1)))
      } else {
        keep += p
        if (p.ts_ms < minSurviving) minSurviving = p.ts_ms
      }
    }
    pending.clear()
    timerAt.clear()
    val kept = keep.result()
    if (kept.nonEmpty) {
      pending.appendList(kept.toArray)
      armTimer(minSurviving)
    }
    out.result().iterator
  }
}

/** Stage-1 idle-flush personality (the W4 pattern of
  * [[ProcTimeChainLink]] applied to the dedup index): processing-time
  * mode, one rolling idle timer per signature — `idleFlushMs` after a
  * signature key quiesces, every pending record's verdict emits against
  * the owner known at that point. A bounded replay (batch-file dedup
  * through the streaming API) therefore emits ALL verdicts with no flush
  * sentinel. Divergence, documented: a record arriving AFTER its
  * signature flushed is judged against the then-current owner and cannot
  * retract earlier verdicts — the same orphan-discard semantics class as
  * the reference's late-update handling.
  */
final class ProcTimeSigIndexProcessor(idleFlushMs: Long)
    extends StatefulProcessor[String, SigRecord, BandVerdict] {

  @transient private var owner: org.apache.spark.sql.streaming.ValueState[SigOwner] = _
  @transient private var pending: org.apache.spark.sql.streaming.ListState[PendingSig] = _
  @transient private var idleAt: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    owner = getHandle.getValueState[SigOwner]("owner",
      Encoders.product[SigOwner], TTLConfig.NONE)
    pending = getHandle.getListState[PendingSig]("pending",
      Encoders.product[PendingSig], TTLConfig.NONE)
    idleAt = getHandle.getValueState[Long]("idle_at",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  private def rearmIdle(timers: TimerValues): Unit = {
    val fireAt = timers.getCurrentProcessingTimeInMs() + idleFlushMs
    if (idleAt.exists()) getHandle.deleteTimer(idleAt.get())
    getHandle.registerTimer(fireAt)
    idleAt.update(fireAt)
  }

  override def handleInputRows(key: String, rows: Iterator[SigRecord],
      timers: TimerValues): Iterator[BandVerdict] = {
    var cur = if (owner.exists()) owner.get() else null
    rows.foreach { r =>
      if (cur == null || r.ts_ms < cur.ts_ms ||
        (r.ts_ms == cur.ts_ms && r.doc_id < cur.doc_id))
        cur = SigOwner(r.ts_ms, r.doc_id)
      pending.appendValue(PendingSig(r.doc_id, r.band, r.ts_ms))
    }
    if (cur != null) owner.update(cur)
    rearmIdle(timers)
    Iterator.empty
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[BandVerdict] = {
    // stale-timer guard (same as the chain-link proc-time processors): a
    // timer superseded by newer input in this very micro-batch must not
    // flush — it would judge just-added pending records before their idle
    // window and desync idleAt from the live timer
    if (!idleAt.exists() || idleAt.get() != expired.getExpiryTimeInMs())
      return Iterator.empty
    val own = owner.get()
    val now = new Timestamp(timers.getCurrentProcessingTimeInMs())
    val out = pending.get().map { p =>
      val beaten = own.ts_ms < p.ts_ms ||
        (own.ts_ms == p.ts_ms && own.doc_id < p.doc_id)
      BandVerdict(p.doc_id, p.band, beaten, now)
    }.toSeq
    pending.clear()
    idleAt.clear()
    out.iterator
  }
}

/** Stage 2 — keyed by doc_id: gather the four band verdicts, emit the doc's
  * keep/drop decision once all four are in, clear. State is at most four
  * booleans per in-flight doc.
  */
final class DocVerdictProcessor
    extends StatefulProcessor[Long, BandVerdict, DedupVerdict] {

  @transient private var beatenCnt: org.apache.spark.sql.streaming.ValueState[Long] = _
  @transient private var seenCnt: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    beatenCnt = getHandle.getValueState[Long]("beaten_cnt",
      Encoders.scalaLong, TTLConfig.NONE)
    seenCnt = getHandle.getValueState[Long]("seen_cnt",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[BandVerdict],
      timers: TimerValues): Iterator[DedupVerdict] = {
    var seen = if (seenCnt.exists()) seenCnt.get() else 0L
    var beaten = if (beatenCnt.exists()) beatenCnt.get() else 0L
    rows.foreach { v =>
      seen += 1
      if (v.beaten) beaten += 1
    }
    if (seen >= 4L) {
      seenCnt.clear(); beatenCnt.clear()
      Iterator.single(DedupVerdict(key, kept = beaten == 0L, beaten))
    } else {
      seenCnt.update(seen); beatenCnt.update(beaten)
      Iterator.empty
    }
  }
}

/** Streaming MinHash-LSH near-dup dedup: the batch `dedup_minhash`
  * candidate machinery (16 portable minhashes, 4×4 banding) as a two-stage
  * chained stateful topology — the same architecture as the chain-link
  * pipeline. A document is KEPT iff none of its four band signatures was
  * introduced by an earlier document, "earlier" being the (ts, doc_id)
  * total order, which makes the streaming result deterministic and equal
  * to a batch greedy first-wins pass in that order (StreamingDedupSpec).
  *
  * Tail semantics: like every event-time operator, verdicts for documents
  * the final watermark never passes stay pending on a bounded replay —
  * the same W4 situation as the chain-link pipeline, and the same fix
  * applies: a `TimeMode.ProcessingTime` personality with the watermark
  * maintained in state ([[ProcTimeChainLink]] is the worked example; the
  * tests here use a far-future flush sentinel instead).
  */
object StreamingDedup {

  private val P = 1000000007L

  /** The 4 band-signature rows per document, as pure map-side expressions
    * mirroring `Dedup.minhash16For` / `minhashCandFor`'s permutation and
    * banding arithmetic bit-for-bit over the document's OWN distinct
    * shingles. Two deliberate single-pass divergences from the batch
    * index: (a) no corpus df cap (that needs corpus-level df counts a
    * pure stream doesn't have — boilerplate-dominated corpora should
    * pre-gate with the static-index [[StreamingOps.corpusProbeDedupStream]]);
    * (b) sub-3-word docs get a per-doc SENTINEL gram (batch gives them an
    * empty shingle set and so never pairs them) — the sentinel contains
    * NUL so it can't equal any real space-split trigram, making such docs
    * uncollidable here too: same always-kept verdict, but emitted through
    * the normal verdict path instead of silently missing.
    */
  def bandSignatures(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val grams = when(size(col("w")) >= 3,
      transform(sequence(lit(1), size(col("w")) - 2),
        i => concat_ws(" ", slice(col("w"), i, lit(3)))))
      .otherwise(array(concat(lit("\u0000short\u0000"), col("doc_id").cast("string"))))
    val hs = transform(array_distinct(col("g")),
      g => graft.functions.PortableHash60(g) % P)
    val mh = (0 to 15).map(j =>
      array_min(transform(col("hs"),
        h => (h * (j * 4097L + 1L) + (j * 12289L + 7L)) % P)).as(s"mh$j"))
    val bands = explode(array((0 to 3).map(b => struct(lit(b).as("band"),
      concat_ws(":", (4 * b to 4 * b + 3).map(j =>
        format_string("%02d@%d", lit(j), col(s"mh$j"))): _*).as("sig"))): _*))
    docs
      .select(col("doc_id"), col("ts_ms"), w.as("w"))
      .select(col("doc_id"), col("ts_ms"), grams.as("g"))
      .select(col("doc_id"), col("ts_ms"), hs.as("hs"))
      .select(Seq(col("doc_id"), col("ts_ms")) ++ mh: _*)
      .select(col("doc_id"), col("ts_ms"), bands.as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"),
        col("ts_ms"), timestamp_millis(col("ts_ms")).as("event_time"))
  }

  /** docs: (doc_id LONG, text STRING, ts_ms LONG) stream → keep/drop
    * verdicts.
    */
  def minhashDedupStream(docs: DataFrame, maxOutOfOrder: String = "30 seconds")
      : Dataset[DedupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandSignatures(docs)
      .withWatermark("event_time", maxOutOfOrder)
      .as[SigRecord]
      .groupByKey(r => s"${r.band}:${r.sig}")
      .transformWithState(new SigIndexProcessor, "event_time", OutputMode.Append)
      .groupByKey(_.doc_id)
      .transformWithState(new DocVerdictProcessor, TimeMode.None, OutputMode.Append)
  }

  /** Idle-flush personality: verdicts emit `idleFlush` after each
    * signature quiesces — bounded replays need no flush sentinel.
    */
  def minhashDedupStreamProcTime(docs: DataFrame, idleFlushMs: Long = 60000L)
      : Dataset[DedupVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandSignatures(docs)
      .as[SigRecord]
      .groupByKey(r => s"${r.band}:${r.sig}")
      .transformWithState(new ProcTimeSigIndexProcessor(idleFlushMs),
        TimeMode.ProcessingTime, OutputMode.Append)
      .groupByKey(_.doc_id)
      .transformWithState(new DocVerdictProcessor, TimeMode.None, OutputMode.Append)
  }
}
