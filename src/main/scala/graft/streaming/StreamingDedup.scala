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

/** One paragraph occurrence on the stream ([[StreamingDedup.paraDedupStream]]). */
final case class ParaRecord(
    doc_id: Long,
    pos: Int,
    h: Long,
    plen: Long,
    n_paras: Int,
    ts_ms: Long,
    event_time: Timestamp)

/** The earliest holder of a paragraph hash — (ts, doc, pos) total order. */
final case class ParaOwner(ts_ms: Long, doc_id: Long, pos: Int)

private final case class PendingPara(
    doc_id: Long, pos: Int, plen: Long, n_paras: Int, ts_ms: Long)

/** Stage-1 verdict: is this paragraph occurrence a repeat of one seen
  * earlier (anywhere in the corpus, including earlier in the same doc)?
  */
final case class ParaVerdict(
    doc_id: Long, removed: Boolean, plen: Long, n_paras: Int,
    event_time: Timestamp)

/** Terminal per-doc paragraph-dedup stats — same shape as the batch
  * `q_para_dedup` row.
  */
final case class ParaDocStats(
    doc_id: Long, n_paras: Long, n_removed: Long, kept_chars: Long)

/** Stage 1 of the streaming paragraph dedup — keyed by paragraph hash.
  * Identical architecture to [[SigIndexProcessor]] (owner = the minimum
  * (ts, doc_id, pos) ever seen; pending occurrences await watermark
  * finality on a rolling event-time timer); only the ownership tuple
  * gains the in-document position so that a paragraph repeated WITHIN one
  * document keeps exactly its first block, matching the batch winner rule
  * `min(struct(doc_id, pos))`.
  */
final class ParaIndexProcessor
    extends StatefulProcessor[Long, ParaRecord, ParaVerdict] {

  @transient private var owner: org.apache.spark.sql.streaming.ValueState[ParaOwner] = _
  @transient private var pending: org.apache.spark.sql.streaming.ListState[PendingPara] = _
  @transient private var timerAt: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    owner = getHandle.getValueState[ParaOwner]("owner",
      Encoders.product[ParaOwner], TTLConfig.NONE)
    pending = getHandle.getListState[PendingPara]("pending",
      Encoders.product[PendingPara], TTLConfig.NONE)
    timerAt = getHandle.getValueState[Long]("timer_at",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  private def beats(aTs: Long, aDoc: Long, aPos: Int, b: ParaOwner): Boolean =
    aTs < b.ts_ms || (aTs == b.ts_ms && (aDoc < b.doc_id ||
      (aDoc == b.doc_id && aPos < b.pos)))

  private def armTimer(at: Long): Unit =
    if (!timerAt.exists() || at < timerAt.get()) {
      if (timerAt.exists()) getHandle.deleteTimer(timerAt.get())
      getHandle.registerTimer(at)
      timerAt.update(at)
    }

  override def handleInputRows(key: Long, rows: Iterator[ParaRecord],
      timers: TimerValues): Iterator[ParaVerdict] = {
    var cur = if (owner.exists()) owner.get() else null
    rows.foreach { r =>
      if (cur == null || beats(r.ts_ms, r.doc_id, r.pos, cur))
        cur = ParaOwner(r.ts_ms, r.doc_id, r.pos)
      pending.appendValue(PendingPara(r.doc_id, r.pos, r.plen, r.n_paras, r.ts_ms))
      armTimer(r.ts_ms)
    }
    if (cur != null) owner.update(cur)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[ParaVerdict] = {
    val wm = math.max(expired.getExpiryTimeInMs(), timers.getCurrentWatermarkInMs())
    val own = owner.get()
    val out = Seq.newBuilder[ParaVerdict]
    val keep = Seq.newBuilder[PendingPara]
    var minSurviving = Long.MaxValue
    pending.get().foreach { p =>
      if (p.ts_ms <= wm) {
        // owner is the min over every record seen (p included), so
        // owner ≤ p always: removed ⇔ p is not itself the owner tuple
        val removed =
          !(own.ts_ms == p.ts_ms && own.doc_id == p.doc_id && own.pos == p.pos)
        out += ParaVerdict(p.doc_id, removed, p.plen, p.n_paras,
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

/** Stage 2 — keyed by doc_id: fold paragraph verdicts into the per-doc
  * (n_paras, n_removed, kept_chars) row, emitting once all of the doc's
  * paragraphs (the `n_paras` carried on every record) have verdicts.
  */
final class ParaDocStatsProcessor
    extends StatefulProcessor[Long, ParaVerdict, ParaDocStats] {

  @transient private var seenCnt: org.apache.spark.sql.streaming.ValueState[Long] = _
  @transient private var removedCnt: org.apache.spark.sql.streaming.ValueState[Long] = _
  @transient private var keptChars: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    seenCnt = getHandle.getValueState[Long]("seen_cnt",
      Encoders.scalaLong, TTLConfig.NONE)
    removedCnt = getHandle.getValueState[Long]("removed_cnt",
      Encoders.scalaLong, TTLConfig.NONE)
    keptChars = getHandle.getValueState[Long]("kept_chars",
      Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[ParaVerdict],
      timers: TimerValues): Iterator[ParaDocStats] = {
    var seen = if (seenCnt.exists()) seenCnt.get() else 0L
    var removed = if (removedCnt.exists()) removedCnt.get() else 0L
    var chars = if (keptChars.exists()) keptChars.get() else 0L
    var expected = -1
    rows.foreach { v =>
      seen += 1
      if (v.removed) removed += 1 else chars += v.plen
      expected = v.n_paras
    }
    if (expected >= 0 && seen >= expected) {
      seenCnt.clear(); removedCnt.clear(); keptChars.clear()
      Iterator.single(ParaDocStats(key, seen, removed, chars))
    } else {
      seenCnt.update(seen); removedCnt.update(removed); keptChars.update(chars)
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

  /** The per-paragraph records of a doc stream, mirroring the batch
    * [[graft.operators.Corpus.paraDedup]] construction bit-for-bit: the
    * same [[graft.operators.Corpus.ParaWords]]-word blocks, the same
    * [[graft.operators.Corpus.MinParaWords]] short-tail filter (applied
    * AFTER posexplode so `pos` matches the batch winner tiebreak), the
    * same portable hash. `n_paras` (the doc's surviving-block count) rides
    * every record so stage 2 knows when a doc's verdicts are complete.
    */
  def paragraphRecords(docs: DataFrame): DataFrame = {
    import graft.operators.Corpus.{MinParaWords, ParaWords}
    val parasArr = expr(
      s"""transform(
         |  sequence(0L, (cast(size(w) AS BIGINT) + ${ParaWords - 1}) div $ParaWords - 1),
         |  i -> array_join(slice(w, cast(i * $ParaWords + 1 AS INT), $ParaWords), ' '))""".stripMargin)
    docs
      .select(col("doc_id"), col("ts_ms"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("ts_ms"), parasArr.as("ps"))
      .withColumn("n_paras",
        size(filter(col("ps"), p => size(split(p, " ")) >= MinParaWords)))
      .select(col("doc_id"), col("ts_ms"), col("n_paras"),
        posexplode(col("ps")).as(Seq("pos", "para")))
      .where(size(split(col("para"), " ")) >= MinParaWords)
      .select(col("doc_id"), col("pos"),
        graft.sources.Tables.portableHash(col("para")).as("h"),
        length(col("para")).cast("long").as("plen"),
        col("n_paras"), col("ts_ms"),
        timestamp_millis(col("ts_ms")).as("event_time"))
  }

  /** Streaming paragraph-level exact dedup — the batch `q_para_dedup`
    * (C4-style repeated-span pass) as the same two-stage chained stateful
    * topology as [[minhashDedupStream]]: stage 1 keys by paragraph hash
    * and rules each occurrence kept/removed against the hash's earliest
    * owner in (ts, doc_id, pos) order once the watermark makes it final;
    * stage 2 folds verdicts into the per-doc (n_paras, n_removed,
    * kept_chars) row. With ts_ms = doc_id the result equals the batch
    * operator exactly (StreamingParaDedupSpec, shuffled arrival).
    *
    * State: one owner tuple per DISTINCT paragraph hash (the streaming
    * form of the batch winner relation — same asymptotics as the batch
    * shuffle key set, sharded by hash), plus in-flight occurrences bounded
    * by the watermark delay. Per-doc stage-2 state clears on emit.
    */
  def paraDedupStream(docs: DataFrame, maxOutOfOrder: String = "30 seconds")
      : Dataset[ParaDocStats] = {
    val spark = docs.sparkSession
    import spark.implicits._
    paragraphRecords(docs)
      .withWatermark("event_time", maxOutOfOrder)
      .as[ParaRecord]
      .groupByKey(_.h)
      .transformWithState(new ParaIndexProcessor, "event_time", OutputMode.Append)
      .groupByKey(_.doc_id)
      .transformWithState(new ParaDocStatsProcessor, TimeMode.None, OutputMode.Append)
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
