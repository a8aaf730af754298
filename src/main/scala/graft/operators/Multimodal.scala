package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal column plumbing: media payloads as opaque binary columns with
  * typed metadata, processed by a per-partition batch "decoder".
  *
  * The decode itself is a STUB — image/audio codecs are not available in
  * this environment — but everything Spark-side is real and tested: the
  * binary column derivation, the typed Dataset schema, the `mapPartitions`
  * batch shape (one decoder instantiation per partition, streaming over
  * rows — exactly how a JNI/FFmpeg decoder is amortized at scale), and the
  * deterministic per-frame feature extraction.
  *
  * The stub's outputs are pure functions of the payload bytes (md5-derived),
  * so the whole pipeline remains DuckDB-oracle-checkable — the oracle
  * replays the same arithmetic in SQL.
  */
object Multimodal {

  /** Input: payload bytes + claimed media type. */
  final case class MediaIn(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded metadata + per-frame features (fake but deterministic). */
  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      byte_len: Long,
      n_frames: Long,
      width: Long,
      height: Long,
      frame_hashes: Seq[Long])

  /** Media table derivation: documents → (doc_id, media_type, payload). */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      when(col("source") === "src0", "image")
        .when(col("source") === "src1", "audio")
        .when(col("source") === "src2", "video")
        .otherwise("text").as("media_type"),
      col("text").cast("binary").as("payload"))

  // ---- the decoder stub (Scala mirror of Tables.portableHash semantics) ----

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("MD5").digest(bytes)
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Identical to [[Tables.portableHash]]: first 15 md5 hex digits as int64. */
  private[operators] def portableHashBytes(bytes: Array[Byte]): Long =
    java.lang.Long.parseLong(md5Hex(bytes).substring(0, 15), 16)

  private def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  /** The per-record "decode": byte length → frame count; per-frame sample
    * hash; fake dimensions from the content hash. In production this is the
    * codec call; the batch shape around it is what matters here.
    */
  private[operators] def decodeOne(in: MediaIn): MediaMeta = {
    val len = in.payload.length.toLong
    val nFrames = len / 100 + 1
    val sampled = math.min(nFrames - 1, 3L)
    // decode the payload ONCE per record, not once per sampled frame —
    // this map is the per-partition hot loop
    val s = new String(in.payload, StandardCharsets.UTF_8)
    val hashes = (0L to sampled).map { j =>
      portableHashBytes(utf8(s + "#" + j))
    }
    val w = 64 + portableHashBytes(utf8("w" + in.doc_id)) % 1920
    val h = 64 + portableHashBytes(utf8("h" + in.doc_id)) % 1080
    MediaMeta(in.doc_id, in.media_type, len, nFrames, w, h, hashes)
  }

  /** Typed batch-decode pipeline: one decoder per partition, streamed rows. */
  def decode(media: Dataset[MediaIn]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (JNI handle, codec ctx, …)
      rows.map(decodeOne)
    }
  }

  /** Session-memoized decoded relation — the decode (the expensive codec
    * stage in a real pipeline) runs once per session and serves
    * [[mediaMeta]], [[mediaFrames]] and [[mediaTypeStats]]; previously
    * each consumer (and mediaTypeStats' two aggregation branches) re-ran
    * the full decode.
    */
  private[graft] def mediaMetaFor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.sources.Materialized.of(spark, s"mediameta:$dir")(
      decode(mediaTable(spark, dir).as[MediaIn]).toDF())
  }

  /** The oracle-checked query: derive media table, batch-decode, project
    * metadata sorted by doc_id.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaMetaFor(spark, dir).orderBy("doc_id")

  /** Frame-sample + resize plumbing: the decoded docs fanned out 1→N to one
    * row per sampled frame (`posexplode` — the UDTF shape), each carrying an
    * aspect-preserving integer thumbnail target (long edge 128). In
    * production the per-frame row is where pixel work happens; here the
    * generator fan-out, the deterministic sample positions, and the integer
    * resize arithmetic are the real, oracle-checked parts.
    */
  def mediaFrames(spark: SparkSession, dir: String): DataFrame = {
    val meta = mediaMetaFor(spark, dir)
    meta.select(col("doc_id"), col("media_type"), col("width"), col("height"),
        posexplode(col("frame_hashes")).as(Seq("frame_idx", "frame_hash")))
      .select(col("doc_id"), col("media_type"),
        col("frame_idx").cast("long").as("frame_idx"), col("frame_hash"),
        expr("width * 128 div greatest(width, height)").as("thumb_w"),
        expr("height * 128 div greatest(width, height)").as("thumb_h"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Cross-document media-chunk dedup: each payload is cut into up to four
    * 100-CHARACTER chunks (its own chunking scheme — character-positioned
    * over the text encoding, distinct from [[decodeOne]]'s byte-positioned
    * whole-payload frame hashes; the two coincide only on ASCII payloads
    * like this corpus), hashed and grouped — chunks shared by ≥ 2
    * documents flag duplicated media content even when the containing
    * documents differ elsewhere (the chunk-level exact-dedup stage of an
    * asset pipeline; near-identical payloads collide on their unchanged
    * chunks). One hash-shuffle keyed by the 60-bit chunk hash — the
    * [[Dedup.dedupExact]] shape.
    */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    val chunks = d
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("blen"))
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), expr("least(blen div 100, 3)"))).as("j"))
      .select(col("doc_id"),
        Tables.portableHash(
          expr("substring(text, cast(j * 100 + 1 as int), 100)")).as("frame_hash"))
    chunks.groupBy("frame_hash")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("keep_doc"),
        count(lit(1)).as("n_frames"))
      .where(col("n_docs") >= 2)
      .orderBy("frame_hash")
  }

  /** Per-media-type corpus report over the decoded relation: document and
    * byte volumes, frame totals, integer mean dimensions, and distinct
    * sampled-frame hashes (the asset-pipeline inventory numbers). Rides
    * the same batch-decode; the distinct-hash side is one explode +
    * countDistinct keyed by the tiny media_type domain.
    */
  def mediaTypeStats(spark: SparkSession, dir: String): DataFrame = {
    val meta = mediaMetaFor(spark, dir)
    val base = meta.groupBy("media_type")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("byte_len")).as("total_bytes"),
        sum(col("n_frames")).as("total_frames"),
        expr("sum(width) div count(1)").as("avg_w"),
        expr("sum(height) div count(1)").as("avg_h"))
    val dh = meta
      .select(col("media_type"), explode(col("frame_hashes")).as("fh"))
      .groupBy("media_type")
      .agg(countDistinct(col("fh")).as("n_distinct_frames"))
    base.join(dh, "media_type").orderBy("media_type")
  }
}
