package graft
package entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables
import OracleCtes._

/** Query + oracle registry: multimodal binary-column operators: metadata, frame sampling, chunk dedup.
  *
  * Split out of the former SparkEntry monolith (round 9); merged back into
  * the driver contract by [[graft.SparkEntry]]. Key sets of [[queries]] and
  * [[oracles]] stay aligned — EntryRegistrySpec enforces it.
  */
object MultimodalQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // multimodal (frame_hashes array → CSV string for the driver compare;
    // Multimodal.mediaMeta keeps the typed ArrayType column)
    "media_meta" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Multimodal.mediaMeta(s, d)
        .withColumn("frame_hashes",
          concat_ws(",", transform(col("frame_hashes"), _.cast("string"))))
    }),
    "media_frames" -> ((s, d) => Multimodal.mediaFrames(s, d)),
    "media_dedup" -> ((s, d) => Multimodal.mediaDedup(s, d)),
    "media_type_stats" -> ((s, d) => Multimodal.mediaTypeStats(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "media_meta" ->
      """SELECT doc_id,
        |       CASE WHEN source = 'src0' THEN 'image'
        |            WHEN source = 'src1' THEN 'audio'
        |            WHEN source = 'src2' THEN 'video'
        |            ELSE 'text' END AS media_type,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       CAST(octet_length(encode(text)) // 100 + 1 AS BIGINT) AS n_frames,
        |       CAST(64 + CAST('0x' || substr(md5('w' || doc_id), 1, 15) AS BIGINT) % 1920
        |            AS BIGINT) AS width,
        |       CAST(64 + CAST('0x' || substr(md5('h' || doc_id), 1, 15) AS BIGINT) % 1080
        |            AS BIGINT) AS height,
        |       array_to_string(list_transform(
        |         generate_series(0, CAST(least(octet_length(encode(text)) // 100, 3) AS BIGINT)),
        |         j -> CAST(CAST('0x' || substr(md5(text || '#' || j), 1, 15) AS BIGINT)
        |                   AS VARCHAR)), ',')
        |         AS frame_hashes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "media_frames" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CASE WHEN source = 'src0' THEN 'image'
        |              WHEN source = 'src1' THEN 'audio'
        |              WHEN source = 'src2' THEN 'video'
        |              ELSE 'text' END AS media_type,
        |         octet_length(encode(text)) AS blen, text,
        |         CAST(64 + CAST('0x' || substr(md5('w' || doc_id), 1, 15) AS BIGINT) % 1920
        |              AS BIGINT) AS width,
        |         CAST(64 + CAST('0x' || substr(md5('h' || doc_id), 1, 15) AS BIGINT) % 1080
        |              AS BIGINT) AS height
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, media_type, width, height, text,
        |         unnest(generate_series(0, CAST(least(blen // 100, 3) AS BIGINT)))
        |           AS frame_idx
        |  FROM m)
        |SELECT doc_id, media_type, CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST('0x' || substr(md5(text || '#' || frame_idx), 1, 15) AS BIGINT)
        |         AS frame_hash,
        |       width * 128 // greatest(width, height) AS thumb_w,
        |       height * 128 // greatest(width, height) AS thumb_h
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    // Replays mediaDedup's chunking exactly: 100-char chunks at the same
    // sample positions as media_frames, portable 60-bit hash.
    "media_dedup" ->
      s"""WITH m AS (
         |  SELECT doc_id, length(text) AS blen, text FROM documents),
         |f AS (
         |  SELECT doc_id,
         |         unnest(generate_series(0, CAST(least(blen // 100, 3) AS BIGINT)))
         |           AS j
         |  FROM m),
         |h AS (
         |  SELECT f.doc_id,
         |         ${Tables.portableHashSql("substr(m.text, CAST(f.j * 100 + 1 AS BIGINT), 100)")}
         |           AS frame_hash
         |  FROM f JOIN m ON f.doc_id = m.doc_id)
         |SELECT frame_hash, count(DISTINCT doc_id) AS n_docs,
         |       min(doc_id) AS keep_doc, count(*) AS n_frames
         |FROM h GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY frame_hash""".stripMargin,
    "media_type_stats" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CASE WHEN source = 'src0' THEN 'image'
        |              WHEN source = 'src1' THEN 'audio'
        |              WHEN source = 'src2' THEN 'video'
        |              ELSE 'text' END AS media_type,
        |         octet_length(encode(text)) AS blen, text,
        |         CAST(64 + CAST('0x' || substr(md5('w' || doc_id), 1, 15) AS BIGINT) % 1920
        |              AS BIGINT) AS wi,
        |         CAST(64 + CAST('0x' || substr(md5('h' || doc_id), 1, 15) AS BIGINT) % 1080
        |              AS BIGINT) AS he
        |  FROM documents),
        |base AS (
        |  SELECT media_type, count(*) AS n_docs,
        |         CAST(sum(blen) AS BIGINT) AS total_bytes,
        |         CAST(sum(blen // 100 + 1) AS BIGINT) AS total_frames,
        |         CAST(sum(wi) // count(*) AS BIGINT) AS avg_w,
        |         CAST(sum(he) // count(*) AS BIGINT) AS avg_h
        |  FROM m GROUP BY 1),
        |fh AS (
        |  SELECT media_type,
        |         CAST('0x' || substr(md5(text || '#' || j), 1, 15) AS BIGINT) AS fh
        |  FROM m, unnest(generate_series(0, CAST(least(blen // 100, 3) AS BIGINT)))
        |         AS t(j)),
        |dh AS (SELECT media_type, count(DISTINCT fh) AS n_distinct_frames
        |       FROM fh GROUP BY 1)
        |SELECT base.media_type, base.n_docs, base.total_bytes, base.total_frames,
        |       base.avg_w, base.avg_h, dh.n_distinct_frames
        |FROM base JOIN dh ON base.media_type = dh.media_type
        |ORDER BY base.media_type""".stripMargin,
  )
}
