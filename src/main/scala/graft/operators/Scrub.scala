package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** PII / secret redaction — the scrub pass a curation pipeline runs between
  * decontamination and split assignment (quality → dedup → decontaminate →
  * SCRUB → split). Four regex families (emails, phone numbers, IPv4
  * addresses, secret keys) are detected, counted, and replaced with typed
  * placeholder tokens; the per-source audit reports what was removed where —
  * the artifact a data-governance review actually asks for.
  *
  * The corpus itself is a digit-free synthetic word stream, so true
  * positives cannot occur naturally; [[dirtyText]] plants deterministic
  * doc_id-derived PII spans in a fixed subset of documents (the same
  * deterministic-fake pattern as [[Multimodal]]'s media decode). The
  * detection/redaction machinery — the product — is real, regex-portable
  * (no `\d`, no lookaround; runs identically on Java regex and RE2), and
  * the DuckDB oracle replays both the planting and the scrub.
  *
  * Scale shape: map-only — one projection computes matches, counts, and the
  * scrubbed text per row; the audit is one map-side-combined groupBy on
  * `source`. No shuffle beyond the ~20-key aggregation, trivially
  * streamable (the same projection is valid in a `readStream` ingest), and
  * scan-bandwidth-bound at 100 TB.
  */
object Scrub {

  /** The redaction families, in scrub order. Patterns avoid Java/RE2
    * divergences: character classes only, no word boundaries, no
    * backreferences.
    */
  private[graft] val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private[graft] val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  private[graft] val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private[graft] val KeyRe = "sk-[a-z0-9]{8,}"

  private[graft] val Families: Seq[(String, String, String)] = Seq(
    ("emails", EmailRe, "[EMAIL]"),
    ("phones", PhoneRe, "[PHONE]"),
    ("ips", Ipv4Re, "[IP]"),
    ("keys", KeyRe, "[KEY]"))

  /** Documents with deterministically planted PII: every doc_id divisible
    * by 3 gains an email, by 5 a phone, by 7 an IPv4, by 11 a secret key —
    * all derived from doc_id so both engines plant byte-identical spans.
    */
  private[graft] def dirtyText(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" reach user"), col("doc_id").cast("string"),
              lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" call 800-555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
              lit("."), (col("doc_id") % 250 + 1).cast("string")))
            .otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" token sk-"),
              substring(md5(concat(lit("key:"), col("doc_id").cast("string"))),
                1, 16))).otherwise(lit(""))).as("dirty"))

  private[graft] def matchCount(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** The scrub transform itself (all four family regexes folded) — shared
    * with the streaming funnel so batch and stream redact identically.
    */
  private[graft] def scrubbed(c: Column): Column =
    Families.foldLeft(c) { case (x, (_, re, tok)) =>
      regexp_replace(x, re, tok)
    }

  private def matchChars(c: Column, re: String): Column =
    coalesce(aggregate(regexp_extract_all(c, lit(re), lit(0)),
      lit(0L), (a, x) => a + length(x).cast("long")), lit(0L))

  /** Per-source redaction audit over the scrubbed corpus: documents
    * scanned, matches per family, characters removed, and the residual
    * match count over the CLEAN text (a self-audit that must be zero —
    * computed, not assumed). Ordered by source.
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val d = dirtyText(spark, dir)
    val clean = scrubbed(col("dirty"))
    val counted = d.select(
      col("source") +:
        Families.map { case (name, re, _) =>
          matchCount(col("dirty"), re).as(s"c_$name")
        } :+
        Families.map { case (_, re, _) => matchChars(col("dirty"), re) }
          .reduce(_ + _).as("c_chars") :+
        Families.map { case (_, re, _) => matchCount(clean, re) }
          .reduce(_ + _).as("c_residual"): _*)
    counted.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("c_emails")).as("n_emails"),
        sum(col("c_phones")).as("n_phones"),
        sum(col("c_ips")).as("n_ips"),
        sum(col("c_keys")).as("n_keys"),
        sum(col("c_chars")).as("chars_removed"),
        sum(col("c_residual")).as("n_residual"))
      .orderBy("source")
  }
}
