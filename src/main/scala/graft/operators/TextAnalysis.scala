package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text-quality operators over `documents.parquet`: stats, quality scoring,
  * language-ID, tokenization, fingerprinting. All single-pass map + narrow
  * agg — embarrassingly parallel, no shuffle beyond the final (tiny) sort;
  * the 100 TB story is pure scan throughput with full column pruning.
  *
  * Outputs are integers (or single-op doubles) so they hash-compare exactly
  * against DuckDB.
  */
object TextAnalysis {

  /** Per-document statistics + quality score. */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(col("doc_id"), col("n_chars"),
        length(col("text")).cast("long").as("n_chars_calc"),
        split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("n_chars"), col("n_chars_calc"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct_words"),
        aggregate(transform(col("w"), x => length(x)), lit(0),
          (acc, v) => greatest(acc, v)).cast("long").as("max_word_len"),
        size(filter(col("w"), x =>
          x === "the" || x === "a" || x === "of" || x === "and"))
          .cast("long").as("stopword_n"))
      .withColumn("quality_pct",
        expr("(100 * n_distinct_words) div n_words"))
      .orderBy("doc_id")
  }

  /** Language-ID by marker-word voting. The marker profiles are "learned"
    * offline from per-language frequency stats (as real n-gram lang-id is);
    * prediction is an argmax with a fixed tie-break order, fully
    * deterministic.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    def hits(words: Seq[String]) = {
      val w = col("w")
      size(filter(w, x => words.map(x === _).reduce(_ || _))).cast("long")
    }
    d.select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("lang"),
        hits(Seq("the", "order", "table", "window")).as("s_en"),
        hits(Seq("slow", "agg", "merge", "vector")).as("s_es"),
        hits(Seq("scan", "data", "query", "small")).as("s_fr"),
        hits(Seq("customer", "hash", "join", "row")).as("s_de"),
        hits(Seq("join", "small", "customer", "column")).as("s_zh"))
      .withColumn("pred_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_fr") &&
          col("s_en") >= col("s_de") && col("s_en") >= col("s_zh"), "en")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_de") &&
            col("s_es") >= col("s_zh"), "es")
          .when(col("s_fr") >= col("s_de") && col("s_fr") >= col("s_zh"), "fr")
          .when(col("s_de") >= col("s_zh"), "de")
          .otherwise("zh"))
      .select(col("doc_id"), col("lang"), col("pred_lang"),
        (col("pred_lang") === col("lang")).cast("long").as("is_match"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace tokens vs a BPE-ish regex token stream
    * (`[a-z0-9]+` runs and single non-space symbols).
    */
  def tokenCount(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    d.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("re_tokens"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("chars_per_token",
        expr("n_chars div greatest(re_tokens, 1)"))
      .orderBy("doc_id")
  }

  /** Document fingerprints: min rolling (5-gram) content hash — the
    * winnowing-style representative — plus the 63-bit simhash and a prefix
    * hash. Join any two of these to bucket candidate duplicates at scale.
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
    // min gram hash as a pure array expression: array_min over per-gram
    // hashes — zero shuffle (the explode+groupBy form moved one row per
    // 5-gram through an aggregation for a per-doc min the map side can
    // compute alone). prefix_hash rides the same scan.
    val w = split(col("text"), " ")
    val gramArr = when(size(w) >= 5,
      transform(sequence(lit(1), size(w) - 4),
        i => concat_ws(" ", slice(w, i, lit(5)))))
      .otherwise(array(concat_ws(" ", w)))
    val mapSide = d.select(col("doc_id"),
      array_min(transform(gramArr, g => Tables.portableHash(g))).as("min_gram_hash"),
      Tables.portableHash(concat_ws(" ", slice(w, 1, 8))).as("prefix_hash"))
    val sim = Dedup.simhashesFor(spark, dir)
    mapSide.join(sim, "doc_id")
      .select("doc_id", "min_gram_hash", "simhash", "prefix_hash")
      .orderBy("doc_id")
  }
}
