package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.{Materialized, Tables}

/** Corpus-hygiene reports — the cross-document curation passes a
  * training-data pipeline runs AFTER per-doc quality scoring
  * ([[TextAnalysis]]) and near-dup detection ([[Dedup]]):
  *
  *  - [[boilerplateGrams]]: template/boilerplate contamination per source
  *    (C4/CCNet-style "drop text repeated across many pages", measured at
  *    the n-gram level because this corpus has no line structure),
  *  - [[sourceOverlap]]: pairwise cross-source n-gram containment (which
  *    sources are scraping the same upstream),
  *  - [[sourceDrift]]: per-source length-distribution shift vs the corpus
  *    (the "did this crawl batch change shape" check),
  *  - [[packBins]]: LPT-striped packing of documents into training shards
  *    balanced by token count.
  *
  * All arithmetic is integer (permille fixed-point) so the DuckDB oracle
  * hash-matches bit-for-bit. Every report is a constant number of
  * hash-shuffles on narrow keys — no all-pairs joins, no single-task
  * windows — so each survives a 100× corpus unchanged.
  */
object Corpus {

  /** Distinct shingle hashes per doc, UNCAPPED — unlike
    * [[Dedup.shinglesHashedFor]] this keeps the high-df tail, because
    * boilerplate detection needs exactly the shingles the near-dup index
    * drops. Memoized per session; 8-byte key, one explode + one project.
    */
  private[graft] def allShingleHashesFor(spark: SparkSession, dir: String): DataFrame =
    Materialized.of(spark, s"shhall:$dir")(
      Dedup.shinglesFor(spark, dir)
        .select(col("doc_id"), Tables.portableHash(col("shingle")).as("h")))

  /** A shingle is "boilerplate" when it appears in at least this many
    * documents. Fixed (not corpus-relative) so the flag means the same
    * thing on every batch of an incremental ingest; production recalibrates
    * per corpus (C4 used "any three-sentence span seen more than once").
    */
  private[graft] val BoilerplateDf = 3

  /** Per-source boilerplate contamination: for each document, the fraction
    * of its distinct 3-gram shingles that occur in ≥ [[BoilerplateDf]]
    * documents corpus-wide; rolled up per source.
    *
    * Output: source, n_docs, n_grams (Σ distinct shingles), n_common
    * (Σ boilerplate shingles), bp_permille = 1000·n_common div n_grams,
    * n_flagged = docs whose shingles are ≥ half boilerplate.
    *
    * Scale shape: the df relation is one map-side-combined groupBy on the
    * 8-byte hash (linear — the quadratic danger in [[Dedup]] is only the
    * *self-join*, never the count); flagging is a semi-join back on the
    * same key, then two narrow aggregations. The high-df posting lists
    * that would blow up a pairwise join are exactly what this report
    * counts, and counting is O(corpus).
    */
  def boilerplateGrams(spark: SparkSession, dir: String): DataFrame = {
    val shh = allShingleHashesFor(spark, dir)
    val common = shh.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") >= BoilerplateDf).select("h")
    val perDoc = shh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      .join(shh.join(common, Seq("h"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_common")),
        Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_common"))
    // roster-preserving: docs with < 3 words have no shingles but must
    // still count in n_docs, or this report's per-source doc counts
    // disagree with every other per-source report; such docs carry zero
    // grams and are never flagged (the flag needs n_sh > 0 evidence)
    val src = Tables.load(spark, dir, "documents").select("doc_id", "source")
    src.join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_sh", "n_common"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sh")).as("n_grams"),
        sum(col("n_common")).as("n_common"),
        sum(when(col("n_sh") > 0 && col("n_common") * 2 >= col("n_sh"),
          1L).otherwise(0L)).as("n_flagged"))
      .withColumn("bp_permille",
        when(col("n_grams") > 0, expr("1000 * n_common div n_grams"))
          .otherwise(lit(0L)))
      .select("source", "n_docs", "n_grams", "n_common", "bp_permille",
        "n_flagged")
      .orderBy("source")
  }

  /** Memoized distinct (source, shingle-hash) relation — both sides of
    * the [[sourceOverlap]] self-join read it, so the documents-join +
    * distinct over the capped shingle index is computed once per session,
    * not once per join side.
    */
  private[graft] def sourceShinglesFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"srch:$dir") {
      Dedup.shinglesHashedFor(spark, dir)
        .join(Tables.load(spark, dir, "documents").select("doc_id", "source"),
          "doc_id")
        .select("source", "h").distinct()
    }

  /** Pairwise cross-source contamination: for every source pair, the
    * number of distinct shingle hashes they share and the integer Jaccard
    * of their shingle sets (permille). Top 20 pairs by shared count.
    *
    * Uses the df-capped index ([[Dedup.shinglesHashedFor]]) deliberately:
    * corpus-wide boilerplate (df > cap) would say every pair overlaps
    * with every other — the capped index keeps only discriminative grams,
    * so a high count here means two sources really carry the same
    * content. Per-hash source lists are bounded by the source count
    * (a corpus constant ≪ doc count), so the self-join on `h` is linear
    * in distinct (source, gram) — the same reason the banding joins in
    * [[Dedup]] scale.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sh = sourceShinglesFor(spark, dir)
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n"))
    val shared = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .withColumn("jaccard_permille",
        expr("1000 * shared div (n_a + n_b - shared)"))
      .select("src_a", "src_b", "n_a", "n_b", "shared", "jaccard_permille")
      .orderBy(col("shared").desc, col("src_a"), col("src_b"))
      .limit(20)
  }

  /** Per-source length-distribution drift vs the whole corpus: token
    * counts are bucketed (width 8, clamped to 16 buckets), each source's
    * bucket histogram is normalized to permille, and the report is the L1
    * distance Σ_b |share_source(b) − share_corpus(b)| — 0 ⇒ identical
    * shape, 2000 ⇒ disjoint. The "did this crawl batch change shape"
    * check run on every ingest increment.
    *
    * The bucket grid is the corpus's observed bucket set (20 sources ×
    * ≤16 buckets — a broadcast-size grid), so sources missing a bucket
    * are charged the full corpus share there. Everything is counts and
    * integer division: two narrow groupBys + one broadcast join.
    */
  def sourceDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("source"),
        least(expr("size(split(text, ' ')) div 8"), lit(15)).cast("long").as("bucket"))
    // ONE corpus scan + tokenize: the (source, bucket) aggregate is tiny
    // (sources × ≤16 buckets), localCheckpointed, and every other total
    // derives from it — re-deriving each from `d` would re-run the scan
    // and the split() per reference
    val bySrc = d.groupBy("source", "bucket").agg(count(lit(1)).as("c_sb"))
      .localCheckpoint()
    val srcTot = bySrc.groupBy("source").agg(sum(col("c_sb")).as("n_s"))
    val byAll = bySrc.groupBy("bucket").agg(sum(col("c_sb")).as("c_b"))
    val n = bySrc.agg(sum(col("c_sb")).as("n")).select("n")
    val grid = srcTot.select("source", "n_s")
      .crossJoin(broadcast(byAll.crossJoin(broadcast(n))))
    grid.join(bySrc, Seq("source", "bucket"), "left")
      .na.fill(0L, Seq("c_sb"))
      .withColumn("dev",
        abs(expr("1000 * c_sb div n_s") - expr("1000 * c_b div n")))
      .groupBy("source")
      .agg(max(col("n_s")).as("n_docs"), sum(col("dev")).as("drift_permille"))
      .orderBy("source")
  }

  /** Per-document n-gram novelty in corpus (doc_id) order: the fraction of
    * a document's distinct 3-gram shingles whose FIRST corpus occurrence is
    * this document. Early documents score high, later near-duplicates and
    * template pages score low — the curve data engineers read to decide
    * where a crawl stops adding information.
    *
    * Scale shape: first-occurrence is `min(doc_id)` per shingle hash — one
    * map-side-combined groupBy on the 8-byte key; the novel count per doc
    * is a second groupBy of that (already shingle-distinct) relation. Two
    * linear shuffles, no joins against the corpus text.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val shh = allShingleHashesFor(spark, dir)
    val novel = shh.groupBy("h").agg(min(col("doc_id")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    shh.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(novel, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_novel"))
      .withColumn("novelty_permille", expr("1000 * n_novel div n_grams"))
      .select("doc_id", "n_grams", "n_novel", "novelty_permille")
      .orderBy("doc_id")
  }

  /** Minimum prefix length (chars) for [[prefixDups]] candidate keying. */
  private[graft] val PrefixKeyLen = 60

  /** Df cap for the prefix-hash join key — same role as
    * [[Dedup.ShingleDfCap]]: a prefix shared by D documents contributes
    * D²/2 candidate pairs through one join key, and shared boilerplate
    * prefixes (site headers, templated pages) are the norm at corpus
    * scale. A prefix carried by more than `cap` documents is boilerplate,
    * not truncation evidence, so both engines drop it consistently.
    */
  private[graft] val PrefixDfCap = 64

  /** Truncation-duplicate pairs: (a, b) where document a's full text is a
    * prefix of document b's (the same page fetched with different
    * truncation — a dup class n-gram Jaccard often misses when the longer
    * page continues with fresh content). Equal-length pairs (exact dups)
    * are oriented by doc_id.
    *
    * Candidates join on the 60-bit hash of the first [[PrefixKeyLen]]
    * chars — an 8-byte shuffle key, df-capped at [[PrefixDfCap]] so a
    * boilerplate prefix can never make one join key quadratic (the
    * [[Dedup.ShingleDfCap]] argument applied to this index); group sizes
    * are then bounded by min(cap, true truncation-dup mass). The
    * verification `substring(b, 1, len(a)) = a` confirms full prefix
    * containment, so the hash key is only ever a candidate filter.
    */
  def prefixDups(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("l"))
      .where(col("l") >= PrefixKeyLen)
      .withColumn("pk",
        Tables.portableHash(substring(col("text"), 1, PrefixKeyLen)))
    val d = raw.join(
      raw.groupBy("pk").agg(count(lit(1)).as("df"))
        .where(col("df") <= PrefixDfCap).select("pk"),
      Seq("pk"), "left_semi")
    d.as("a").join(d.as("b"),
        col("a.pk") === col("b.pk") &&
          (col("a.l") < col("b.l") ||
            (col("a.l") === col("b.l") && col("a.doc_id") < col("b.doc_id"))))
      .where(expr("substring(b.text, 1, cast(a.l AS INT)) = a.text"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.l").as("len_a"), col("b.l").as("len_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** Paragraph unit for [[paraDedup]]: non-overlapping blocks of this many
    * words. The corpus has no line or sentence structure (flat word
    * streams), so the C4-style "three-sentence span" becomes a fixed-width
    * word block — the same role, deterministic on any text.
    */
  private[graft] val ParaWords = 8

  /** Blocks shorter than this many words (short tails) are not treated as
    * paragraphs: a 1-2 word tail is near-guaranteed to repeat by chance in
    * a small vocabulary and would flag chance collisions as duplication.
    */
  private[graft] val MinParaWords = 4

  /** Paragraph-level exact dedup (the C4 "same span repeated across
    * different pages" pass, reference `requirements-v2.md` corpus-hygiene
    * family): each document is cut into consecutive [[ParaWords]]-word
    * blocks; a block's text is portable-hashed; the first occurrence
    * corpus-wide — smallest (doc_id, pos) — KEEPS its paragraph and every
    * later occurrence is removed. Per document: paragraphs considered,
    * paragraphs removed, and the surviving text length.
    *
    * Output: doc_id, n_paras, n_removed, kept_chars (Σ len over kept
    * paragraphs), ordered by doc_id.
    *
    * Scale shape: one explode to ~n/[[ParaWords]] rows per doc, a
    * map-side-combined groupBy on the 8-byte hash for the winner relation
    * (min-struct, not a window — no per-key sort), and a shuffle join back
    * on the same key. Linear in corpus size, no all-pairs anywhere; the
    * hottest key's posting list is only ever *counted and min'd*, never
    * self-joined, so boilerplate paragraphs (the high-df tail) cost O(df)
    * not O(df²). Survives 100× unchanged.
    */
  def paraDedup(spark: SparkSession, dir: String): DataFrame = {
    val paras = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0L, (cast(size(w) AS BIGINT) + ${ParaWords - 1}) div $ParaWords - 1),
             |  i -> array_join(slice(w, cast(i * $ParaWords + 1 AS INT), $ParaWords), ' '))""".stripMargin)))
      .toDF("doc_id", "pos", "para")
      .where(size(split(col("para"), " ")) >= MinParaWords)
      .withColumn("h", Tables.portableHash(col("para")))
      .withColumn("plen", length(col("para")).cast("long"))
    val winners = paras.groupBy("h")
      .agg(min(struct(col("doc_id"), col("pos"))).as("w0"))
      .select(col("h"), col("w0.doc_id").as("w_doc"), col("w0.pos").as("w_pos"))
    paras.join(winners, Seq("h"))
      .withColumn("kept",
        col("doc_id") === col("w_doc") && col("pos") === col("w_pos"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("kept"), 0L).otherwise(1L)).as("n_removed"),
        sum(when(col("kept"), col("plen")).otherwise(0L)).as("kept_chars"))
      .orderBy("doc_id")
  }

  /** Sliding-window width (words) for [[dupSpans]] duplicate detection. */
  private[graft] val SpanGram = 8

  /** Repeated-substring span detection (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the suffix-array
    * ExactSubstr pass, re-expressed relationally): every SLIDING
    * [[SpanGram]]-word window is hashed; windows whose text occurs ≥ 2
    * times anywhere in the corpus (including within the same document)
    * mark their [pos, pos+7] span as duplicated; per document, overlapping
    * spans are merged into islands by a gap sweep and the covered-token
    * total is the amount an ExactSubstr cut pass would remove.
    *
    * Differs from [[paraDedup]] exactly the way ExactSubstr differs from
    * C4: windows SLIDE (any repeated ≥8-word run is caught at every
    * offset, not just on block boundaries), and the output is span
    * geometry (islands + covered tokens), not a keep/remove verdict.
    *
    * Output per document: n_words, n_dup_grams (duplicated window count),
    * n_islands (maximal merged spans), covered_tokens, dup_permille.
    *
    * Scale shape: the sliding windows are one posexplode (n rows per
    * n-word doc — same order as tokenization itself); duplicated-hash
    * detection is a map-side-combined count on the 8-byte hash (the
    * posting list is only COUNTED, never self-joined, so a boilerplate
    * span with df=10⁶ costs O(df)); the island sweep is a lag window
    * PARTITIONED BY doc_id — per-document work bounded by doc length.
    * Nothing is quadratic; a suffix array would be cheaper per byte but
    * this shape needs no global sort and parallelizes trivially at 100 TB.
    */
  def dupSpans(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_words"),
        col("w"))
    val grams = base.where(col("n_words") >= SpanGram)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
             |  sequence(0L, cast(size(w) AS BIGINT) - $SpanGram),
             |  i -> array_join(slice(w, cast(i + 1 AS INT), $SpanGram), ' '))""".stripMargin)))
      .toDF("doc_id", "pos", "gram")
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        Tables.portableHash(col("gram")).as("h"))
    val dupH = grams.groupBy("h").agg(count(lit(1)).as("occ"))
      .where(col("occ") >= 2).select("h")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = grams.join(dupH, "h")
      .withColumn("gap", col("pos") - lag(col("pos"), 1).over(wDoc))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_grams"),
        (lit(1L) + sum(when(col("gap") >= SpanGram, 1L).otherwise(0L)))
          .as("n_islands"),
        (lit(SpanGram.toLong) + sum(when(col("gap").isNull, 0L)
          .otherwise(least(col("gap"), lit(SpanGram.toLong)))))
          .as("covered_tokens"))
    base.select("doc_id", "n_words")
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("n_islands"), lit(0L)).as("n_islands"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("dup_permille",
        expr("covered_tokens * 1000 div n_words"))
      .orderBy("doc_id")
  }

  /** Dataset-card summary per source — the release-notes table a corpus
    * ships with: document and token counts, token share, exact-duplicate
    * membership rate (md5-content groups of size ≥ 2), rule-based quality
    * pass rate, and language coverage. Pure composition of pinned operator
    * semantics (exact-dup grouping ≡ `dedup_exact`, keep ≡
    * `q_quality_filter`); two corpus-keyed joins + one sources-sized
    * aggregate + a broadcast total.
    */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        md5(col("text")).as("cmd5"))
    val dupH = docs.groupBy("cmd5").agg(count(lit(1)).as("nc"))
      .where(col("nc") >= 2).select(col("cmd5"), lit(1L).as("is_dup"))
    val keep = TextAnalysis.qualityFilter(spark, dir)
      .select(col("doc_id"), col("keep"))
    val per = docs
      .join(dupH, Seq("cmd5"), "left")
      .join(keep, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_tokens"),
        sum(col("keep")).as("n_keep"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_member"),
        countDistinct(col("lang")).as("n_langs"))
    val total = per.agg(sum(col("n_tokens")).as("tot"))
    per.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000 div tot").as("token_share_permille"),
        expr("n_keep * 1000 div n_docs").as("quality_keep_permille"),
        expr("n_dup_member * 1000 div n_docs").as("dup_member_permille"),
        col("n_langs"))
      .orderBy("source")
  }

  /** Number of training shards [[packBins]] stripes into. */
  private[graft] val PackShards = 16

  /** LPT-striped packing of the corpus into [[PackShards]] token-balanced
    * training shards: documents are ranked by token count (desc, doc_id
    * tiebreak) and dealt round-robin — rank i → shard (i−1) mod K. This is
    * the classic longest-processing-time heuristic's striping form:
    * deterministic, one pass, and within a few permille of perfect balance
    * whenever doc sizes ≪ shard size (always true for a corpus).
    *
    * Output per shard: doc count, token load, and share_permille16 =
    * 16000·tokens div total (1000 ⇒ perfectly even).
    *
    * The global rank uses [[Ranking.withGlobalRowNumber]] — range-partition
    * + local row_number + broadcast offsets — NOT a single-task window, so
    * the stripe assignment distributes like any sort at 100 TB.
    */
  def packBins(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val (ranked, _) = Ranking.withGlobalRowNumber(
      d, "rn", col("n_tokens").desc, col("doc_id"))
    val bins = ranked
      .withColumn("shard", expr(s"(rn - 1) % $PackShards"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
    val total = bins.agg(sum(col("shard_tokens")).as("total"))
    bins.crossJoin(broadcast(total))
      .withColumn("share_permille16",
        expr(s"$PackShards * 1000 * shard_tokens div total"))
      .select("shard", "n_docs", "shard_tokens", "share_permille16")
      .orderBy("shard")
  }
}
