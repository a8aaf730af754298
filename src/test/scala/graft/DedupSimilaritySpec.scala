package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.sources.Tables

/** Cross-checks between the scalable (banded/LSH) implementations and
  * ground-truth semantics on small SF.
  */
class DedupSimilaritySpec extends SparkSpec {

  test("minhash-LSH pairs are true near-dups (jaccard >= 0.8 ground truth)") {
    // ground truth: all pairs with jaccard >= 0.8 via direct shingle sets
    val docs = Tables.load(spark, sf001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").sliding(3).map(_.mkString(" ")).toSet)
    val truth = (for {
      (ia, sa) <- docs; (ib, sb) <- docs if ia < ib
      inter = (sa & sb).size; union = (sa | sb).size
      if union > 0 && inter * 5 >= union * 4
    } yield (ia, ib)).toSet

    val got = Dedup.dedupMinhash(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH may miss borderline pairs (probabilistic recall) but must never
    // emit a false positive, and on this data (planted ~0.99 dups) it
    // should find the bulk of the truth set.
    assert(got.subsetOf(truth), s"false positives: ${got -- truth}")
    assert(got.nonEmpty)
    assert(got.size * 10 >= truth.size * 8, s"recall too low: ${got.size}/${truth.size}")
  }

  test("incremental dedup verdicts agree with the ngram pair relation") {
    // the verdict column is a classification OVER dedup_ngram's pair set:
    // corpus_dup ⇔ the doc is in a cross-split Jaccard pair, shard_dup ⇔
    // only in within-shard pairs as the LATER doc, unique ⇔ in neither.
    val pairs = Dedup.dedupNgram(spark, sf001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val inc = (id: Long) => id % 5 == 0
    val expCorp = pairs.collect {
      case (a, b) if inc(a) != inc(b) => if (inc(a)) a else b
    }.toSet
    val expShard = pairs.collect {
      case (a, b) if inc(a) && inc(b) => b
    }.toSet -- expCorp
    val verdicts = Dedup.incrementalDedup(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val roster = Tables.load(spark, sf001, "documents")
      .select("doc_id").collect().map(_.getLong(0)).filter(inc).toSet
    assert(verdicts.keySet == roster, "one verdict per incoming doc")
    assert(verdicts.filter(_._2 == "corpus_dup").keySet == expCorp)
    assert(verdicts.filter(_._2 == "shard_dup").keySet == expShard)
    assert(expCorp.nonEmpty, "contract must bite at sf0.01")
  }

  test("incremental verdict core: shard_dup and precedence on a planted fixture") {
    // sf0.01 has no within-shard Jaccard pairs, so the shard_dup branch
    // needs a planted fixture: incoming = doc_id % 5 == 0.
    //   1 (corpus) = {a,b,c}
    //   5  = {a,b,c} → corpus_dup
    //   10 = {x,y,z} → unique (no match anywhere)
    //   15 = {x,y,z} → shard_dup (earlier shard doc 10)
    //   20 = {q}     → unique
    //   25 = {a,b,c} → corpus_dup (matches BOTH corpus 1 and earlier shard
    //                  5/15 — corpus_dup must win the precedence)
    val sp = spark
    import sp.implicits._
    val shh = Seq(1L -> "a", 1L -> "b", 1L -> "c",
      5L -> "a", 5L -> "b", 5L -> "c",
      10L -> "x", 10L -> "y", 10L -> "z",
      15L -> "x", 15L -> "y", 15L -> "z",
      20L -> "q",
      25L -> "a", 25L -> "b", 25L -> "c").toDF("doc_id", "h")
    val sizes = shh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val roster = Seq(1L, 5L, 10L, 15L, 20L, 25L).toDF("doc_id")
    val got = Dedup.incrementalVerdicts(shh, sizes, roster,
        col("doc_id") % 5 === 0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(5L -> "corpus_dup", 10L -> "unique",
      15L -> "shard_dup", 20L -> "unique", 25L -> "corpus_dup"))
  }

  test("simhash pairs all have hamming <= 3 and near-dup docs collide") {
    val rows = Dedup.dedupSimhash(spark, sf001).collect()
    rows.foreach(r => assert(r.getLong(2) <= 3))
  }

  test("ann_ivf is a plausible approximation of brute-force top-k") {
    val brute = Similarity.annTopk(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.1, s"IVF recall unreasonably low: $recall")
  }

  test("ivf dedup_embedding: subset of exact all-pairs truth, high recall") {
    val exact = Dedup.dedupEmbeddingExact(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Dedup.dedupEmbedding(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.subsetOf(exact), s"false positives: ${ivf -- exact}")
    // measured: the routed 3×8 production build recovers 54/59
    // cos >= 0.40 pairs of this 500-vector corpus (near-random vectors —
    // the adversarial case; see Dedup.dedupEmbedding Scaladoc). The
    // single-level audit baseline reads 57/59 here and LOSES to the
    // routed build at every larger scale (q_ivf2_pair_recall).
    // The exact permille is the driver-checked q_ann_recall contract;
    // here we pin "high recall, zero false positives".
    assert(ivf.size * 10 >= exact.size * 9, s"recall too low: ${ivf.size}/${exact.size}")
  }

  test("banded sql cosine-by-label: per-label best is a true pair, bounded by exact") {
    import graft.operators.SqlApi
    val exact = SqlApi.sqlCosineByLabelExact(spark, sf001)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    val banded = SqlApi.sqlCosineByLabel(spark, sf001).collect()
    assert(banded.nonEmpty)
    banded.foreach { r =>
      val (label, cos) = (r.getInt(0), r.getDouble(3))
      // the banded top-1 is an exact-verified cosine of a real same-label
      // pair, so it can never exceed the all-pairs top-1
      assert(cos <= exact(label) + 1e-12, s"label $label: $cos > ${exact(label)}")
    }
  }

  test("posting-list intersection counts equal the row-form self-join") {
    // the map-side pair generation off (h, ds) posting lists must produce
    // exactly the pairs the former row-form self-join did: re-derive the
    // a<b intersection counts by self-joining the exploded view and
    // compare to interFor (the memoized posting-list pass)
    val shh = Dedup.shinglesHashedFor(spark, sf001)
    val truth = shh.as("a").join(shh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = Dedup.interFor(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == truth)
    assert(got.nonEmpty, "intersection relation must bite at sf0.01")
  }

  test("shingle posting lists are sorted, df-capped, and duplicate-free") {
    val posts = Dedup.shinglePostingsFor(spark, sf001).collect()
    assert(posts.nonEmpty)
    posts.foreach { r =>
      val ds = r.getSeq[Long](1)
      assert(ds.size <= Dedup.ShingleDfCap, s"df cap violated: ${ds.size}")
      assert(ds == ds.sorted, "posting list not sorted")
      assert(ds.distinct.size == ds.size, "posting list holds a doc twice")
    }
  }

  test("media decode stub matches the declarative formula") {
    import spark.implicits._
    val sqlSide = Multimodal.mediaTable(spark, sf001)
      .select(col("doc_id"), octet_length(col("payload").cast("string")).as("bl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val decoded = Multimodal.mediaMeta(spark, sf001).collect()
    decoded.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) == sqlSide(id).toLong, s"byte_len mismatch for $id")
      assert(r.getLong(3) == sqlSide(id) / 100 + 1)
      val hashes = r.getSeq[Long](6)
      assert(hashes.length == math.min(sqlSide(id) / 100, 3) + 1)
    }
  }
}
