package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Similarity}

/** Round-8 additions: int8 scalar-quantization serving (codes, search,
  * recall), matryoshka truncated-dim recall, and the deterministic
  * training-order shuffle/sharding. The DuckDB hash-equivalence lives in
  * the driver gate; these pin the operator-level invariants.
  */
class SeventhWaveSpec extends SparkSpec {
  import spark.implicits._

  test("SQ8 codes stay in int8 range and cover every vector") {
    val codes = Similarity.sqCodesFor(spark, sf0001)
    val n = codes.count()
    assert(n === graft.sources.Tables.load(spark, sf0001, "embeddings").count())
    val bad = codes
      .where(exists(col("qe"), q => abs(q) > 127) || size(col("qe")) =!= 64)
      .count()
    assert(bad === 0L, "every code must be a 64-long int8-range vector")
  }

  test("SQ8 search returns exactly top-5 per sampled query, int64 scores") {
    val top = Similarity.sqSearch(spark, sf0001)
    val perQ = top.groupBy("q_id").count().where(col("count") =!= 5).count()
    assert(perQ === 0L)
    assert(top.schema("dot").dataType ===
      org.apache.spark.sql.types.LongType)
    // sampled queries: vec_id % 20 == 0
    assert(top.where(col("q_id") % 20 =!= 0).count() === 0L)
  }

  test("SQ8 recall beats the PQ seed-codebook recall on this corpus") {
    // SQ8 keeps the full candidate set and loses only quantization
    // precision (4×); PQ compresses 64× — on near-random vectors SQ8
    // must rank strictly better. Pins the two audits against each other
    // so a scoring bug in either one shows up as an inversion.
    val sq = Similarity.sqRecall(spark, sf0001)
      .select("recall_permille").as[Long].head()
    val pq = Similarity.pqRecall(spark, sf0001)
      .select(col("recall_permille")).as[Long].head()
    assert(sq > pq, s"sq=$sq should exceed pq=$pq")
    assert(sq >= 0L && sq <= 1000L)
  }

  test("matryoshka recall is a valid permille and below SQ8") {
    val mrl = Similarity.mrlRecall(spark, sf0001)
      .select("recall_permille").as[Long].head()
    val sq = Similarity.sqRecall(spark, sf0001)
      .select("recall_permille").as[Long].head()
    assert(mrl >= 0L && mrl <= 1000L)
    // 16/64 dims of an untrained random embedding carry ~25% of the
    // signal; 4× precision loss on ALL dims costs far less than dropping
    // 75% of them.
    assert(mrl < sq, s"mrl=$mrl should trail sq=$sq on random embeddings")
  }

  test("train order is a permutation with balanced contiguous shards") {
    val t = Curation.trainOrder(spark, sf0001).cache()
    val n = t.count()
    assert(t.select("doc_id").distinct().count() === n)
    // positions are exactly 1..n
    val r = t.agg(min("pos"), max("pos"), countDistinct("pos")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, n, n)))
    // shards are contiguous blocks of the permuted order, sizes within ±1
    val sizes = t.groupBy("shard").count().select("count").as[Long].collect()
    assert(sizes.length === 16)
    assert(sizes.max - sizes.min <= 1)
    val straddle = t.as("a").join(t.as("b"),
        $"a.pos" === $"b.pos" - 1 && $"a.shard" > $"b.shard").count()
    assert(straddle === 0L, "shard id must be monotone in pos")
    t.unpersist()
  }

  test("mixture budget: greedy fill respects every source's token budget") {
    val m = Curation.mixtureBudget(spark, sf0001).cache()
    assert(m.count() === 20) // every source reported, kept or not
    assert(m.where(col("kept_tokens") > col("budget_tokens")).count() === 0L,
      "no source may exceed its budget")
    assert(m.where(col("n_kept") === 0).count() === 0L,
      "a ~50% global budget must keep docs from every source")
    // √-temperature: the weight is ⌊√tokens⌋, so weight² ≤ tokens
    assert(m.where(col("weight") * col("weight") > col("src_tokens"))
      .count() === 0L)
    m.unpersist()
  }

  test("embed stats: 64 dims, full coverage, consistent moments") {
    val s = Similarity.embedStats(spark, sf0001).cache()
    assert(s.count() === 64)
    val nVecs = graft.sources.Tables.load(spark, sf0001, "embeddings").count()
    assert(s.where(col("n") =!= nVecs).count() === 0L,
      "every dimension must see every vector")
    // Cauchy-Schwarz-ish sanity: sumsq >= sum^2 / n  (variance >= 0)
    assert(s.where(col("sumsq_micro2") * col("n") <
      col("sum_micro") * col("sum_micro")).count() === 0L)
    assert(s.where(col("maxabs_micro") <= 0).count() === 0L,
      "no dimension of these embeddings is identically zero")
    s.unpersist()
  }

  test("sequence packing: contiguous stream, valid spans, exact chop") {
    val p = Curation.packSequences(spark, sf0001).orderBy("doc_id").cache()
    val rows = p.select("doc_id", "n_tokens", "start_off", "seq_first",
      "seq_last", "n_seqs").collect()
    var expectedOff = 0L
    rows.foreach { r =>
      assert(r.getLong(2) === expectedOff,
        s"doc ${r.getLong(0)} not contiguous in the token stream")
      expectedOff += r.getLong(1)
      val (sf0, sl, ns) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sf0 === r.getLong(2) / 2048)
      assert(sl === (r.getLong(2) + r.getLong(1) - 1) / 2048)
      assert(ns === sl - sf0 + 1 && ns >= 1)
    }
    // every sequence before the last is chopped exactly full: total
    // tokens span seq ids 0..(total-1)/2048 with no gaps
    val total = expectedOff
    val maxSeq = rows.map(_.getLong(4)).max
    assert(maxSeq === (total - 1) / 2048)
    p.unpersist()
  }

  test("greedy packing: bins within capacity, ids contiguous per shard") {
    val toks = graft.sources.Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long")
        .as("n_tokens"))
    val p = Curation.packGreedy(spark, sf0001).join(toks, "doc_id").cache()
    // a bin exceeds 2048 only when it holds a single oversize doc
    val over = p.groupBy("shard", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"))
      .where(col("fill") > 2048 && col("n_docs") > 1).count()
    assert(over === 0L, "multi-doc bins must fit the 2048-token capacity")
    // bin ids are 0..max contiguous within every shard
    val gaps = p.groupBy("shard")
      .agg(countDistinct("bin_id").as("n_bins"), max("bin_id").as("max_bin"))
      .where(col("n_bins") =!= col("max_bin") + 1).count()
    assert(gaps === 0L, "bin ids must be dense per shard")
    // deterministic under re-execution
    val again = Curation.packGreedy(spark, sf0001)
    assert(p.select("doc_id", "shard", "bin_id")
      .except(again).count() === 0L)
    p.unpersist()
  }

  test("train order is seeded-deterministic: same input, same permutation") {
    val a = Curation.trainOrder(spark, sf0001).select("doc_id", "pos", "shard")
    val b = Curation.trainOrder(spark, sf0001).select("doc_id", "pos", "shard")
    assert(a.except(b).count() === 0L)
    assert(b.except(a).count() === 0L)
  }
}
