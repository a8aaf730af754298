package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{ChainLink, Dedup, Relational, Similarity}
import graft.sources.Tables

/** Physical-plan audits: the properties that decide 100 TB behavior must be
  * visible in the plan — filters pushed to the parquet scan, columns pruned,
  * the right join strategies, map-side partial aggregation. These guard
  * against regressions that correctness tests can't see.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: scan prunes to the 4 needed lineitem columns; partial agg present") {
    val p = plan(Relational.q1Pricing(spark, sf001))
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("l_returnflag") && scan.contains("l_quantity"))
    assert(!scan.contains("l_shipdate") && !scan.contains("l_orderkey"),
      s"unpruned scan: $scan")
    // partial + final hash aggregation (map-side combine)
    assert(p.contains("HashAggregate"))
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2)
  }

  test("q3: segment filter is pushed into the customer parquet scan") {
    val p = plan(Relational.q3TopOrders(spark, sf001))
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"missing pushdown:\n$pushed")
  }

  test("q5: nation dimension joins via broadcast") {
    val p = plan(Relational.q5NationRevenue(spark, sf001))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "nation should broadcast")
  }

  test("debounce: the lag window is keyed, never a global single partition") {
    val p = plan(Relational.qEventDebounce(spark, sf001))
    assert(!p.contains("CartesianProduct"), p)
    val globals = p.linesIterator.filter(l =>
      l.trim.startsWith("Window") && !l.contains("user_id")).toSeq
    assert(globals.isEmpty,
      s"debounce must partition by (user_id, event_type):\n${globals.mkString("\n")}")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "per-type rollup must partial-aggregate")
  }

  test("q7: both nation lookups broadcast; pair filter above the joins") {
    val p = plan(Relational.q7Volume(spark, sf001))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"supplier/customer nation lookups must broadcast:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "year rollup must partial-aggregate")
  }

  test("chain-link join is an equi-join on (ip, bucket), never a nested loop") {
    val p = plan(ChainLink.links(Tables.msgs(spark, sf001)))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join degenerated:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("semi/anti joins stay semi/anti in the physical plan") {
    assert(plan(Relational.qSemiHighQty(spark, sf001)).contains("LeftSemi"))
    assert(plan(Relational.qAntiNoOrders(spark, sf001)).contains("LeftAnti"))
  }

  test("minhash/ngram dedup joins are hash joins on signature keys") {
    val p = plan(Dedup.dedupNgram(spark, sf001))
    assert(!p.contains("CartesianProduct"), "dedup must never be all-pairs")
  }

  test("funnel: equi-joins on user_id only, no cartesian, no unbounded collect") {
    val p = plan(operators.Analytics.funnelStages(spark, sf001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"funnel degenerated:\n$p")
    // the greedy rewrite must not reintroduce the per-user journey gather
    assert(!p.contains("collect_list") && !p.contains("collect_set"),
      "funnel state must stay O(1) per user")
  }

  test("incremental dedup: verdict sets broadcast onto the shard roster") {
    val p = plan(Dedup.incrementalDedup(spark, sf001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"incremental dedup degenerated:\n$p")
    // the (tiny) corpus_dup/shard_dup sets must broadcast into the
    // roster's left joins, not shuffle the roster
    assert(p.contains("BroadcastHashJoin"), s"verdict join should broadcast:\n$p")
  }

  // The memoized relations (annTopkFor, ivfHashminPairsFor, …) are parquet
  // scans by design — plan audits inspect the un-memoized BUILDERS, which
  // carry the operator structure that runs at build time.
  test("ann_topk build broadcasts the query sample, scans vectors once") {
    val p = plan(Similarity.annTopkBuild(spark, sf001))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("graft_dot"), "codegen dot product must be in the plan")
  }

  test("ivf dedup_embedding build plan: no cartesian, candidates join on centroid keys") {
    val v = Dedup.normedFor(spark, sf001)
    val p = plan(Dedup.ivfPairs(v, Similarity.centroidsFor(v), nprobe = 8))
    assert(!p.contains("CartesianProduct"),
      s"embedding dedup degenerated to all-pairs:\n$p")
    // the only nested-loop allowed is the centroid broadcast (a crossJoin
    // against the tiny broadcast centroid relation during assignment)
    assert(p.contains("graft_dot"), "codegen dot product must be in the plan")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "candidate join must be an equi-join")
  }

  test("routed production pair build: both quantizer levels broadcast, no cartesian") {
    val v = Dedup.normedFor(spark, sf001)
    val p = plan(Dedup.subBucketPairs(v, Similarity.ivf2ProbeIds(spark, sf001,
      Dedup.PairCoarseNprobe, Dedup.PairFinePerCell)))
    assert(!p.contains("CartesianProduct"),
      s"routed pair build degenerated to all-pairs:\n$p")
    // coarse router and per-cell member map ride broadcasts; the only
    // corpus-sized joins are the embedding attach and the (cent_id, sub)
    // candidate self-join — both equi-joins
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "quantizer levels must broadcast")
    assert(p.contains("graft_dot"), "codegen dot product must be in the plan")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "candidate join must be an equi-join")
  }

  test("banded sql cosine-by-label plan: no cartesian, equi-join on band keys") {
    val p = plan(operators.SqlApi.sqlCosineByLabel(spark, sf001))
    assert(!p.contains("CartesianProduct"),
      s"label cosine degenerated to all-pairs:\n$p")
    // the only nested-loop permitted is the 1-row corpus-count relation
    // (`CROSS JOIN bb`) riding a broadcast — the same crossJoin(broadcast
    // (1-row)) → BroadcastNestedLoopJoin shape the blanket invariant
    // below allows; the corpus-sized joins stay equi-joins on band keys
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"unexpected nested-loop joins ($bnlj):\n$p")
    assert(p.contains("graft_dot"))
  }

  test("pq-ivf build: bucket-restricted ADC, broadcast dtab, no cartesian") {
    val p = plan(Similarity.pqIvfTopBuild(spark, sf001))
    assert(!p.contains("CartesianProduct"), s"pq-ivf degenerated to all-pairs:\n$p")
    // the candidate restriction and the ADC-table lookup are equi-joins
    // (cent_id; q_id/m/code) — the ADC table rides a broadcast
    assert(p.contains("BroadcastHashJoin"), s"dtab should broadcast-join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "candidate join must be an equi-join")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "ADC sums need map-side combine")
  }

  test("trained pq-ivf build: bucket-restricted ADC, broadcast dtab, no cartesian") {
    val p = plan(Similarity.pqIvfTrainedTopBuild(spark, sf001))
    assert(!p.contains("CartesianProduct"), s"trained pq-ivf degenerated to all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"trained dtab should broadcast-join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), "candidate join must be an equi-join")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "ADC sums need map-side combine")
  }

  test("pq encode build: codegen'd l2sq argmin, map-only against broadcast codebook") {
    val p = plan(Similarity.pqCodesBuild(spark, sf001))
    assert(p.contains("graft_l2sq"), "codegen L2² must be in the encode plan")
    assert(!p.contains("CartesianProduct"), p)
    // the only join is the 1-row codebook-array broadcast
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"encode must not shuffle vectors:\n$p")
  }

  test("vector quantization broadcasts the per-dim scales") {
    val p = plan(Similarity.vectorQuantize(spark, sf001))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"scales should broadcast:\n$p")
  }

  test("events scan for tumbling agg prunes props (the wide column)") {
    val p = plan(Relational.qEventsTumbling(spark, sf001))
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(!scan.contains("props"), s"props not pruned: $scan")
  }

  test("as-of join compiles to a join-free single-shuffle window plan") {
    val p = plan(operators.Analytics.asofLastView(spark, sf001))
    assert(!p.contains("Join"), s"as-of must not be a join:\n$p")
    assert(p.contains("Window"))
    // one shuffle for the user_id window + the final presentation sort
    assert(p.linesIterator.count(_.contains("Exchange")) <= 2, p)
  }

  test("promo share broadcasts the part dimension") {
    val p = plan(operators.Analytics.promoShare(spark, sf001))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "part should broadcast")
  }

  test("lsh cosine joins on band keys, codegen dot in the plan, no cartesian") {
    val p = plan(operators.Analytics.lshCosine(spark, sf001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("graft_dot"))
  }

  test("overlap count joins on (ip, bucket) equi-keys, never nested loop") {
    val p = plan(operators.Analytics.overlapCount(spark, sf001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("percentiles broadcast the tiny group-count side") {
    val p = plan(operators.Analytics.quantityPercentiles(spark, sf001))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "group counts should broadcast")
  }

  test("pivot is one hash-aggregation pair, no per-column scans") {
    val p = plan(operators.Analytics.pivotEventCounts(spark, sf001))
    assert(!p.contains("Join"))
    assert(p.linesIterator.count(_.contains("FileScan")) == 1, "single scan")
  }

  test("correlated subquery is decorrelated to one aggregate + join") {
    val p = plan(operators.SqlApi.smallQtyParts(spark, sf001))
    // decorrelation: per-part averages come from ONE aggregation joined
    // back, never a per-row subquery plan
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
    assert(p.contains("Join"), p)
    assert(p.linesIterator.count(_.contains("FileScan")) == 2,
      s"expected exactly 2 lineitem scans (outer + decorrelated agg):\n$p")
  }

  test("decontamination joins the benchmark fingerprint set via broadcast") {
    val p = plan(operators.Curation.decontaminate(spark, sf001))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"benchmark hashes should broadcast:\n$p")
  }

  test("partitioned layout: partition filter prunes directories at the scan") {
    val base = java.nio.file.Paths.get("/tmp/graft-test-partitioned")
    if (java.nio.file.Files.exists(base))
      java.nio.file.Files.walk(base).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "event_type")
      .write.partitionBy("event_type").parquet(base.toString)
    val df = spark.read.parquet(base.toString)
      .where(org.apache.spark.sql.functions.col("event_type") === "click")
    val p = plan(df)
    val scan = p.linesIterator.find(_.contains("FileScan")).get
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter not applied: $scan")
    // the filter prunes to the one matching directory — no post-scan filter
    // on event_type remains
    assert(!p.linesIterator.exists(l => l.trim.startsWith("+- Filter") &&
      l.contains("event_type")), s"residual filter present:\n$p")
  }

  test("bucketed join accepts same-name keys on both sides") {
    // regression: col(key) === col(key) was ambiguous; per-side refs resolve
    Seq("b_docs_a", "b_docs_b").foreach(dropBucketedTable)
    val d = Tables.load(spark, sf0001, "documents").select("doc_id", "source")
    sources.Bucketing.writeBucketed(d, "b_docs_a", "doc_id", 4)
    sources.Bucketing.writeBucketed(d, "b_docs_b", "doc_id", 4)
    val n = sources.Bucketing.bucketedJoin(spark, "b_docs_a", "b_docs_b",
      "doc_id", "doc_id").count()
    assert(n == d.count())
    Seq("b_docs_a", "b_docs_b").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  private def dropBucketedTable(t: String): Unit = {
    // drop catalog entries AND locations surviving a previous JVM (the
    // in-memory metastore forgets tables; the warehouse dir does not)
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val dir = java.nio.file.Paths.get("/tmp/graft-test-warehouse", t)
    if (java.nio.file.Files.exists(dir))
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
  }

  test("bucketed join on a shared bucket spec has no Exchange") {
    import org.apache.spark.sql.functions._
    Seq("b_lineitem", "b_orders").foreach(dropBucketedTable)
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    sources.Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    sources.Bucketing.writeBucketed(ord, "b_orders", "o_orderkey", 8)
    // at sf0.001 both sides fit the broadcast threshold, which masks the
    // bucketing (the planner prefers broadcast and disables bucketed
    // reads); disable auto-broadcast to audit the at-scale plan shape
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = sources.Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey", "o_orderkey")
      val p = plan(joined)
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SortMergeJoin"), p)
      // and it computes the same thing as the plain (shuffling) join
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("q_salted_join: the salt column is part of the physical join") {
    val p = plan(operators.Skew.saltedJoinPriority(spark, sf0001))
    assert(p.contains("__graft_salt"), s"salt column absent from plan:\n$p")
    // the salt must feed the join itself, not just a projection: the
    // small side explodes a salt sequence before joining
    assert(p.contains("explode") || p.contains("Expand") || p.contains("Generate"),
      s"salt replication of the dim side missing:\n$p")
  }

  test("blanket invariant: no query plan contains a CartesianProduct") {
    // crossJoin(broadcast(1-row)) compiles to BroadcastNestedLoopJoin and
    // is allowed; an actual CartesianProduct (both sides partitioned) is
    // the scale-killer class and must never appear in ANY driver query.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val p = try plan(fn(spark, sf0001)) catch { case e: Throwable =>
          fail(s"$name failed to plan: ${e.getMessage}") }
        if (p.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }

  test("bloom semi-join: membership filter runs before the semi-join") {
    val p = plan(operators.RuntimeFilter.bloomSemiRevenue(spark, sf001))
    // the element_at bit-test must appear as a Filter below the semi join —
    // i.e. probe rows are dropped pre-shuffle
    val lines = p.linesIterator.toSeq
    val filterIdx = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("element_at"))
    val joinIdx = lines.indexWhere(l => l.contains("LeftSemi"))
    assert(filterIdx >= 0, s"no bloom membership filter in plan:\n$p")
    assert(joinIdx >= 0 && joinIdx < filterIdx,
      "membership filter must be a child of (below) the semi join")
  }

  test("activity streaks: one hash exchange, no window operator") {
    val p = plan(operators.Analytics.activityStreaks(spark, sf001))
    val hashEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected a single hash exchange:\n$p")
    assert(!p.contains("Window"), "streaks must not need a window")
  }

  test("doc fluency: bigram joins are hash joins; only the 1-row total broadcasts nested-loop") {
    val p = plan(operators.TextAnalysis.docFluency(spark, sf001))
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop join permitted is against the single-row total
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 1, s"unexpected nested-loop joins:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "corpus counts need map-side combine")
  }

  test("DAU/WAU is aggregation-only: no windows, no cartesian") {
    val p = plan(operators.Analytics.dauWau(spark, sf001))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
  }

  test("hot keys: pruned single-column scans, partial agg") {
    val p = plan(operators.Skew.hotKeys(spark, sf001))
    // two scans (counts + total) is deliberate: a global window over the
    // per-key counts would funnel the key relation through one task
    p.linesIterator.filter(_.contains("FileScan")).foreach { scan =>
      assert(scan.contains("ReadSchema: struct<l_orderkey:bigint>"),
        s"unpruned scan: $scan")
    }
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "key counts need map-side combine")
  }

  test("pageRank: no cartesian; contributions partially aggregated") {
    val p = plan(operators.Graph.pageRank(spark, sf001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "contribution sums need map-side combine")
  }

  test("skyline/token budget: windows are bucket-partitioned, not global") {
    Seq(plan(Relational.qSkylineParts(spark, sf001)),
      plan(operators.Curation.tokenBudget(spark, sf001))).foreach { p =>
      val globals = p.linesIterator.filter(l =>
        l.trim.startsWith("Window") && !l.contains("windowspecdefinition(b")
          && !l.contains("partitionby")).toSeq
      // every Window over the full relation must carry a partition spec;
      // the only permitted global window is over the per-bucket aggregate,
      // whose input is the tiny `b`-keyed relation
      globals.foreach { w =>
        assert(w.contains("windowspecdefinition(b,") || w.contains("price_c,"),
          s"unexpected global window: $w\n$p")
      }
    }
  }

  test("sq-ivf build: bucket-restricted int-dot, broadcast query codes, no cartesian") {
    val p = plan(Similarity.sqIvfTopBuild(spark, sf001))
    assert(!p.contains("CartesianProduct"), s"sq-ivf degenerated to all-pairs:\n$p")
    // the query-code attach (q_id) and candidate restriction (cent_id) are
    // equi-joins; the Q-row query codes ride a broadcast
    assert(p.contains("BroadcastHashJoin"), s"query codes should broadcast-join:\n$p")
    assert(p.contains("graft_ldot"), "codegen'd int64 dot must score candidates")
  }

  test("sq encode is map-only: corpus never shuffles through the scale join") {
    val p = plan(Similarity.sqCodesBuild(spark, sf001))
    assert(!p.contains("CartesianProduct"), p)
    // the only join is the 1-row per-dim scale array broadcast
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"encode must not shuffle vectors:\n$p")
  }

  test("embed stats: partial aggregation present, no joins at all") {
    val p = plan(Similarity.embedStats(spark, sf001))
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "per-dim moments need map-side combine")
    assert(!p.contains("Join"), s"a pure aggregation must not join:\n$p")
  }

  test("mixture budget: budgets broadcast, running total partitioned by source") {
    val p = plan(operators.Curation.mixtureBudget(spark, sf001))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the 20-row budget table should broadcast:\n$p")
    val globals = p.linesIterator.filter(l =>
      l.trim.startsWith("Window") && !l.contains("source")).toSeq
    assert(globals.isEmpty,
      s"the running total must be source-partitioned:\n${globals.mkString("\n")}")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("train order: rank rides range partitioning, window is pid-partitioned") {
    val p = plan(operators.Curation.trainOrder(spark, sf0001))
    assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"),
      s"global position must come from a range-partitioned sort:\n$p")
    val globals = p.linesIterator.filter(l =>
      l.trim.startsWith("Window") && !l.contains("__graft_pid")).toSeq
    assert(globals.isEmpty,
      s"row_number must be partitioned by __graft_pid:\n${globals.mkString("\n")}")
  }

  test("rerank: candidate joins are hash joins, queries broadcast, no cartesian") {
    val p = plan(Similarity.rerankTopBuild(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"the Q-row query side must broadcast:\n$p")
    // the corpus side arrives via an equi-join on n_id, never re-scored whole
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2)
  }

  test("dsir: weights broadcast on the bucket key; partial agg present") {
    val p = plan(operators.Curation.dsirScores(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"the 256-row weight table must broadcast:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "per-doc sums must partial-aggregate map-side")
  }

  test("cms: sketch joins broadcast, counters partial-aggregate, no cartesian") {
    val p = plan(operators.TextAnalysis.cmsHitters(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"the 1024-row sketch must broadcast:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2)
  }

  test("semdedup: centroid cosines via broadcast equi-join, no cartesian") {
    val p = plan(Dedup.semDedup(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"the K-row centroid table must broadcast:\n$p")
  }

  test("knn graph: candidates meet via a cent_id hash join, never nested loop") {
    val p = plan(operators.Neighbors.knnGraph(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), s"kNN must stay IVF-bucketed:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"))
  }

  test("bm25: query terms + totals broadcast; postings partial-aggregate") {
    val p = plan(operators.Analytics.bm25Search(spark, sf0001))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"the 5-row query-term table must broadcast:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "tf/df/dl stats must partial-aggregate map-side")
    // final ranking is a TakeOrdered, not a global sort of the corpus
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must be TakeOrdered:\n$p")
  }

  test("chunk embed: sparse features meet centroids via broadcast on b") {
    val p = plan(operators.TextAnalysis.chunkEmbedIndex(spark, sf0001))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"the 16-centroid feature table must broadcast:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "feature sums must partial-aggregate map-side")
  }

  test("pca: moment matrix partial-aggregates; no cartesian") {
    val xq = operators.Similarity.pcaXqFor(spark, sf0001)
    val cov = xq.as("a").join(xq.as("b"), "vec_id")
      .groupBy(org.apache.spark.sql.functions.col("a.d"),
        org.apache.spark.sql.functions.col("b.d"))
      .count()
    val p = plan(cov)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      "the 4096-key moment aggregation must map-side combine")
  }

  test("dup spans: hash-count dedup detection, doc-partitioned sweep only") {
    val p = plan(operators.Corpus.dupSpans(spark, sf0001))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // the occurrence count must partial-aggregate (posting lists counted,
    // never self-joined)
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2)
    // every window sits behind a doc_id partitioning, never global
    val globals = p.linesIterator.filter(l =>
      l.trim.startsWith("Window") && !l.contains("doc_id")).toSeq
    assert(globals.isEmpty,
      s"island sweep must partition by doc_id:\n${globals.mkString("\n")}")
  }
}
