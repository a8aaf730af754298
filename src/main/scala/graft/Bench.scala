package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional comma-separated query-name filter for targeted timing runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Median-of-n mode: time each query n times and report the median plus
    // the max-min spread, so a single contended run can't distort the
    // round-over-round comparison. Defaults to 3 — sandbox load has
    // historically swung single-shot numbers by 2-7× on untouched queries.
    // Builds stay single-shot (they memoize; a second run would time the
    // cache, not the work).
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT").map(_.toInt)
      .filter(_ >= 1).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Same AQE start-wide-coalesce-back lever as Engine.session — the
      // sf10 probe spill relief without the range-exchange tax (see
      // Engine.session); small shuffles coalesce back for free.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Row-group-granular splits for small CPU-dense parquet (Engine.session
      // has the full rationale) — without it the sf1.0 documents/embeddings
      // scans run 1-2 tasks wide and every text/embedding build serializes.
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_EXPLAIN_DIR also routes BUILD plans: Materialized dumps
    // each memo builder's un-memoized plan there at build time (a
    // post-hoc explain of a memo is just a parquet scan), so the 42
    // _build_* cost centers carry plan evidence alongside the query
    // plans. Must be set BEFORE the first build/warm query runs.
    sys.env.get("SPARK_GRAFT_EXPLAIN_DIR").foreach(d =>
      spark.conf.set("spark.graft.materialized.explainDir", d))
    // Fingerprint the RAW testdata schemas (pre-normalization) so every
    // published bench self-evidences which data contract it ran against —
    // round 7's local bench was silently recorded against stale parquet
    // (events.ts regenerated ns→us) and masked a 39-query break. A
    // BENCH_LOCAL_* whose schema_fp differs from the driver's BENCH_r* was
    // measured on different data and must not be compared.
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // NonFatal only: a fatal JVM error (OOM, linkage) must fail the run
    // loudly, not be absorbed into the fingerprint as "missing".
    val fpSrc = tables.map { t =>
      val fields =
        try spark.read.parquet(s"$sfDir/$t.parquet").schema
          .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
        catch { case scala.util.control.NonFatal(_) => "missing" }
      s"$t{$fields}"
    }.mkString(";")
    val schemaFp = java.security.MessageDigest.getInstance("MD5")
      .digest(fpSrc.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val tsType =
      try spark.read.parquet(s"$sfDir/events.parquet")
        .schema("ts").dataType.simpleString
      catch { case scala.util.control.NonFatal(_) => "missing" }
    // warm JIT/codegen/scan paths untimed so timings reflect steady state
    Seq("q1_pricing", "dedup_exact").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // Failures are NOT swallowed into near-zero timings: a throwing
    // query/build records its error (surfaced on stderr immediately and in
    // the JSON's "errors" map) and is EXCLUDED from the medians map and the
    // headline total, so a regression can never masquerade as a fast
    // result. The bench still completes — one broken query shouldn't cost
    // the round the other 139 numbers.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def time(name: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      try body catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"
        System.err.println(s"[bench] $name FAILED: $msg")
        errors.getOrElseUpdate(name, msg)
      }
      (System.nanoTime() - t0) / 1e9
    }
    // Session-memoized shared intermediates, timed as their own named lines
    // so per-query numbers don't shift with run order (the cold build used
    // to land on whichever family member ran first). These are real work and
    // stay inside the reported total — the attribution is just explicit now.
    val builds: Seq[(String, () => Unit)] = Seq(
      "_build_msgs" -> (() => { sources.Tables.msgs(spark, sfDir).count(); () }),
      "_build_links" -> (() => { operators.ChainLink.linksFor(spark, sfDir).count(); () }),
      "_build_linked" -> (() => { operators.ChainLink.linkedFor(spark, sfDir).count(); () }),
      "_build_shingle_index" -> (() => { operators.Dedup.shinglesHashedFor(spark, sfDir).count(); () }),
      "_build_shingle_inter" -> (() => { operators.Dedup.interFor(spark, sfDir).count(); () }),
      "_build_simhash" -> (() => { operators.Dedup.simhashesFor(spark, sfDir).count(); () }),
      "_build_normed" -> (() => { operators.Dedup.normedFor(spark, sfDir).count(); () }),
      "_build_exact_pairs" -> (() => { operators.Dedup.exactPairsFor(spark, sfDir).count(); () }),
      "_build_ivf_pairs" -> (() => { operators.Dedup.ivfHashminPairsFor(spark, sfDir).count(); () }),
      "_build_kmeans_cents" -> (() => { operators.Clustering.kmeansCentroidsFor(spark, sfDir).count(); () }),
      "_build_ivf_assign" -> (() => { operators.Similarity.ivfAssignFor(spark, sfDir).count(); () }),
      "_build_ivf2_assign" -> (() => { operators.Similarity.ivf2AssignFor(spark, sfDir).count(); () }),
      "_build_km_pairs" -> (() => { operators.Dedup.ivfKmeansPairsFor(spark, sfDir).count(); () }),
      "_build_ivf1_pairs" -> (() => { operators.Dedup.ivfSinglePairsFor(spark, sfDir).count(); () }),
      "_build_km_assign" -> (() => { operators.Similarity.kmAssignFor(spark, sfDir).count(); () }),
      "_build_doc_bigrams" -> (() => { operators.TextAnalysis.docBigramsFor(spark, sfDir).count(); () }),
      "_build_unigrams" -> (() => { operators.TextAnalysis.unigramCountsFor(spark, sfDir).count(); () }),
      "_build_bpe_vocab" -> (() => { operators.TextAnalysis.bpeVocabFor(spark, sfDir).count(); () }),
      "_build_ann_topk" -> (() => { operators.Similarity.annTopkFor(spark, sfDir).count(); () }),
      "_build_pq_codes" -> (() => { operators.Similarity.pqCodesFor(spark, sfDir).count(); () }),
      "_build_pq_dtab" -> (() => { operators.Similarity.pqDtabFor(spark, sfDir).count(); () }),
      "_build_pq_top" -> (() => { operators.Similarity.pqTopFor(spark, sfDir).count(); () }),
      "_build_pq_ivf_top" -> (() => { operators.Similarity.pqIvfTopFor(spark, sfDir).count(); () }),
      "_build_pq_member" -> (() => { operators.Similarity.memberCodesFor(spark, sfDir).count(); () }),
      "_build_pq_cb_train" -> (() => { operators.Similarity.pqTrainedCodebookFor(spark, sfDir).count(); () }),
      "_build_pq_trained_codes" -> (() => { operators.Similarity.pqTrainedCodesFor(spark, sfDir).count(); () }),
      "_build_pq_trained_dtab" -> (() => { operators.Similarity.pqTrainedDtabFor(spark, sfDir).count(); () }),
      "_build_pq_trained_top" -> (() => { operators.Similarity.pqTrainedTopFor(spark, sfDir).count(); () }),
      "_build_pq_ivf_trained_top" -> (() => { operators.Similarity.pqIvfTrainedTopFor(spark, sfDir).count(); () }),
      "_build_pq_res_top" -> (() => { operators.Similarity.pqResidualTopFor(spark, sfDir).count(); () }),
      "_build_strict_links" -> (() => { operators.ChainLink.strictLinksFor(spark, sfDir).count(); () }),
      "_build_trace_depth" -> (() => { operators.ChainLink.depthsFor(spark, sfDir).count(); () }),
      "_build_shingle_sizes" -> (() => { operators.Dedup.sizesFor(spark, sfDir).count(); () }),
      "_build_shingle_all" -> (() => { operators.Corpus.allShingleHashesFor(spark, sfDir).count(); () }),
      "_build_co_edges" -> (() => { operators.Graph.coEdges(spark, sfDir).count(); () }),
      "_build_media_meta" -> (() => { operators.Multimodal.mediaMetaFor(spark, sfDir).count(); () }),
      "_build_sq_codes" -> (() => { operators.Similarity.sqCodesFor(spark, sfDir).count(); () }),
      "_build_sq_top" -> (() => { operators.Similarity.sqTopFor(spark, sfDir).count(); () }),
      "_build_sq_member" -> (() => { operators.Similarity.memberSqCodesFor(spark, sfDir).count(); () }),
      "_build_sq_ivf_top" -> (() => { operators.Similarity.sqIvfTopFor(spark, sfDir).count(); () }),
      "_build_knn_edges" -> (() => { operators.Neighbors.knnEdgesFor(spark, sfDir).count(); () }),
      "_build_cc_labels" -> (() => { operators.Curation.ccLabelsFor(spark, sfDir).count(); () }),
      "_build_knn_cc" -> (() => { operators.Neighbors.knnCcFor(spark, sfDir).count(); () }),
      "_build_bm25_stats" -> (() => {
        val (qt, tot) = operators.Analytics.bm25StatsFor(spark, sfDir)
        qt.count(); tot.count(); ()
      }),
    )
    // The ONLY filter selects builds too (by their _build_* names) — the
    // sfN tail probes time the heavy index materializations directly.
    // A query-only ONLY set therefore skips all builds, as before.
    val buildResults = builds
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, body) => name -> time(name)(body()) }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // Steady-state timing: one untimed warm execution per query before the
    // timed repeats. First executions pay one-off whole-stage-codegen JIT
    // (the 16×64-literal LSH signature fold compiles a very large method);
    // median-of-3 already reports a clean middle, but the spread metric
    // would otherwise be dominated by that one-time compile instead of real
    // run-to-run variance. Disable with SPARK_GRAFT_BENCH_WARM=0.
    val warm = sys.env.get("SPARK_GRAFT_BENCH_WARM").forall(_ != "0")
    // Drift-adjudication aid: SPARK_GRAFT_EXPLAIN_DIR=<dir> dumps each timed
    // query's formatted physical plan to <dir>/<name>.plan.txt so a re-timed
    // outlier carries its plan as evidence (plan unchanged + time in band =
    // environment, not regression).
    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    explainDir.foreach(d => new java.io.File(d).mkdirs())
    val queryTimes = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        // warm failures surface through the timed repeats (same exception)
        if (warm) { try fn(spark, sfDir).count() catch { case _: Throwable => () } }
        explainDir.foreach { d =>
          try {
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(d, s"$name.plan.txt"),
              plan.getBytes("UTF-8"))
          } catch { case scala.util.control.NonFatal(_) => () }
        }
        name -> (1 to repeat).map(_ => time(name) { fn(spark, sfDir).count(); () })
      }
    // A name that errored in ANY repeat is dropped from the medians and the
    // total — its fast-fail elapsed times are meaningless — and reported
    // only in the errors map (n_queries/n_builds count published medians).
    val queryResults = queryTimes.collect {
      case (n, ts) if !errors.contains(n) => n -> median(ts)
    }
    val healthyBuilds = buildResults.filterNot { case (n, _) => errors.contains(n) }
    // millisecond precision keeps the (long) line compact so a tail-
    // truncated capture holds as many per-query medians as possible; every
    // printed number is rounded BEFORE totaling so the documented exact
    // reconciliation (sum of printed entries == printed value) holds
    def ms(v: Double): Double = math.rint(v * 1000.0) / 1000.0
    def fmt(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v) // '.' decimal in any locale
    // Minimal JSON string escaping — Spark exception messages routinely
    // contain newlines and plan fragments; an unescaped control character
    // would both break JSON validity and split the one-line output contract
    def jstr(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c    => c.toString
    }
    val results = (healthyBuilds ++ queryResults).map { case (k, v) => k -> ms(v) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val spread =
      if (repeat == 1) ""
      else queryTimes.collect { case (k, ts) if !errors.contains(k) =>
        s"\"" + k + "\":" + fmt(ts.max - ts.min)
      }.mkString(""""spread":{""", ",", "},")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => s"\"" + jstr(k) + "\":\"" + jstr(v) + "\"" }
        .mkString(""""errors":{""", ",", "},")
    val total = results.map(_._2).sum
    // Builds-vs-queries attribution (judge r9 task 5): builds are one-time
    // index materializations (~45% of wall at sf0.1) whose drift means
    // something different from query drift — the footer carries the split
    // so the drift gate can adjudicate them separately. Rounded entries
    // sum exactly: build_total + query_total == value.
    val buildTotal = healthyBuilds.map { case (_, v) => ms(v) }.sum
    val queryTotal = queryResults.map { case (_, v) => ms(v) }.sum
    // One JSON line, ordered errors → spread → medians → footer: tail-
    // truncated captures keep the END of a long line, so the per-query
    // medians and the headline total must come after the (equally long)
    // spread map — round 5's artifact kept only the spread and lost every
    // median. n_queries/n_builds count PUBLISHED medians (errored names are
    // excluded); n_errors lives in the footer so even a truncated capture
    // shows whether the run was healthy.
    println(s"""{$errJson$spread"queries":$qs,"sf":"${jstr(sfDir)}","schema_fp":"$schemaFp","ts_type":"${jstr(tsType)}","metric":"total","unit":"sec","repeat":$repeat,"n_queries":${queryResults.size},"n_builds":${healthyBuilds.size},"n_errors":${errors.size},"build_total":${fmt(buildTotal)},"query_total":${fmt(queryTotal)},"value":${fmt(total)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
