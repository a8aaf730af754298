package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{count, lit}
import graft.operators.{Dedup, Neighbors}

/** Adopt-or-reject harness for the graph-derived candidate source of the
  * production pair build (round 17: serving-graph edges unioned into the
  * routed probes; round 18: the refine rounds' full scored-candidate
  * survivors — [[graft.operators.Neighbors.knnScoredPairsFor]]).
  * Measures, against the strided exact pair truth
  * ([[Dedup.exactPairsFor]]):
  *   - the PROBE-ONLY baseline — [[Dedup.subBucketPairs]] over the routed
  *     probe relation, built directly (ADVICE r17: the production
  *     [[Dedup.ivfHashminPairsFor]] has unioned the graph source since
  *     embivf5, so it can no longer reproduce this baseline)
  *   - the serving-truncation edge arm (rk ≤ GraphK — the r17 adoption)
  *   - the workK edge arm (the r17 verdict's suggested widening)
  *   - the scored-survivors arm ([[Dedup.graphPairsFor]] — the r18
  *     adoption; its derivation cost rides inside the graph build's
  *     chain, so graph_build_sec carries it)
  *   - the recall of probe ∪ each arm (the adoption comparisons)
  * plus the graph build's own wall (what a pair-only pipeline would
  * newly pay) and the production build's wall.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object PairGraphAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fmt(v: Double): String =
      "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def timed(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = body
      (n, (System.nanoTime() - t0) / 1e9)
    }
    // The eager checkpoint IS each arm's materialization, so it sits
    // inside its timed block (an eager localCheckpoint before the timed
    // count would move the work outside the clock).
    def timedDf(build: => org.apache.spark.sql.DataFrame)
        : (org.apache.spark.sql.DataFrame, Long, Double) = {
      val t0 = System.nanoTime()
      val df = build.localCheckpoint(true)
      val n = df.count()
      (df, n, (System.nanoTime() - t0) / 1e9)
    }
    val v = Dedup.normedFor(spark, sfDir)
    // truth, probe-only baseline, graph build, the two graph arms, and
    // the production union build — each timed as its own line
    val (nExact, exactSec) =
      timed(Dedup.exactPairsFor(spark, sfDir).count())
    val (probeOnlyDf, nProbe, probeSec) = timedDf(
      Dedup.subBucketPairs(v,
        operators.Similarity.ivf2ProbeIds(spark, sfDir,
          Dedup.PairCoarseNprobe, Dedup.PairFinePerCell)))
    val (_, graphBuildSec) =
      timed(Neighbors.knnWorkEdgesFor(spark, sfDir).count())
    val (serveDf, nServe, serveSec) = timedDf(
      Dedup.graphPairsOver(spark, v, Neighbors.knnEdgesFor(spark, sfDir)))
    val (workDf, nWork, workSec) = timedDf(
      Dedup.graphPairsOver(spark, v, Neighbors.knnWorkEdgesFor(spark, sfDir)))
    // the adopted source — a memo read here: its collection cost rides
    // inside graph_build_sec's chain (the scored checkpoints)
    val (candDf, nCand, candSec) = timedDf(Dedup.graphPairsFor(spark, sfDir))
    val (nProd, prodSec) =
      timed(Dedup.ivfHashminPairsFor(spark, sfDir).count())

    val exact = Dedup.exactPairsFor(spark, sfDir).select("vec_a", "vec_b")
    def hits(cand: org.apache.spark.sql.DataFrame): Long =
      exact.join(cand.select("vec_a", "vec_b"),
          Seq("vec_a", "vec_b"), "left_semi")
        .agg(count(lit(1))).collect()(0).getLong(0)
    def unionHits(arm: org.apache.spark.sql.DataFrame): Long =
      hits(probeOnlyDf.select("vec_a", "vec_b")
        .unionAll(arm.select("vec_a", "vec_b")).distinct())
    val hProbe = hits(probeOnlyDf)
    val hServe = hits(serveDf)
    val hWork = hits(workDf)
    val hCand = hits(candDf)
    def pm(h: Long): Long = if (nExact == 0) 1000L else h * 1000L / nExact
    println(s"""{"metric":"pair_graph_audit","sf":"$sfDir",""" +
      s""""n_exact":$nExact,"n_probe":$nProbe,"n_graph_serve":$nServe,""" +
      s""""n_graph_work":$nWork,"n_graph_cand":$nCand,"n_prod":$nProd,""" +
      s""""recall_probe_permille":${pm(hProbe)},""" +
      s""""recall_graph_serve_permille":${pm(hServe)},""" +
      s""""recall_graph_work_permille":${pm(hWork)},""" +
      s""""recall_graph_cand_permille":${pm(hCand)},""" +
      s""""recall_union_serve_permille":${pm(unionHits(serveDf))},""" +
      s""""recall_union_work_permille":${pm(unionHits(workDf))},""" +
      s""""recall_union_cand_permille":${pm(unionHits(candDf))},""" +
      s""""exact_sec":${fmt(exactSec)},"probe_sec":${fmt(probeSec)},""" +
      s""""graph_build_sec":${fmt(graphBuildSec)},""" +
      s""""graph_serve_sec":${fmt(serveSec)},""" +
      s""""graph_work_sec":${fmt(workSec)},""" +
      s""""graph_cand_sec":${fmt(candSec)},""" +
      s""""prod_sec":${fmt(prodSec)}}""")
    spark.stop()
  }
}
