package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{count, lit}
import graft.operators.Dedup

/** Adopt-or-reject harness for feeding the NN-descent-refined kNN graph
  * back into the PAIR-RECALL contract (round 17, judge ask #2): the
  * round-16 pair probe-width sweep proved that axis exhausted, so the
  * graph's edge list — exact-cosine-ranked already — is the orthogonal
  * candidate source. Measures, against the strided exact pair truth
  * ([[Dedup.exactPairsFor]]):
  *   - the production routed build's recall ([[Dedup.ivfHashminPairsFor]])
  *   - the graph-derived pair set's own recall ([[Dedup.graphPairsFor]])
  *   - the UNION's recall — the adoption candidate
  * and the marginal wall of the graph-pair derivation with the graph
  * memo warm (the honest in-pipeline cost: the graph is already built
  * for the graph-family queries) plus, separately, the graph build's own
  * wall (the cost a pair-only pipeline would newly pay).
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
    // truth + production build, timed as their own lines
    val (nExact, exactSec) =
      timed(Dedup.exactPairsFor(spark, sfDir).count())
    val (nRouted, routedSec) =
      timed(Dedup.ivfHashminPairsFor(spark, sfDir).count())
    val (_, graphBuildSec) =
      timed(operators.Neighbors.knnEdgesFor(spark, sfDir).count())
    // marginal derivation cost with the graph memo warm
    val (nGraph, graphPairSec) =
      timed(Dedup.graphPairsFor(spark, sfDir).count())

    val exact = Dedup.exactPairsFor(spark, sfDir).select("vec_a", "vec_b")
    val routed = Dedup.ivfHashminPairsFor(spark, sfDir)
      .select("vec_a", "vec_b")
    val gp = Dedup.graphPairsFor(spark, sfDir).select("vec_a", "vec_b")
    def hits(cand: org.apache.spark.sql.DataFrame): Long =
      exact.join(cand, Seq("vec_a", "vec_b"), "left_semi")
        .agg(count(lit(1))).collect()(0).getLong(0)
    val hRouted = hits(routed)
    val hGraph = hits(gp)
    val hUnion = hits(routed.unionAll(gp).distinct())
    def pm(h: Long): Long = if (nExact == 0) 1000L else h * 1000L / nExact
    println(s"""{"metric":"pair_graph_audit","sf":"$sfDir",""" +
      s""""n_exact":$nExact,"n_routed":$nRouted,"n_graph":$nGraph,""" +
      s""""recall_routed_permille":${pm(hRouted)},""" +
      s""""recall_graph_permille":${pm(hGraph)},""" +
      s""""recall_union_permille":${pm(hUnion)},""" +
      s""""exact_sec":${fmt(exactSec)},"routed_sec":${fmt(routedSec)},""" +
      s""""graph_build_sec":${fmt(graphBuildSec)},""" +
      s""""graph_pairs_sec":${fmt(graphPairSec)}}""")
    spark.stop()
  }
}
