package graft
import org.apache.spark.sql.SparkSession
import graft.operators.Neighbors

/** Decision harness for the kNN-GRAPH probe width and member-pool cap —
  * the [[PairProbeAudit]] pattern applied to the graph build's three
  * dials ([[Neighbors.KnnCoarseNprobe]] × [[Neighbors.KnnFinePerCell]]
  * × [[Neighbors.KnnMemberCap]]), against the `q_knn_recall` contract:
  * for each config it builds the directed edge list UN-memoized with the
  * exact production mechanism ([[Neighbors.knnEdgesBuild]]), times the
  * full build, and scores the panel audit ([[Neighbors.knnRecallOf]] —
  * per-query recall vs the exact cosine top-5, edge precision, top-1
  * hits). One JSON line per config; the shared inputs (normed corpus,
  * two quantizer levels, two-level assignment, exact truth) ride the
  * session memos so each line prices exactly the probe pass + member cap
  * + candidate join + top-k window — the build itself.
  *
  * Env: SPARK_GRAFT_SF_DIR (scale), SPARK_GRAFT_SWEEP
  * ("2x2,2x4@256,4x4" — coarseNprobe x finePerCell, optional @memberCap
  * overriding [[Neighbors.KnnMemberCap]]), SPARK_GRAFT_CPUS.
  */
object KnnProbeAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sweep = sys.env.getOrElse("SPARK_GRAFT_SWEEP", "2x2,2x4,4x4")
      .split(",").toSeq.map { s =>
        // fail with the offending token, not a bare MatchError (a
        // malformed "4x" / "4*4" / "4x4@" should name itself)
        try {
          val (probe, cap) = s.trim.span(_ != '@')
          val Array(co, fp) = probe.split("x")
          (co.toInt, fp.toInt,
            if (cap.isEmpty) Neighbors.KnnMemberCap else cap.drop(1).toInt)
        } catch { case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"bad SPARK_GRAFT_SWEEP token '${s.trim}' (want COxFP[@CAP])", e)
        }
      }
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

    // Warm the config-independent session memos OUTSIDE the timed loop
    // (normed corpus, quantizer levels, two-level assignment, exact
    // panel truth) so the first config isn't charged for them.
    operators.Similarity.ivf2AssignFor(spark, sfDir).count()
    operators.Similarity.annTopkFor(spark, sfDir).count()

    // '.' decimal in any locale (the Bench.fmt lesson: a comma-decimal
    // default locale would emit invalid JSON)
    def fmt(v: Double): String =
      "%.2f".formatLocal(java.util.Locale.ROOT, v)
    for ((co, fp, cap) <- sweep) {
      val t0 = System.nanoTime()
      val edges = Neighbors.knnEdgesBuild(spark, sfDir, co, fp, cap)
        .localCheckpoint(true)
      val nEdges = edges.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val r = Neighbors.knnRecallOf(spark, sfDir, edges).collect()(0)
      println(s"""{"metric":"knn_probe_audit","config":"${co}x$fp@$cap",""" +
        s""""sf":"$sfDir","sec":${fmt(sec)},"n_edges":$nEdges,""" +
        s""""n_queries":${r.getLong(0)},"panel_edges":${r.getLong(1)},""" +
        s""""n_hits":${r.getLong(2)},"hit_permille":${r.getLong(3)},""" +
        s""""recall_permille":${r.getLong(4)},"n_top1":${r.getLong(5)}}""")
      // free each arm's checkpointed edge blocks before the next one —
      // six pinned sf10 graphs would progressively squeeze execution
      // memory and skew exactly the walls the sweep compares
      edges.unpersist(true)
    }
    spark.stop()
  }
}
