package graft
import org.apache.spark.sql.SparkSession
import graft.operators.{Dedup, Neighbors}

/** Decision harness for the kNN-graph NN-descent ROUND COUNT
  * ([[Neighbors.KnnRefineRounds]]) — the [[KnnProbeAudit]] pattern
  * applied to the round-17 refinement axis, against the same
  * `q_knn_recall` contract: build the production probe seed
  * ([[Neighbors.knnEdgesBuild]] at the adopted 4×4@256) once, then apply
  * [[Neighbors.knnRefineRound]] incrementally, timing EACH round and
  * scoring the panel recall audit ([[Neighbors.knnRecallOf]]) after it.
  * One JSON line per round (round 0 = the un-refined seed), cumulative
  * and per-round wall separated, so the adopt-or-reject table reads
  * straight off the output. Incremental rather than per-config rebuilds:
  * round i's graph IS round i−1's graph plus one refinement, so one pass
  * prices the whole axis.
  *
  * Rounds run at the WORKING degree ([[Neighbors.KnnWorkK]], override
  * with SPARK_GRAFT_WORKK); each line scores the top-[[Neighbors.GraphK]]
  * TRUNCATION of the current working graph — the serving contract, not
  * the working degree's own recall.
  *
  * Env: SPARK_GRAFT_SF_DIR (scale), SPARK_GRAFT_ROUNDS (max rounds,
  * default 3), SPARK_GRAFT_WORKK (working degree), SPARK_GRAFT_CPUS.
  */
object KnnRefineAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val maxRounds = sys.env.get("SPARK_GRAFT_ROUNDS").map(_.trim.toInt)
      .getOrElse(3)
    val workK = sys.env.get("SPARK_GRAFT_WORKK").map(_.trim.toInt)
      .getOrElse(Neighbors.KnnWorkK)
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

    // Warm the round-independent session memos OUTSIDE the timed loop
    // (normed corpus, quantizer levels, two-level assignment, exact panel
    // truth) so round 0 isn't charged for them.
    operators.Similarity.ivf2AssignFor(spark, sfDir).count()
    operators.Similarity.annTopkFor(spark, sfDir).count()
    val v = Dedup.normedFor(spark, sfDir)

    def fmt(v: Double): String =
      "%.2f".formatLocal(java.util.Locale.ROOT, v)
    var cumSec = 0.0
    var edges = {
      val t0 = System.nanoTime()
      val e = Neighbors.knnEdgesBuild(spark, sfDir, Neighbors.KnnCoarseNprobe,
        Neighbors.KnnFinePerCell, Neighbors.KnnMemberCap, workK)
        .localCheckpoint(true)
      e.count()
      cumSec = (System.nanoTime() - t0) / 1e9
      e
    }
    for (round <- 0 to maxRounds) {
      if (round > 0) {
        val t0 = System.nanoTime()
        val next = Neighbors.knnRefineRound(v, edges, workK)
          .localCheckpoint(true)
        val _ = next.count()
        val roundSec = (System.nanoTime() - t0) / 1e9
        cumSec += roundSec
        edges.unpersist(true)
        edges = next
        print(s"""{"metric":"knn_refine_audit","workk":$workK,""" +
          s""""round":$round,"round_sec":${fmt(roundSec)},""")
      } else {
        print(s"""{"metric":"knn_refine_audit","workk":$workK,""" +
          s""""round":0,"round_sec":${fmt(cumSec)},""")
      }
      // score the SERVING truncation (top-GraphK), not the working graph
      val serve = edges.where(
        org.apache.spark.sql.functions.col("rk") <= Neighbors.GraphK)
      val nEdges = serve.count()
      val r = Neighbors.knnRecallOf(spark, sfDir, serve).collect()(0)
      println(s""""cum_sec":${fmt(cumSec)},"sf":"$sfDir",""" +
        s""""n_edges":$nEdges,""" +
        s""""n_queries":${r.getLong(0)},"panel_edges":${r.getLong(1)},""" +
        s""""n_hits":${r.getLong(2)},"hit_permille":${r.getLong(3)},""" +
        s""""recall_permille":${r.getLong(4)},"n_top1":${r.getLong(5)}}""")
    }
    spark.stop()
  }
}
