package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for named declared queries to files —
  * the committed plan evidence the optimization rounds require
  * (`plans/r<N>/<query>_{before,after}.txt`). Usage:
  *
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <query>[,<query>...]"
  *
  * e.g. `runMain graft.PlanDump plans/r19 before q_funnel,q7_volume`.
  * Plans are explained, never executed, so the default sf0.001 suffices;
  * join-strategy choices under the session's AQE settings are dumped as
  * the initial plan (isFinalPlan=false), same convention as r18's dumps.
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, qcsv) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // mirror Bench/Engine's join-strategy ladder (see Engine.session)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    qcsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      val fn = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query: $q"))
      val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] $q -> $outDir/${q}_$suffix.txt " +
        s"(${plan.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
