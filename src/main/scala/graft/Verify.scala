package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // Same join-strategy ladder as Engine.session/Bench (see
      // Engine.session): broadcast < shuffled-hash < sort-merge.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Same scan-split floor as Engine.session/Bench (see Engine.session).
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      // Same AQE start-wide-coalesce-back lever as Engine.session/Bench.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 2).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated query filter (dev loop): restricts both the
    // dump and the emitted oracle map so check.py compares just the subset.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Emit the oracle map BEFORE the dump: it depends on nothing below, and
    // writing it first means a query failure/timeout can cost at most that
    // query's rows, never the whole round's compare.
    val json = SparkEntry.oracleSql.filter(kv => keep(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Queries are independent; run 4 at a time on the shared session
    // (Spark schedules concurrent actions fine, and Materialized's memo is
    // concurrency-safe) — roughly halves the dump wall-clock, dominated by
    // many small sequential jobs otherwise. Daemon threads + try/finally so
    // a per-query hang or setup failure can't keep the JVM alive or skip
    // the pool teardown.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
      (r: Runnable) => { val t = new Thread(r, "verify-dump"); t.setDaemon(true); t })
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val futures = SparkEntry.queries.toSeq.filter(kv => keep(kv._1))
        .map { case (name, fn) =>
        scala.concurrent.Future {
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            // e.toString, not getMessage: NPE-class exceptions carry a null
            // message, and triage needs the class name either way
            System.err.println(s"[verify] $name failed: $e")
          }
        }
      }
      import scala.concurrent.duration._
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures), 60.minutes)
    } finally {
      pool.shutdown()
      spark.stop()
    }
  }
}
