package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Decision harness for the routed-pair-build probe width (SCALING.md's
  * staged r15 call): for each (coarseNprobe, finePerCell) config it builds
  * the two-level-routed pair set UN-memoized, times it, and prices its
  * recall against the exact all-pairs truth (audit population — same
  * denominator as `q_ann_recall`) and its overlap with the production
  * single-level nprobe=8 pair set. One JSON line per config; the shared
  * inputs (normed corpus, quantizer levels, exact truth, production pairs)
  * ride the session memos so the sweep prices exactly the probe pass +
  * pair volume, not index rebuilds.
  *
  * Env: SPARK_GRAFT_SF_DIR (scale), SPARK_GRAFT_SWEEP ("2x4,2x6,2x8" —
  * coarseNprobe x finePerCell), SPARK_GRAFT_CPUS.
  */
object PairProbeAudit {
  /** [[Dedup.subBucketPairs]] with the sub-bucket hash SALTED PER BUCKET
    * (hash(cent_id:vec_id), not hash(vec_id)): the global-hash split
    * separates a pair identically in every bucket they co-occupy, so
    * multi-probe redundancy buys no retention; per-bucket salting makes
    * the splits independent — a pair sharing k buckets survives one with
    * probability ≈ 1-(1-B/s)^k at the identical pair budget.
    */
  private def subBucketPairsSalted(v: org.apache.spark.sql.DataFrame,
      probeIds: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.sources.Tables
    import graft.functions.VectorOps
    val w = Window.partitionBy(col("cent_id"))
      .orderBy(Tables.portableHash(concat(col("cent_id").cast("string"),
        lit(":"), col("vec_id").cast("string"))), col("vec_id"))
    val subbedIds = probeIds
      .withColumn("sub", ((row_number().over(w) - 1) / Dedup.PairCapB).cast("int"))
    val subbed = subbedIds.join(v, "vec_id")
      .select("cent_id", "sub", "vec_id", "e", "nrm")
    subbed.as("a").join(subbed.as("b"),
        col("a.cent_id") === col("b.cent_id") &&
          col("a.sub") === col("b.sub") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (VectorOps.dot(col("a.e"), col("b.e")) /
          (col("a.nrm") * col("b.nrm"))).as("cos"))
      .where(col("cos") >= 0.40)
      .distinct()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sweep = sys.env.getOrElse("SPARK_GRAFT_SWEEP", "2x4,2x6,2x8")
      .split(",").toSeq.map { s =>
        val Array(co, fp) = s.trim.split("x"); (co.toInt, fp.toInt)
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

    val exact = Dedup.exactPairsFor(spark, sfDir).select("vec_a", "vec_b")
    val prod = Dedup.ivfHashminPairsFor(spark, sfDir).select("vec_a", "vec_b")
    val nExact = exact.count()
    val nProd = prod.count()
    val nProdHit = exact.join(prod, Seq("vec_a", "vec_b"), "left_semi").count()
    // Production pair-build wall-clock (un-memoized, same JVM warmth as
    // the sweep configs) for a like-for-like time column.
    val v = Dedup.normedFor(spark, sfDir)
    val tp0 = System.nanoTime()
    val prodFresh = Dedup.subBucketPairs(v,
      Similarity.multiProbe(v, Similarity.centroidsMemoFor(spark, sfDir),
        nprobe = 8).select("vec_id", "cent_id"))
    val nProdFresh = prodFresh.count()
    val prodSec = (System.nanoTime() - tp0) / 1e9
    println(s"""{"metric":"pair_probe_audit","config":"prod_np8",""" +
      s""""sf":"$sfDir","sec":${f"$prodSec%.2f"},"n_pairs":$nProdFresh,""" +
      s""""recall_permille":${if (nExact == 0) 1000 else nProdHit * 1000 / nExact},""" +
      s""""held_permille":1000}""")

    // Production probe relation under the SALTED split — isolates the
    // split rule's effect at identical probes and budget.
    val tps = System.nanoTime()
    val prodSalted = subBucketPairsSalted(v,
      Similarity.multiProbe(v, Similarity.centroidsMemoFor(spark, sfDir),
        nprobe = 8).select("vec_id", "cent_id"))
      .select("vec_a", "vec_b").localCheckpoint(true)
    val nProdSalted = prodSalted.count()
    val prodSaltedSec = (System.nanoTime() - tps) / 1e9
    val nProdSaltedHit =
      exact.join(prodSalted, Seq("vec_a", "vec_b"), "left_semi").count()
    val nProdSaltedHeld =
      prod.join(prodSalted, Seq("vec_a", "vec_b"), "left_semi").count()
    println(s"""{"metric":"pair_probe_audit","config":"prod_np8_salted",""" +
      s""""sf":"$sfDir","sec":${f"$prodSaltedSec%.2f"},"n_pairs":$nProdSalted,""" +
      s""""recall_permille":${if (nExact == 0) 1000 else nProdSaltedHit * 1000 / nExact},""" +
      s""""held_permille":${if (nProd == 0) 1000 else nProdSaltedHeld * 1000 / nProd}}""")

    for ((co, fp) <- sweep; salted <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val probeIds = Similarity.ivf2ProbeIds(spark, sfDir,
        coarseNprobe = co, finePerCell = fp)
      val routed = (if (salted) subBucketPairsSalted(v, probeIds)
                    else Dedup.subBucketPairs(v, probeIds))
        .select("vec_a", "vec_b").localCheckpoint(true)
      val nRouted = routed.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val nHit = exact.join(routed, Seq("vec_a", "vec_b"), "left_semi").count()
      val nHeld = prod.join(routed, Seq("vec_a", "vec_b"), "left_semi").count()
      println(s"""{"metric":"pair_probe_audit","config":"${co}x$fp${
          if (salted) "_salted" else ""}",""" +
        s""""sf":"$sfDir","sec":${f"$sec%.2f"},"n_pairs":$nRouted,""" +
        s""""recall_permille":${if (nExact == 0) 1000 else nHit * 1000 / nExact},""" +
        s""""held_permille":${if (nProd == 0) 1000 else nHeld * 1000 / nProd}}""")
    }
    println(s"""{"metric":"pair_probe_audit_base","sf":"$sfDir",""" +
      s""""n_exact":$nExact,"n_prod":$nProd,"prod_recall_permille":${
        if (nExact == 0) 1000 else nProdHit * 1000 / nExact}}""")
    spark.stop()
  }
}
