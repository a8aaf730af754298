package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Decision harness for the routed-pair-build probe width and budget:
  * for each (coarseNprobe, finePerCell[, capB]) config it builds the
  * two-level-routed pair set UN-memoized, times it, and prices its
  * recall against the exact all-pairs truth (audit population — same
  * denominator as `q_ann_recall`) and its overlap with the PRODUCTION
  * routed build ([[Dedup.ivfHashminPairsFor]], 3×8 @ B=[[Dedup.PairSubB]]). One JSON line per config; the shared inputs
  * (normed corpus, quantizer levels, exact truth, production pairs) ride
  * the session memos so the sweep prices exactly the probe pass + pair
  * volume, not index rebuilds.
  *
  * Env: SPARK_GRAFT_SF_DIR (scale), SPARK_GRAFT_SWEEP
  * ("2x4,2x8,3x8@256" — coarseNprobe x finePerCell, optional @capB
  * overriding [[Dedup.PairSubB]]), SPARK_GRAFT_UNSALTED=1 to add the
  * legacy global-hash-split arm per config, SPARK_GRAFT_CPUS.
  */
object PairProbeAudit {
  /** [[Dedup.subBucketPairs]] with the r13 GLOBAL hash(vec_id) split
    * order — the baseline arm of the salted-vs-unsalted A/B. Production
    * salts the split per bucket (hash(cent_id:vec_id)); under this
    * global order every bucket ranks its members identically, so a pair
    * separated in hash rank is separated in EVERY bucket it co-occupies
    * and multi-probe redundancy buys no retention (the measured r14
    * result this harness exists to keep reproducible: widening 4 → 8
    * fine cells at sf0.1 read 403 → 241 permille unsalted vs 579 → 622
    * salted).
    */
  private def subBucketPairsUnsalted(v: org.apache.spark.sql.DataFrame,
      probeIds: org.apache.spark.sql.DataFrame,
      capB: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.sources.Tables
    import graft.functions.VectorOps
    val w = Window.partitionBy(col("cent_id"))
      .orderBy(Tables.portableHash(col("vec_id").cast("string")), col("vec_id"))
    val subbedIds = probeIds
      .withColumn("sub", ((row_number().over(w) - 1) / capB).cast("int"))
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
    val unsaltedArm = sys.env.get("SPARK_GRAFT_UNSALTED").contains("1")
    // "COxFP" or "COxFP@B" (B overrides PairSubB for that config)
    val sweep = sys.env.getOrElse("SPARK_GRAFT_SWEEP", "2x4,2x6,2x8")
      .split(",").toSeq.map { s =>
        // fail with the offending token, not a bare MatchError (the
        // KnnProbeAudit r16-ADVICE fix, applied here for consistency)
        try {
          val (probe, cap) = s.trim.span(_ != '@')
          val Array(co, fp) = probe.split("x")
          (co.toInt, fp.toInt,
            if (cap.isEmpty) Dedup.PairSubB else cap.drop(1).toInt)
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

    val exact = Dedup.exactPairsFor(spark, sfDir).select("vec_a", "vec_b")
    // `prod` is the ROUTED production build (3×8 @ PairSubB);
    // every config's held_permille below is overlap against THIS set.
    val prod = Dedup.ivfHashminPairsFor(spark, sfDir).select("vec_a", "vec_b")
    val nExact = exact.count()
    val nProd = prod.count()
    val nProdHit = exact.join(prod, Seq("vec_a", "vec_b"), "left_semi").count()
    // no "sec" key on this row — the production build rides the session
    // memo, so a wall time here would price a parquet read, not the build;
    // omitting the key (vs "sec":null) keeps float-parsing consumers safe.
    println(s"""{"metric":"pair_probe_audit","config":"prod_routed_${
        Dedup.PairCoarseNprobe}x${Dedup.PairFinePerCell}",""" +
      s""""sf":"$sfDir","n_pairs":$nProd,""" +
      s""""recall_permille":${if (nExact == 0) 1000 else nProdHit * 1000 / nExact},""" +
      s""""held_permille":1000}""")

    // Legacy single-level nprobe=8 build (salted split, production B),
    // fresh-built for a like-for-like time column; its recall comes from
    // ITS OWN pair set and its held_permille is overlap vs the routed
    // production build. SPARK_GRAFT_SKIP_BASELINE=1 skips this arm — at
    // sf10 the retired O(N·√N) probe pass costs ~650 s (measured r16),
    // which a probe-width-only sweep doesn't need to re-pay per run.
    val v = Dedup.normedFor(spark, sfDir)
    if (!sys.env.get("SPARK_GRAFT_SKIP_BASELINE").contains("1")) {
    val tp0 = System.nanoTime()
    val prodFresh = Dedup.subBucketPairs(v,
      Similarity.multiProbe(v, Similarity.centroidsMemoFor(spark, sfDir),
        nprobe = 8).select("vec_id", "cent_id"))
      .select("vec_a", "vec_b").localCheckpoint(true)
    val nProdFresh = prodFresh.count()
    val prodSec = (System.nanoTime() - tp0) / 1e9
    val nFreshHit =
      exact.join(prodFresh, Seq("vec_a", "vec_b"), "left_semi").count()
    val nFreshHeld =
      prod.join(prodFresh, Seq("vec_a", "vec_b"), "left_semi").count()
    println(s"""{"metric":"pair_probe_audit","config":"single_np8",""" +
      s""""sf":"$sfDir","sec":${"%.2f".formatLocal(java.util.Locale.ROOT, prodSec)},"n_pairs":$nProdFresh,""" +
      s""""recall_permille":${if (nExact == 0) 1000 else nFreshHit * 1000 / nExact},""" +
      s""""held_permille":${if (nProd == 0) 1000 else nFreshHeld * 1000 / nProd}}""")
    }

    for ((co, fp, capB) <- sweep;
         salted <- if (unsaltedArm) Seq(true, false) else Seq(true)) {
      val t0 = System.nanoTime()
      val probeIds = Similarity.ivf2ProbeIds(spark, sfDir,
        coarseNprobe = co, finePerCell = fp)
      val routed = (if (salted) Dedup.subBucketPairs(v, probeIds, capB)
                    else subBucketPairsUnsalted(v, probeIds, capB))
        .select("vec_a", "vec_b").localCheckpoint(true)
      val nRouted = routed.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val nHit = exact.join(routed, Seq("vec_a", "vec_b"), "left_semi").count()
      val nHeld = prod.join(routed, Seq("vec_a", "vec_b"), "left_semi").count()
      println(s"""{"metric":"pair_probe_audit","config":"${co}x$fp${
          if (capB != Dedup.PairSubB) s"@$capB" else ""}${
          if (salted) "" else "_unsalted"}",""" +
        s""""sf":"$sfDir","sec":${"%.2f".formatLocal(java.util.Locale.ROOT, sec)},"n_pairs":$nRouted,""" +
        s""""recall_permille":${if (nExact == 0) 1000 else nHit * 1000 / nExact},""" +
        s""""held_permille":${if (nProd == 0) 1000 else nHeld * 1000 / nProd}}""")
    }
    println(s"""{"metric":"pair_probe_audit_base","sf":"$sfDir",""" +
      s""""n_exact":$nExact,"n_prod":$nProd,"prod_recall_permille":${
        if (nExact == 0) 1000 else nProdHit * 1000 / nExact}}""")
    spark.stop()
  }
}
