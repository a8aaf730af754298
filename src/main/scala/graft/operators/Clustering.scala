package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Embedding clustering: one deterministic Lloyd (k-means) step — the
  * building block a training-data pipeline iterates for corpus
  * stratification / IVF index builds.
  *
  * Determinism across engines is the hard part of clustering-as-a-query:
  * a mean of doubles is order-dependent. The update therefore quantizes
  * each coordinate to int64 micro-units (`round(x·1e6)`) and aggregates
  * exact integer sums; the new centroid coordinate is `sum div count`
  * (integer division). Bit-identical in any engine, any partitioning, any
  * order — at the cost of 1e-6 quantization, irrelevant for clustering.
  *
  * Scale: assignment is a broadcast of C centroids against N vectors
  * (one codegen'd dot per pair, no shuffle of the vectors); the update is
  * one shuffle of (cluster, dim, q) rows — O(N·d) map-side-combined.
  */
object Clustering {

  /** One Lloyd step from the deterministic seed set (the fixed-K hash-min
    * sample of [[Similarity.centroidsFor]] — the same seeds the IVF index
    * starts from). Output: (cluster_id, dim, centroid_q, n_members) — the
    * updated centroid in micro-units, long-format by dimension.
    */
  /** `iters` Lloyd iterations from the hash-min seed set, returning the
    * refined centroid relation (cent_id, ce: array<double>, cn) — the
    * centroid table the k-means IVF index variant searches against.
    *
    * Each iteration is the [[kmeansStep]] update (cosine argmax assignment,
    * exact integer micro-unit means) followed by an array rebuild: the
    * long-format (cluster, dim, centroid_q) rows regroup into a sorted
    * double array with `centroid_q / 1e6` per coordinate. Every arithmetic
    * step (round, truncating div, double division, left-fold norm) is
    * bit-identical in DuckDB, so the oracle replays the whole loop.
    * Clusters that lose all members drop out (deterministically, in both
    * engines). Cost per iteration (round 15): one two-level-routed
    * broadcast argmax ([[Similarity.ivf2Assign]] over the current
    * table's coarse prefix — O(K1 + K/K1) ≈ O(N^¼) cosines per row) +
    * one map-side-combined shuffle of (cluster, dim, q) — O(N·d). K
    * follows [[Similarity.centroidKFor]] (64 through sf0.1, then
    * ~1.4·√N); the former single-level argmax priced O(N·K) = Θ(N^1.5)
    * per iteration, the exact term the routed pair/kNN builds retired.
    * The remaining 100 TB refinement is mini-batch Lloyd over a
    * fixed-size sample (⚙ SCALING.md).
    *
    * QUALITY CONTRACT of the routed assignment: since round 15 the
    * per-iteration argmax is APPROXIMATE (within the top-1 routed coarse
    * cell of the CURRENT table), so refinement can settle on worse
    * centroids than exact Lloyd when a vector's true nearest centroid
    * crosses the coarse boundary between iterations. The oracle replays
    * the identical routed decision (hash-pinned), so correctness gates
    * can't see a QUALITY regression here — `q_ann_recall_kmeans` and
    * `q_ivf_purity` are the hard gates that price it across scales, and
    * they must stay in the bench/correctness surface as long as this
    * routing does (a routed-assignment quality regression must fail a
    * gate, never land silently).
    */
  /** The 2-iteration refined centroid table, memoized per session — shared
    * by `ann_ivf_kmeans` and `q_ann_recall_kmeans` (64 rows; the Lloyd
    * loop runs once, not once per consumer query).
    */
  private[graft] def kmeansCentroidsFor(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Materialized.of(spark, s"kmcents2:$dir")(
      kmeansCentroids(spark, dir, iters = 2))

  def kmeansCentroids(spark: SparkSession, dir: String, iters: Int): DataFrame = {
    val v = Dedup.normedFor(spark, dir)
    val k1 = Similarity.coarseKFor(
      Similarity.centroidKFor(Similarity.corpusN(spark, dir)))
    var cents = Similarity.centroidsMemoFor(spark, dir)
    for (_ <- 1 to iters) {
      // map-only TWO-LEVEL-ROUTED argmax assignment (round 15): each
      // vector scores the k1-row coarse prefix of the CURRENT centroid
      // table, then argmaxes within its routed cell — O(K1 + K/K1) ≈
      // O(N^¼) cosines per row per iteration instead of the single-level
      // O(K) = O(√N) (`q_kmeans_step` sf10 slope 1.093, the #3 tail).
      // The coarse prefix re-derives per iteration from the refined
      // table (same hash-min cent_ids, current positions) in a K-row
      // pass; the oracle replays prefix, routing, and argmax per
      // iteration.
      val coarse = Similarity.coarsePrefix(cents, k1)
      val assign = Similarity.ivf2Assign(v, cents, coarse, keep = Seq("e"))
        .select(col("cent_id"), col("e"))
      val upd = assign
        .select(col("cent_id"), posexplode(col("e")).as(Seq("dim", "x")))
        .select(col("cent_id"), col("dim"),
          round(col("x") * 1000000.0).cast("long").as("q"))
        .groupBy("cent_id", "dim")
        .agg(expr("sum(q) div count(1)").as("cq"))
      val ce = transform(
        array_sort(collect_list(struct(col("dim"), col("cq")))),
        s => s.getField("cq") / lit(1000000.0))
      // localCheckpoint the K-row result (the Iterative.round pattern):
      // the routed assignment references the table several times
      // (coarse prefix, fine→coarse map, cell map), and an unmaterialized
      // iteration plan would re-run the previous iteration's corpus pass
      // per reference (measured 4× at sf0.1: 2.0 → 8.0 s un-checkpointed).
      cents = upd.groupBy("cent_id").agg(ce.as("ce"))
        .withColumn("cn", sqrt(graft.functions.VectorOps.dot(col("ce"), col("ce"))))
        .localCheckpoint(true)
    }
    cents
  }

  /** Seed-vs-refined centroid drift: for every centroid that survives the
    * 2-iteration Lloyd refinement, the cosine (permille, floored) between
    * its hash-min seed vector and its refined position — the one-line
    * answer to "did k-means actually move the index, and which cells
    * changed". Centroids whose cells emptied out drop from the refined
    * table and so from this report (deterministically, both engines).
    *
    * Both relations are K rows (broadcast-size); the report is a K-row
    * join over the 64-row seed memo and the 64-row refined memo — free at
    * any corpus size, because the corpus-sized work (seed selection,
    * assignment) already happened inside the memoized builds.
    */
  def centroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val seeds = Similarity.centroidsMemoFor(spark, dir)
      .select(col("cent_id"), col("ce").as("se"), col("cn").as("sn"))
    val kc = kmeansCentroidsFor(spark, dir)
    seeds.join(kc, "cent_id")
      .select(col("cent_id"),
        floor(lit(1000.0) * graft.functions.VectorOps.dot(col("se"), col("ce")) /
          (col("sn") * col("cn"))).cast("long").as("cos_permille"))
      .orderBy("cent_id")
  }

  def kmeansStep(spark: SparkSession, dir: String): DataFrame = {
    val v = Dedup.normedFor(spark, dir)

    // assignment: two-level-routed argmax from the seed table (round 15)
    // — exactly the memoized session index build (Similarity
    // .ivf2AssignFor assigns against centroidsMemoFor through
    // coarseMemoFor, the same seed/coarse pair a first Lloyd iteration
    // routes through), so the step query prices ONLY the update shuffle
    // on top of the shared index.
    val assign = Similarity.ivf2AssignFor(spark, dir)
      .join(v.select("vec_id", "e"), "vec_id")
      .select(col("vec_id"), col("cent_id").as("cluster_id"), col("e"))

    // update: exact integer sums of micro-quantized coordinates
    assign
      .select(col("cluster_id"), posexplode(col("e")).as(Seq("dim", "x")))
      .select(col("cluster_id"), col("dim"),
        round(col("x") * 1000000.0).cast("long").as("q"))
      .groupBy("cluster_id", "dim")
      .agg(sum("q").as("qsum"), count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("dim").cast("long").as("dim"),
        expr("qsum div n_members").as("centroid_q"), col("n_members"))
      .orderBy("cluster_id", "dim")
  }
}
