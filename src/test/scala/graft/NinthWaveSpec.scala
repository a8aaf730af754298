package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** Ninth-wave operators: the kNN graph build, kNN-classifier pseudo-
  * labeling, and the retrieval/substring additions of this round.
  */
class NinthWaveSpec extends SparkSpec {
  import spark.implicits._

  test("knn graph: one row per vector, degrees bounded and consistent") {
    val g = Neighbors.knnGraph(spark, sf0001).cache()
    val n = spark.read.parquet(s"$sf0001/embeddings.parquet").count()
    assert(g.count() === n, "every vector must appear in the graph")
    assert(g.select("vec_id").distinct().count() === n)
    val bad = g.where(col("out_deg") > Neighbors.GraphK ||
      col("mutual_deg") > col("out_deg") || col("out_deg") < 1).count()
    assert(bad === 0L, "0 < out_deg <= K and mutual_deg <= out_deg")
  }

  test("knn graph: top1 edge is mutual iff reversed edge exists") {
    val e = Neighbors.knnEdgesFor(spark, sf0001).cache()
    // rk is dense 1..out_deg per src
    val rkBad = e.groupBy("src")
      .agg(count(lit(1)).as("n"), max(col("rk")).as("mx"), min(col("rk")).as("mn"))
      .where(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(rkBad === 0L, "rk must be dense from 1")
    // no self-edges, no duplicate (src, dst)
    assert(e.where($"src" === $"dst").count() === 0L)
    assert(e.groupBy("src", "dst").count().where($"count" > 1).count() === 0L)
  }

  test("label prop: per-label rows, counts consistent, full coverage") {
    val lp = Neighbors.labelProp(spark, sf0001).cache()
    val labels = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("label").cast("long")).distinct().count()
    assert(lp.count() === labels)
    val bad = lp.where(col("n_correct") > col("n_pred") ||
      col("n_pred") > col("n_test") ||
      col("acc_permille") =!= expr("n_correct * 1000 div n_test")).count()
    assert(bad === 0L)
    // every held-out vector must receive a prediction: a nprobe=2 probe
    // over 64 buckets always finds labeled candidates on this corpus, so
    // n_pred < n_test would mean the candidate join dropped queries.
    // (Accuracy itself is a READOUT here, not an invariant — the synthetic
    // labels are independent of the embedding geometry, so the honest
    // measured accuracy sits at the 1/labels chance rate; the oracle
    // hash-match is what pins the vote arithmetic.)
    val totals = lp.agg(sum("n_pred"), sum("n_test")).as[(Long, Long)].head()
    assert(totals._1 === totals._2, "all test vectors must be predicted")
  }
}
