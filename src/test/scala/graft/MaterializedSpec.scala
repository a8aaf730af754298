package graft

import org.apache.spark.sql.functions._
import graft.sources.Materialized

/** Contract tests for the parquet-backed session memo layer: identity,
  * exact value roundtrip (including array columns, the embedding case),
  * and single-build semantics — the properties every memoized relation
  * in the engine leans on.
  */
class MaterializedSpec extends SparkSpec {

  test("second lookup returns the SAME relation without rebuilding") {
    var builds = 0
    def build = {
      builds += 1
      spark.range(10).select(col("id"), (col("id") * 2).as("v"))
    }
    val a = Materialized.of(spark, "spec:identity")(build)
    val b = Materialized.of(spark, "spec:identity")(build)
    assert(builds == 1, "builder must run exactly once per session")
    assert(a eq b, "memo must return the identical DataFrame instance")
    // parquet scans don't promise row order — values must survive exactly
    assert(b.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted ==
      (0L until 10L).map(i => (i, i * 2)))
  }

  test("parquet roundtrip preserves doubles, longs, strings, and arrays exactly") {
    val sp = spark
    import sp.implicits._
    val in = Seq(
      (1L, "alpha", 0.1 + 0.2, Seq(1.5, -2.25, 1e-300)),
      (2L, "", -0.0, Seq.empty[Double]),
      (3L, "τϵχτ", Double.MinPositiveValue, Seq(Double.MaxValue)))
      .toDF("id", "s", "d", "arr")
    val out = Materialized.of(spark, "spec:roundtrip")(in)
    val got = out.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), r.getSeq[Double](3)))
    val exp = in.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), r.getSeq[Double](3)))
    assert(got.toSeq == exp.toSeq)
  }

  test("empty relations memoize with their schema intact") {
    val out = Materialized.of(spark, "spec:empty")(
      spark.range(5).where(col("id") < 0)
        .select(col("id"), col("id").cast("string").as("s")))
    assert(out.count() == 0)
    assert(out.schema.map(_.name) == Seq("id", "s"))
  }

  test("nested builders (memo built inside another memo's builder) work") {
    val out = Materialized.of(spark, "spec:outer") {
      val inner = Materialized.of(spark, "spec:inner")(
        spark.range(4).select(col("id")))
      inner.agg(sum("id").as("total"))
    }
    assert(out.collect().head.getLong(0) == 6L)
    assert(Materialized.of(spark, "spec:inner")(fail("must not rebuild"))
      .count() == 4)
  }

  test("downstream filters push into the memo's parquet scan") {
    Materialized.of(spark, "spec:pushdown")(
      spark.range(100).select(col("id"), (col("id") % 7).as("k")))
    val q = Materialized.of(spark, "spec:pushdown")(fail("must not rebuild"))
      .where(col("k") === 3)
    val plan = q.queryExecution.executedPlan.toString
    val scan = plan.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scan.contains("PushedFilters: [") && scan.contains("EqualTo(k,3)"),
      s"filter not pushed to the memo scan: $scan")
  }
}
