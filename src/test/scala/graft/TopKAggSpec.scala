package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, TopKAgg}
import graft.operators.Relational
import graft.sources.Tables

/** The custom bounded-heap top-k aggregate: equivalence with the
  * window-rank idiom, deterministic tie-breaks, SQL registration, and the
  * plan property that motivates it (partial object-hash aggregation —
  * map-side heaps — instead of a whole-partition window sort).
  */
class TopKAggSpec extends SparkSpec {

  test("q_topk_parts == window row_number form on sf0.001") {
    val viaAgg = Relational.qTopkParts(spark, sf0001).collect()
    val p = Tables.load(spark, sf0001, "part")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("price_cents").desc, col("p_partkey"))
    val viaWindow = p
      .select(col("p_brand"), col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 3)
      .select(col("p_brand"), col("rk"), col("price_cents"), col("p_partkey"))
      .orderBy("p_brand", "rk")
      .collect()
    assert(viaAgg.toSeq == viaWindow.toSeq)
  }

  test("score ties break on tag ascending, deterministically") {
    import spark.implicits._
    val df = Seq(
      ("g", 10L, "c"), ("g", 10L, "a"), ("g", 10L, "b"), ("g", 9L, "z"))
      .toDF("g", "s", "t")
      .repartition(4) // force partial heaps + a merge across partitions
    val out = df.groupBy("g")
      .agg(TopKAgg.topK(col("s"), col("t"), 2).as("top"))
      .select(explode(col("top")))
      .select("col.score", "col.tag")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((10L, "a"), (10L, "b")))
  }

  test("k larger than the group returns the whole group, sorted") {
    import spark.implicits._
    val out = Seq(("g", 1L, "x"), ("g", 5L, "y"))
      .toDF("g", "s", "t")
      .groupBy("g").agg(TopKAgg.topK(col("s"), col("t"), 100).as("top"))
      .select(explode(col("top"))).select("col.score")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(5L, 1L))
  }

  test("null scores and tags are skipped, not retained") {
    import spark.implicits._
    val out = Seq(("g", Some(3L), Some("a")), ("g", None, Some("b")),
        ("g", Some(7L), None))
      .toDF("g", "s", "t")
      .groupBy("g").agg(TopKAgg.topK(col("s"), col("t"), 5).as("top"))
      .select(size(col("top"))).collect().head.getInt(0)
    assert(out == 1)
  }

  test("graft_topk is SQL-registered") {
    GraftFunctions.register(spark)
    Tables.load(spark, sf0001, "part").createOrReplaceTempView("tk_part")
    val n = spark.sql(
      """SELECT p_brand,
        |       graft_topk(CAST(round(p_retailprice * 100) AS BIGINT),
        |                  CAST(p_partkey AS STRING), 3) AS top
        |FROM tk_part GROUP BY p_brand""".stripMargin).count()
    assert(n > 0)
  }

  test("plan: object-hash partial aggregation, no window sort") {
    val plan = Relational.qTopkParts(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate (typed imperative agg) in:\n$plan")
    assert(!plan.contains("Window"),
      s"top-k agg must not fall back to a window plan:\n$plan")
  }
}
