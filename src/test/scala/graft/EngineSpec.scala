package graft

/** The facade drives the same code paths as the named queries. */
class EngineSpec extends SparkSpec {

  test("facade batch surface returns the flagship result") {
    val out = Engine.chainLink(spark, sf0001)
    assert(out.count() == 1000)
    assert(out.columns.toSeq ==
      Seq("id", "src_ip", "dst_ip", "start_at_ms", "latency_msec",
        "end_at_ms", "parents", "children"))
  }

  test("facade exposes every driver query") {
    assert(Engine.queries.keySet == SparkEntry.queries.keySet)
    assert(Engine.queries.size >= 35)
  }

  test("registerAll makes the full surface addressable from spark.sql") {
    graft.operators.SqlApi.registerAll(spark, sf0001)
    val n = spark.sql(
      """SELECT count(*) AS n FROM msgs m
        |JOIN events e ON m.id = concat('msg_', e.event_id)""".stripMargin)
      .head().getLong(0)
    assert(n == 1000L)
    assert(spark.sql("SELECT count(*) FROM lineitem").head().getLong(0) > 0)
    // registerAll alone must make the custom functions available — no
    // dependence on the GraftExtensions session conf or another entry point
    assert(spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0) == 11.0)
  }

  test("graft_dot is registered by the facade session path") {
    graft.functions.GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_dot(array(1.0D), array(2.0D))").head().getDouble(0) == 2.0)
  }
}
