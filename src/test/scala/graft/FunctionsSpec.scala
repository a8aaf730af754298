package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, VectorOps}

class FunctionsSpec extends SparkSpec {

  test("graft_dot matches the interpreted HOF fold bit-for-bit") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (Seq(1.5, -2.25, 3.0), Seq(0.5, 4.0, -1.25)),
      (Seq(0.1, 0.2), Seq(0.3, 0.4)),
      (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    val rows = df.select(
      VectorOps.dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, v) => acc + v).as("slow")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot is SQL-callable after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("graft_ldot is SQL-callable and exact on int64 arrays") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_ldot(array(127L, -127L, 3L), array(127L, 127L, 2L)) AS d")
      .head().getLong(0)
    assert(r == 127L * 127L - 127L * 127L + 6L)
  }

  test("graft_ldot participates in whole-stage codegen") {
    val codes = graft.operators.Similarity.sqCodesFor(spark, sf0001)
    val df = codes.select(VectorOps.ldot(col("qe"), col("qe")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_ldot")).get.trim
    assert(line.startsWith("*"), s"ldot not codegen'd: $line")
  }

  test("graft_dot participates in whole-stage codegen") {
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
      .select(col("embedding").cast("array<double>").as("e"))
    val df = emb.select(VectorOps.dot(col("e"), col("e")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // '*' prefixes mark operators inside a WholeStageCodegen span; the
    // graft_dot projection must be codegen'd, fused with the scan
    val dotLine = plan.linesIterator.find(_.contains("graft_dot")).get.trim
    assert(dotLine.startsWith("*"), s"graft_dot not codegen'd:\n$plan")
    assert(df.head().getDouble(0) > 0.0)
  }

  test("graft_l2sq matches the interpreted HOF fold bit-for-bit") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (Seq(1.5, -2.25, 3.0), Seq(0.5, 4.0, -1.25)),
      (Seq(0.1, 0.2), Seq(0.3, 0.4)),
      (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
    val rows = df.select(
      VectorOps.l2sq(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v).as("slow")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_l2sq is SQL-callable after registration and codegen'd") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_l2sq(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(r == 27.0)
    val emb = graft.sources.Tables.load(spark, sf0001, "embeddings")
      .select(col("embedding").cast("array<double>").as("e"))
    val df = emb.select(VectorOps.l2sq(col("e"), col("e")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("graft_l2sq")).get.trim
    assert(line.startsWith("*"), s"graft_l2sq not codegen'd:\n$plan")
    assert(df.head().getDouble(0) == 0.0)
  }

  test("graft_phash == conv(substring(md5,1,15),16,10) on random strings") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(5)
    val strs = (0 until 500).map(_ => rnd.alphanumeric
      .take(rnd.nextInt(40)).mkString) ++
      Seq("", " ", "√unicode✓", "a b c", "\t")
    val df = strs.toDF("s").select(
      graft.functions.PortableHash60(col("s")).as("fused"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("composed"))
    assert(df.where(col("fused") =!= col("composed")).count() == 0L)
    assert(df.where(col("fused") < 0).count() == 0L)
  }

  test("graft_phash registered for SQL") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_phash('abc') AS h").head().getLong(0)
    val expected = spark.sql(
      "SELECT CAST(conv(substring(md5('abc'), 1, 15), 16, 10) AS BIGINT)")
      .head().getLong(0)
    assert(r == expected)
  }
}
