package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst integration: expose the engine's custom expressions to SQL.
  *
  * Two entry points:
  *   - `--conf spark.sql.extensions=graft.functions.GraftExtensions` at
  *     session build (the library-deployment path)
  *   - [[GraftFunctions.register]] on a live session (REPL/test path)
  *
  * so `SELECT graft_dot(a.e, b.e)` works anywhere the DataFrame API does.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[L2Squared].getName, "graft_l2sq"),
      (exprs: Seq[Expression]) => L2Squared(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_ldot"),
      new ExpressionInfo(classOf[LongDot].getName, "graft_ldot"),
      (exprs: Seq[Expression]) => LongDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_phash"),
      new ExpressionInfo(classOf[PortableHash60].getName, "graft_phash"),
      (exprs: Seq[Expression]) => PortableHash60(exprs(0))))
    e.injectFunction((
      new FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (exprs: Seq[Expression]) => TopKAgg(exprs(0), exprs(1), exprs(2))))
  }
}

object GraftFunctions {
  /** Register the function library into an existing session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "graft_l2sq", exprs => L2Squared(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "graft_ldot", exprs => LongDot(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "graft_phash", exprs => PortableHash60(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction(
      "graft_topk", exprs => TopKAgg(exprs(0), exprs(1), exprs(2)), "built-in")
  }
}
