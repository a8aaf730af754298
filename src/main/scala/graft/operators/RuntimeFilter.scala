package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Bloom-filter runtime pre-filtering — the distributed analog of Spark's
  * own injected runtime filters (and of Flink's dynamic filtering): build a
  * compact membership sketch of the *selective* side's join keys, broadcast
  * it, and drop non-matching probe rows **before** they enter the shuffle.
  * The final exact semi-join keeps semantics exact (false positives are
  * re-checked, false negatives impossible), so the result is bit-identical
  * to a plain semi-join while the shuffle carries only ~selectivity × probe
  * rows.
  *
  * The sketch build is itself distributed: per-key bit positions are
  * computed map-side and OR-folded by a partial-aggregated `bit_or` groupBy
  * on the slot index — at any scale the bloom costs one pass over the build
  * side plus a 16-row shuffle.
  */
object RuntimeFilter {

  private val Bits  = 1024
  private val Slots = Bits / 64

  private def positions(key: Column): Seq[Column] =
    Seq(1, 2).map(seed => pmod(xxhash64(key, lit(seed)), lit(Bits)))

  /** One row with `bits: array<long>` (Slots longs) covering `keys`. */
  private[graft] def build(keys: DataFrame): DataFrame = {
    val pos = keys.select(explode(array(positions(col(keys.columns.head)): _*)).as("p"))
    // coalesce: bit_or over an EMPTY build side is NULL per slot; an
    // all-zero bitmap (rejects everything) is the correct empty-set filter
    val slotCols = (0 until Slots).map { j =>
      coalesce(bit_or(when(expr(s"p div 64") === j,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"))
        .otherwise(lit(0L))), lit(0L)).as(s"b$j")
    }
    pos.agg(slotCols.head, slotCols.tail: _*)
      .select(array((0 until Slots).map(j => col(s"b$j")): _*).as("bits"))
  }

  /** Membership predicate for `keyCol` (a SQL column name) against a
    * driver-materialized bitmap, as a scan-stage SQL expression.
    */
  private def mightContainSql(bits: Seq[Long], keyCol: String, seed: Int): Column = {
    val arr = bits.mkString("array(", "L, ", "L)")
    val p = s"pmod(xxhash64($keyCol, $seed), $Bits)"
    expr(s"(shiftright(element_at($arr, CAST($p div 64 AS INT) + 1), " +
      s"CAST($p % 64 AS INT)) & 1) = 1")
  }

  /** Revenue by return flag for lineitems of URGENT orders, probe side
    * pre-filtered by the bloom sketch. Oracle: the plain `EXISTS` semi-join
    * — identical output by construction.
    *
    * The sketch is materialized on the driver (16 longs — one tiny action,
    * the broadcast-variable pattern Spark's own InjectRuntimeFilter uses
    * for its bloom subqueries) and applied as a scan-stage literal
    * predicate. Keeping it a join against a 1-row relation instead lets
    * Catalyst reorder the exact semi-join below the membership filter
    * (observed at small SF, where the semi side is broadcastable), which
    * silently turns the bloom into dead post-join work; a literal predicate
    * is pinned to the scan at every scale.
    */
  def bloomSemiRevenue(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.load(spark, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val bits: Seq[Long] = build(urgent).head().getSeq[Long](0)

    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"))
    val probed = li.where(mightContainSql(bits, "l_orderkey", 1) &&
      mightContainSql(bits, "l_orderkey", 2))

    val cents = (c: Column) => round(c * 100).cast("long")
    probed.join(urgent, probed("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("revenue_e4"),
        count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")
  }
}
