package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe exact global ranking.
  *
  * `Window.orderBy(...)` with no partition key funnels the whole relation
  * through ONE task — fine for a 150-row test table, fatal when the ranked
  * relation is corpus-scale (per-user aggregates at 100 TB are ~users-scale).
  * These helpers compute the identical numbers distributed:
  *
  *   1. range-partition on the sort key (each partition owns a contiguous
  *      key range),
  *   2. `row_number` within each partition (local sort, parallel),
  *   3. add per-partition offsets from one tiny count pass (the
  *      `zipWithIndex` shape, broadcast back as a 32-row join).
  *
  * The result is the exact global `row_number` over the total order — the
  * partition boundaries cancel out — at two parallel passes instead of one
  * single-task sort. Requires `sortCols` to be a total order (callers here
  * always tie-break on a unique id), which also makes the output
  * deterministic under any partitioning.
  */
object Ranking {

  private val Pid = "__graft_pid"
  private val LocalRn = "__graft_lrn"

  /** `df` + column `out` = exact global 1-based row number by `sortCols`.
    * Also returns the total row count (free — it's the sum of the offset
    * pass). One extra tiny job (per-partition counts) vs the single-task
    * window; the ranked relation itself is never gathered to one task.
    */
  def withGlobalRowNumber(df: DataFrame, out: String, sortCols: Column*): (DataFrame, Long) = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint() // count pass + main pass read one materialization
    val local = ranged.withColumn(LocalRn,
      row_number().over(Window.partitionBy(Pid).orderBy(sortCols: _*)))
    val counts = ranged.groupBy(Pid).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // offset for the i-th nonempty pid (ascending) = rows in all lower pids
    val cum = counts.scanLeft(0L)(_ + _._2)
    val offsetsDf = df.sparkSession.createDataFrame(
      counts.indices.map(i => (counts(i)._1, cum(i)))
    ).toDF(Pid, "__graft_off")
    val withRn = local.join(broadcast(offsetsDf), Pid)
      .withColumn(out, col(LocalRn) + col("__graft_off"))
      .drop(Pid, LocalRn, "__graft_off")
    (withRn, counts.map(_._2).sum)
  }

  /** `df` + column `out` = exact global `ntile(k)` by `sortCols` — the SQL
    * ntile formula (first `n mod k` tiles get ⌈n/k⌉ rows) applied to the
    * distributed global row number, bit-identical to a single-task
    * `ntile(k) over (order by ...)`.
    */
  /** `df` + column `out` = exact inclusive global running total of
    * `valueCol` in `sortCols` order — the distributed form of
    * `sum(v) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`, built the same
    * way as [[withGlobalRowNumber]]: local prefix sums inside range
    * partitions plus one broadcast per-partition offset pass. `sortCols`
    * must be a total order (callers tie-break on a unique id).
    */
  def withRunningTotal(df: DataFrame, valueCol: Column, out: String,
      sortCols: Column*): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val v = "__graft_val"
    val ranged = df.withColumn(v, valueCol)
      .repartitionByRange(parts, sortCols: _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint() // offset pass + main pass read one materialization
    val local = ranged.withColumn("__graft_lsum",
      sum(col(v)).over(Window.partitionBy(Pid).orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, 0)))
    val sums = ranged.groupBy(Pid).agg(sum(col(v)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val cum = sums.scanLeft(0L)(_ + _._2)
    val offsetsDf = df.sparkSession.createDataFrame(
      sums.indices.map(i => (sums(i)._1, cum(i)))
    ).toDF(Pid, "__graft_off")
    local.join(broadcast(offsetsDf), Pid)
      .withColumn(out, col("__graft_lsum") + col("__graft_off"))
      .drop(Pid, v, "__graft_lsum", "__graft_off")
  }

  def withGlobalNtile(df: DataFrame, k: Int, out: String, sortCols: Column*): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val rn = "__graft_rn"
    val (ranked, n) = withGlobalRowNumber(df, rn, sortCols: _*)
    val q = n / k
    val r = n % k
    // Long `div` (truncating integer division; all operands non-negative
    // here, so it equals floor) — `/` would route through doubles and lose
    // exactness past 2^53 rows.
    val tile =
      if (q == 0) col(rn) // n < k: tiles are single rows
      else when(col(rn) <= r * (q + 1),
          expr(s"(`$rn` - 1) div ${q + 1} + 1"))
        .otherwise(lit(r) + expr(s"(`$rn` - ${r * (q + 1)} - 1) div $q + 1"))
    ranked.withColumn(out, tile.cast("long")).drop(rn)
  }
}
