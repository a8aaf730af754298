package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Explicit skew mitigation for heavy-hitter keys.
  *
  * AQE's skew-join splitting handles storage-level skew in shuffle joins at
  * runtime, but two shapes still need manual salting at 100 TB:
  *
  *   - a broadcast-ineligible join where ONE key carries a large fraction of
  *     the big side (AQE splits partitions, but a single hot key still lands
  *     in one task when the small side can't broadcast);
  *   - distinct-style aggregations (`collect_set`, `countDistinct`) on a hot
  *     key — partial aggregation doesn't shrink distinct state, so the final
  *     reducer for that key explodes.
  *
  * Both helpers preserve exact semantics for ANY salt assignment. The
  * aggregation helpers and the `saltOn` join derive the salt with
  * `xxhash64` over row content (deterministic, re-evaluation safe —
  * `rand()` is not, it breaks on task retry); the ONLY retry-unsafe path
  * is the explicitly named [[saltedJoinPositional]], whose name is the
  * warning.
  */
object Skew {

  /** Hot-key detection — the diagnostics side of skew handling (the salted
    * operators below are the mitigation): top-20 join keys by row count
    * with their permille share of the relation. One partial-aggregated
    * groupBy + a 20-row TakeOrdered; the total rides a broadcast scalar.
    * At 100 TB this is the query an operator runs BEFORE choosing a salt
    * factor or an AQE skew threshold.
    */
  def hotKeys(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem").select(col("l_orderkey"))
    val counts = li.groupBy("l_orderkey").agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col("l_orderkey"), col("n_rows"),
        expr("n_rows * 1000 div n_total").as("share_permille"))
      .orderBy(col("n_rows").desc, col("l_orderkey"))
      .limit(20)
  }

  private val SaltCol = "__graft_salt"

  /** Equi-join `big ⋈ small` on `key`, with the big side salted into
    * `salt` sub-keys and the small side replicated `salt`×. Output equals
    * `big.join(small, key)` exactly; the hot key's probe work is spread
    * over `salt` tasks at the cost of a `salt`× build-side blowup — size
    * `salt` ≈ (hot-key share × parallelism).
    *
    * `saltOn` must be stable row-identifying columns (a primary key, a
    * line number): the salt is `xxhash64(key, saltOn…) mod salt` — a pure
    * function of row CONTENT, so a task retry recomputes the identical
    * assignment.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      saltOn: Seq[Column]): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    require(saltOn.nonEmpty,
      "saltOn must identify rows; for relations with no stable id use " +
        "saltedJoinPositional and accept its retry caveat")
    saltedJoinWith(big, small, key, salt,
      pmod(xxhash64((col(key) +: saltOn): _*), lit(salt.toLong)))
  }

  /** Pre-r7 4-arg signature, kept one deprecation cycle so downstream call
    * sites keep compiling across the rename; the behavior is unchanged
    * (positional salting), only the name now carries the retry caveat.
    */
  @deprecated("positional salting is retry-unsafe; use the 5-arg " +
    "content-salted saltedJoin, or saltedJoinPositional to accept the caveat",
    "round 8")
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame =
    saltedJoinPositional(big, small, key, salt)

  /** Positional fallback for relations with NO stable row identity: salt =
    * `monotonically_increasing_id mod salt` (content hashing would send
    * fully-identical rows of a hot key back to ONE task — the degenerate
    * duplicate-heavy case salting exists for). RETRY-UNSAFE by
    * construction, hence the separate name: the id is row-order-dependent,
    * so a shuffle-fetch failure that partially recomputes the map stage
    * can re-salt rows differently from what already-committed reducers
    * fetched — rows duplicated or lost. Prefer rerunning the whole job
    * over trusting a retried one.
    */
  def saltedJoinPositional(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    saltedJoinWith(big, small, key, salt,
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
  }

  private def saltedJoinWith(big: DataFrame, small: DataFrame, key: String,
      salt: Int, saltExpr: Column): DataFrame = {
    val b = big.withColumn(SaltCol, saltExpr.cast("int"))
    val s = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Driver-surface salted-join query: items and total quantity per order
    * priority through [[saltedJoin]] on the lineitem⋈orders key, salt
    * derived from the stable (l_orderkey, l_linenumber) row identity —
    * the retry-safe overload. The oracle is the PLAIN join + aggregation:
    * salting must be invisible in the result, visible only in the
    * physical plan (the `__graft_salt` column in the join keys, asserted
    * by PlanAuditSpec). Salt 8 spreads a hot order key over 8 tasks at
    * the cost of an 8× replication of the (orderkey, priority) dim rows.
    */
  def saltedJoinPriority(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"))
    val ord = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    saltedJoin(li, ord, "l_orderkey", 8, Seq(col("l_linenumber")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  /** Two-phase `collect_set` under a hot group key: per-(key, salt) partial
    * sets, then a flatten+distinct merge — the distinct state for a hot key
    * is built across `salt` tasks instead of one. Returns
    * (key, values: sorted array).
    */
  def saltedCollectSet(df: DataFrame, key: String, value: Column, salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    df.withColumn(SaltCol,
        pmod(xxhash64(value), lit(salt)).cast("int"))
      .groupBy(col(key), col(SaltCol))
      .agg(collect_set(value).as("part"))
      .groupBy(col(key))
      // no array_distinct needed: salt = hash(value) % n partitions values
      // into DISJOINT buckets, and collect_set dedupes within each — the
      // flattened partials cannot overlap (same invariant
      // saltedCountDistinct's plain sum rests on)
      .agg(array_sort(flatten(collect_list(col("part")))).as("values"))
  }

  /** Exact distinct count under a hot group key via the same two-phase
    * split: distinct within (key, salt) partitions disjoint value ranges
    * (salt = hash(value) % n), so the final count is a plain sum.
    */
  def saltedCountDistinct(df: DataFrame, key: String, value: Column, salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    df.withColumn(SaltCol,
        pmod(xxhash64(value), lit(salt)).cast("int"))
      .groupBy(col(key), col(SaltCol))
      .agg(countDistinct(value).as("part_n"))
      .groupBy(col(key))
      .agg(sum(col("part_n")).as("n_distinct"))
  }
}
