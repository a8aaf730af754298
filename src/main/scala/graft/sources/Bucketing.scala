package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the storage-side half of shuffle elimination.
  *
  * A join between two tables bucketed (and sorted) on the join key into the
  * same bucket count compiles to a SortMergeJoin with NO Exchange on either
  * side — the shuffle happened once, at write time, and every subsequent
  * join/aggregation on that key reads co-located partitions. At 100 TB this
  * is the difference between re-shuffling the fact table per query and
  * paying the layout cost once per ingest: the canonical pattern for a fact
  * table joined on the same key by many queries (links on ip, lineitem on
  * orderkey, shingle indexes on doc_id).
  *
  * Uses Spark's native bucketing (`DataFrameWriter.bucketBy` + hash-bucket
  * files + catalog metadata). Bucket pruning additionally skips whole
  * buckets for point predicates on the bucket key.
  */
object Bucketing {

  /** Write `df` as a bucketed + per-bucket-sorted managed parquet table.
    * One shuffle now; none later for joins/aggs on `key` between tables
    * sharing the bucket spec.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two bucketed tables. With matching bucket specs the physical
    * plan has no Exchange (PlanAuditSpec asserts this).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    // per-side column refs, not col(name): with the same key name on both
    // sides (the normal bucketed-join case, e.g. doc_id = doc_id) a bare
    // col() is ambiguous and analysis fails
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
