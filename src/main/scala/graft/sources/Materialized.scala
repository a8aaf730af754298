package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization of shared intermediate relations (the links
  * relation, shingle/simhash signatures, normalized embeddings).
  *
  * Several queries in the driver contract are views over the same expensive
  * intermediate — e.g. `chain_link`, `link_pairs`, `expand_updates`,
  * `degree_histogram`, and `q_grandparents` all derive from the banded
  * interval join. Recomputing that join per query is pure waste in any
  * long-lived session. This is the single-process analog of what a 100 TB
  * deployment does with materialized intermediates: build the link relation /
  * signature index ONCE (a parquet/Delta table refreshed incrementally) and
  * serve every downstream query from it.
  *
  * Keyed by (session identity, logical key); values are `.cache()`d lazy
  * DataFrames, so nothing is computed until first use and Spark evicts
  * partitions under memory pressure (MEMORY_AND_DISK).
  */
object Materialized {

  /** Per-session memo maps keyed by the session object. Weak keys alone
    * cannot reclaim anything here: the cached DataFrames (values) hold their
    * SparkSession (key) strongly through their query plans, so every entry
    * pins its own key forever. Instead, stopped sessions are swept eagerly on
    * each lookup — `sparkContext.isStopped` is the session's end-of-life
    * signal, and dropping the inner map releases the plans (cached blocks
    * died with the context). Access to the map is synchronized; the inner
    * map is concurrent.
    */
  private val sessions =
    new java.util.IdentityHashMap[SparkSession, ConcurrentHashMap[String, DataFrame]]()

  private def forSession(spark: SparkSession): ConcurrentHashMap[String, DataFrame] =
    sessions.synchronized {
      val it = sessions.entrySet().iterator()
      while (it.hasNext) if (it.next().getKey.sparkContext.isStopped) it.remove()
      var m = sessions.get(spark)
      if (m == null) { m = new ConcurrentHashMap[String, DataFrame](); sessions.put(spark, m) }
      m
    }

  /** Memoize `build` under `key` for this session.
    *
    * NOT computeIfAbsent: builders nest (the enriched relation memo builds
    * the links memo inside its builder), and ConcurrentHashMap forbids
    * recursive mutation during computeIfAbsent — it throws "Recursive
    * update" whenever the nested key hashes into the same bin, which is
    * run-dependent. get + putIfAbsent allows nesting; the benign race (two
    * threads build the same lazy DataFrame, loser unpersists) costs nothing
    * because nothing is computed until first action.
    */
  def of(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val cache = forSession(spark)
    val existing = cache.get(key)
    if (existing != null) existing
    else {
      val built = build.cache()
      val prev = cache.putIfAbsent(key, built)
      if (prev != null) { built.unpersist(); prev } else built
    }
  }
}
