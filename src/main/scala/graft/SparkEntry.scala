package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a batch DataFrame query over the parquet
  * tables in `sfDir`; [[oracleSql]] holds the equivalent DuckDB SQL run by
  * the driver over the same tables. Column names and row order are aligned
  * between the two by construction (explicit aliases + total ORDER BY), and
  * every expression is engine-portable (integer money, md5-based hashing,
  * left-fold float reductions — see Tables.scala).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ChainLink.chainLink(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ §7 step 5). */
  /** One entry per implemented operator from SURVEY.md §2 (+ §7 step 5) —
    * concatenation of the per-family registries under [[graft.entry]].
    * Families are disjoint by construction (EntryRegistrySpec checks key
    * counts), so `++` order carries no override semantics.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    _root_.graft.entry.ChainQueries.queries ++
    _root_.graft.entry.RelationalQueries.queries ++
    _root_.graft.entry.AnalyticsQueries.queries ++
    _root_.graft.entry.DedupQueries.queries ++
    _root_.graft.entry.SimilarityQueries.queries ++
    _root_.graft.entry.TextQueries.queries ++
    _root_.graft.entry.MultimodalQueries.queries ++
    _root_.graft.entry.CurationQueries.queries

  /** DuckDB oracle SQL per query key, same family split. */
  def oracleSql: Map[String, String] =
    _root_.graft.entry.ChainQueries.oracles ++
    _root_.graft.entry.RelationalQueries.oracles ++
    _root_.graft.entry.AnalyticsQueries.oracles ++
    _root_.graft.entry.DedupQueries.oracles ++
    _root_.graft.entry.SimilarityQueries.oracles ++
    _root_.graft.entry.TextQueries.oracles ++
    _root_.graft.entry.MultimodalQueries.oracles ++
    _root_.graft.entry.CurationQueries.oracles
}
