package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Fixpoint-loop plumbing shared by the iterative graph operators
  * ([[Curation.dedupClusters]], [[ChainLink.traceDepth]]).
  *
  * A propagation round's plan references the previous round's relation
  * TWICE (once inside the neighbor aggregation, once as the outer join
  * side), so without truncation the logical plan doubles every round —
  * 2^rounds copies of the base plan, which OOMs the driver after ~10
  * rounds regardless of data size. `cache()` does not help: caching
  * shortcuts execution, not plan size.
  *
  * [[round]] eagerly `localCheckpoint`s the round (the plan collapses to a
  * flat scan of materialized blocks) and returns a release handle that
  * unpersists those blocks once the round is superseded —
  * `Dataset.unpersist` cannot do that (checkpoint blocks belong to the
  * underlying RDD, not the CacheManager).
  */
private[operators] object Iterative {

  /** Materialize one fixpoint round: (flattened DataFrame, block release). */
  def round(df: DataFrame): (DataFrame, () => Unit) = roundImpl(df, eager = true)

  /** Lazy variant: the checkpoint is marked but not computed, so the
    * caller's NEXT action over the returned frame (the loops' changed-count
    * aggregate) materializes and pins the blocks in the same job — one job
    * per round instead of materialize-then-count.
    */
  def roundLazy(df: DataFrame): (DataFrame, () => Unit) = roundImpl(df, eager = false)

  private def roundImpl(df: DataFrame, eager: Boolean): (DataFrame, () => Unit) = {
    val ck = df.localCheckpoint(eager)
    val free: () => Unit = ck.queryExecution.analyzed.collectFirst {
      case lr: LogicalRDD => () => { lr.rdd.unpersist(false); () }
    }.getOrElse(() => ())
    (ck, free)
  }
}
