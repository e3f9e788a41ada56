package graft

import org.apache.spark.sql.DataFrame

/** Registry for intra-query `persist()` calls (the similarity/langid ops
  * persist small derived tables that feed multiple consumers within ONE
  * query). The persisting op cannot unpersist — the consuming ACTION runs
  * later, in Verify/Bench/a test — so ops register here and the runner calls
  * [[release]] after each query's action completes. Without this, cached
  * blocks from every similarity query accumulate across a 90-query session
  * and bench numbers become hostage to block-manager pressure (a genuine
  * leak in any long-lived deployment).
  */
object Caches {
  private val live = scala.collection.mutable.Buffer.empty[DataFrame]

  /** persist(df) + track it for the next [[release]]. */
  def persist(df: DataFrame): DataFrame = synchronized {
    live += df
    df.persist()
  }

  /** Unpersist everything registered since the last release (async — block
    * eviction needn't gate the next query). */
  def release(): Unit = synchronized {
    live.foreach(_.unpersist(blocking = false))
    live.clear()
  }
}
