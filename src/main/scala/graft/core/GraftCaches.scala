package graft.core

import org.apache.spark.sql.SparkSession

/** Session-wide cache reclamation.
  *
  * Two storage populations accumulate across a long-lived session (a
  * 53-query bench pass, or a multi-stage 100 TB pipeline):
  *
  *  1. `Dataset.persist` entries — registered in the session's
  *     CacheManager, released by `spark.catalog.clearCache()`;
  *  2. `localCheckpoint` RDDs (the dedup-cluster iteration frames) —
  *     RDD-level persistence the CacheManager never sees, released
  *     only via `RDD.unpersist`.
  *
  * [[release]] drains both, returning executor storage memory to
  * baseline. Call it BETWEEN pipelines, never inside one: any
  * DataFrame whose plan still references a freed localCheckpoint RDD
  * cannot be recomputed (that is the point of a checkpoint — lineage
  * is cut).
  */
object GraftCaches {

  /** Ledger of frames pipelines persisted mid-plan (dedup canonical
    * sets, prefix-sum chunk frames), so a long-lived pipeline can
    * release them between stages without nuking unrelated caches.
    */
  private val tracked =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.DataFrame]()

  def persistTracked(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    tracked.add(df)
    df
  }

  /** Unpersist every tracked frame. Call AFTER the terminal action on
    * the pipeline result — freed mid-flight, the plans would silently
    * recompute them.
    */
  def releaseTracked(): Unit = {
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = tracked.poll()
    }
  }

  /** Drop every cached dataset and persisted RDD in the session. */
  def release(spark: SparkSession): Unit = {
    releaseTracked()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** True when no dataset cache and no persisted RDD remains — the
    * "storage returned to baseline" assertion of the lifecycle spec.
    */
  def storageEmpty(spark: SparkSession): Boolean =
    spark.sparkContext.getPersistentRDDs.isEmpty
}
