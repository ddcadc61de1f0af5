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

  /** Drop every cached dataset and persisted RDD in the session. */
  def release(spark: SparkSession): Unit = {
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
