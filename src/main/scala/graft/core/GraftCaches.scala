package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-wide cache reclamation.
  *
  * Two storage populations accumulate across a long-lived session (a
  * 62-query bench pass, or a multi-stage 100 TB pipeline):
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
  *
  * Mid-plan persists register through per-module [[Ledger]]s so a
  * module-scoped release (e.g. `Dedup.releaseCaches()`) can never
  * unpersist ANOTHER pipeline's load-bearing frame (the prefix-sum
  * chunk frame pins `spark_partition_id`s — freeing it mid-flight
  * would recompute them inconsistently).
  */
object GraftCaches {

  /** One module's ledger of frames it persisted mid-plan. */
  final class Ledger private[GraftCaches] () {
    private[GraftCaches] val frames =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

    def persist(df: DataFrame): DataFrame = {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      frames.add(df)
      df
    }

    /** Unpersist every frame THIS module persisted. Call AFTER the
      * terminal action on the pipeline result — freed mid-flight,
      * the plans would silently recompute them.
      */
    def release(): Unit = {
      var df = frames.poll()
      while (df != null) {
        // a frame whose session has been STOPPED (bench isolation
        // mode restarts the context per query) has no storage left to
        // free and its unpersist NPEs against the dead BlockManager —
        // skip it; anything else unexpected must still surface
        if (!df.sparkSession.sparkContext.isStopped)
          df.unpersist(blocking = false)
        df = frames.poll()
      }
    }
  }

  private val ledgers =
    new java.util.concurrent.ConcurrentLinkedQueue[Ledger]()

  def newLedger(): Ledger = {
    val l = new Ledger
    ledgers.add(l)
    l
  }

  /** Unpersist every tracked frame across all module ledgers. */
  def releaseTracked(): Unit = ledgers.forEach(_.release())

  /** Drop every cached dataset and persisted RDD in the session. */
  def release(spark: SparkSession): Unit = {
    releaseTracked()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** True when no persisted RDD remains — dataset caches included,
    * PROVIDED they were materialized (a `persist` whose plan never
    * ran leaves a CacheManager entry with no RDD; [[release]] clears
    * those too, but this check cannot see them). The "storage
    * returned to baseline" assertion of the lifecycle spec.
    */
  def storageEmpty(spark: SparkSession): Boolean =
    spark.sparkContext.getPersistentRDDs.isEmpty
}
