package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** CATALOG front door for the engine's manifested bucketed lake
  * tables: a SQL user writes `SELECT … FROM graft_lake.<table>` and
  * gets the MERGE-ON-READ view of the live snapshot — lazily, as a
  * plain logical subtree, so Catalyst still prunes columns and pushes
  * filters into the parquet scan (nothing is materialized up front;
  * contrast the round-16 gate shape, which `localCheckpoint`ed the
  * whole merged table before the text query ran).
  *
  * Resolution contract:
  *  - `graft_lake.<t>`        → latest committed manifest of `<t>`,
  *    latest-wins merged on the table's BUCKET columns (merge keys
  *    ARE the bucket columns — `commitBucketed` buckets by the key
  *    so delta commits co-locate with the rows they supersede).
  *  - `graft_lake.<t>__v<N>`  → TIME TRAVEL: the same merged view at
  *    manifest version N, straight from SQL text.
  *  - `graft_lake.<t>__history` → DESCRIBE HISTORY: one row per
  *    committed manifest version with its live commit list (pure
  *    metadata — no data scan).
  *
  * The manifest is resolved at ANALYSIS time, so a query is
  * snapshot-consistent: commits that land between analysis and
  * execution are invisible to it, and two references to the same
  * table inside one statement see the same version. This is an
  * injected resolution rule (the `SparkSessionExtensions` extension
  * point GraftExtensions already owns) rather than a DSv2
  * `TableCatalog`: merge-on-read needs a per-key window over commit
  * versions, which is a logical-plan rewrite — exactly what a
  * resolution rule is for — not a file-scan shape a DSv2 `Scan`
  * could return.
  *
  * Built-in resolution runs in the same fixed-point batch and never
  * claims these names (no real catalog is named graft_lake), so the
  * rule only ever sees relations nothing else could resolve.
  */
case class LakeRelationRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import LakeRelationRule._

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation
          if u.multipartIdentifier.size == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase(CatalogName) &&
            !u.isStreaming =>
        val name = u.multipartIdentifier(1)
        val (tbl, version, history) = name match {
          case HistorySuffix(t)    => (t, 0, true)
          case VersionSuffix(t, v) => (t, v.toInt, false)
          case _                   => (name, 0, false)
        }
        val ident = TableIdentifier(tbl)
        if (!spark.sessionState.catalog.tableExists(ident))
          throw new IllegalArgumentException(
            s"graft_lake: no lake table named $tbl")
        if (history)
          SubqueryAlias(name,
            graft.sinks.LakeWriter.tableHistory(spark, tbl)
              .queryExecution.analyzed)
        else {
          val keys = spark.sessionState.catalog.getTableMetadata(ident)
            .bucketSpec.map(_.bucketColumnNames)
            .getOrElse(throw new IllegalArgumentException(
              s"graft_lake.$tbl: not a bucketed lake table — merge keys " +
                "are the bucket columns, and this table has no bucket spec"))
          SubqueryAlias(tbl,
            graft.sinks.LakeWriter
              .readBucketedTableMerged(spark, tbl, keys, version)
              .queryExecution.analyzed)
        }
    }
}

object LakeRelationRule {
  /** The pseudo-catalog name SQL text addresses lake tables under. */
  val CatalogName = "graft_lake"
  private val VersionSuffix = "(.+)__v(\\d+)".r
  private val HistorySuffix = "(.+)__history".r
}
