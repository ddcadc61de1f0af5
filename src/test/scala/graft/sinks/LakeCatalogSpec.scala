package graft.sinks

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** The graft_lake SQL catalog door (LakeRelationRule): SQL text over
  * `graft_lake.<table>` must equal the programmatic merge-on-read
  * path, stay LAZY (pruning and pushdown reach the parquet scan — no
  * up-front materialization), time-travel via the `__v<N>` suffix,
  * and be snapshot-consistent against commits racing the query.
  */
class LakeCatalogSpec extends AnyFunSuite {
  private val spark = graft.TestSpark.spark
  import spark.implicits._

  private def freshTable(name: String): LakeWriter = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    new LakeWriter(Files.createTempDirectory("lakecat").toString)
  }

  test("SQL text over graft_lake.<t> equals readBucketedTableMerged, " +
      "and __v1 time-travels to the pre-delta snapshot") {
    val lw = freshTable("lakecat_t")
    try {
      val base = (1L to 500L).map(k => (k, k * 10L)).toDF("k", "cents")
      lw.commitBucketed(base, "lakecat_t", 8, Seq("k"), replace = true)
      lw.commitBucketed(
        base.filter($"k" % 10 === 3).withColumn("cents", $"cents" + 1L),
        "lakecat_t", 8, Seq("k"))

      val viaSql = spark.sql(
        "SELECT k, cents FROM graft_lake.lakecat_t ORDER BY k").collect()
      val viaApi = LakeWriter
        .readBucketedTableMerged(spark, "lakecat_t", Seq("k"))
        .select("k", "cents").orderBy("k").collect()
      assert(viaSql.toSeq == viaApi.toSeq)
      assert(viaSql.count(r => r.getLong(1) % 10 === 1L) == 50,
        "the delta commit's +1 rows must win for every k ≡ 3 (mod 10)")

      val v1 = spark.sql(
        "SELECT k, cents FROM graft_lake.lakecat_t__v1 ORDER BY k").collect()
      assert(v1.toSeq == base.orderBy("k").collect().toSeq,
        "__v1 must read the pre-delta snapshot")

      val hist = spark.sql("SELECT version, n_live, live_commits FROM " +
        "graft_lake.lakecat_t__history ORDER BY version").collect()
      assert(hist.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSeq == Seq((1L, 1L, "1"), (2L, 2L, "1,2")),
        s"__history must list both manifests: ${hist.mkString(", ")}")
    } finally spark.sql("DROP TABLE IF EXISTS lakecat_t")
  }

  test("the door is LAZY: column pruning and key-filter pushdown reach " +
      "the parquet scan; no checkpoint/LocalRelation materialization") {
    val lw = freshTable("lakecat_lazy")
    try {
      val base = (1L to 500L).map(k => (k, k * 10L, s"pad$k"))
        .toDF("k", "cents", "pad")
      lw.commitBucketed(base, "lakecat_lazy", 8, Seq("k"), replace = true)
      lw.commitBucketed(
        base.filter($"k" % 100 === 0).withColumn("cents", lit(0L)),
        "lakecat_lazy", 8, Seq("k"))

      val df = spark.sql(
        "SELECT cents FROM graft_lake.lakecat_lazy WHERE k = 7")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("FileScan parquet"),
        s"merged view must plan as a file scan, got:\n$plan")
      assert(plan.contains("EqualTo(k,7)"),
        s"key filter must push into the scan:\n$plan")
      assert(plan.contains("ReadSchema: struct<k:bigint,cents:bigint>"),
        s"column pruning must drop 'pad' from the scan:\n$plan")
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"the key equality must prune to a single bucket:\n$plan")
      assert(!plan.contains("LocalTableScan") && !plan.contains("Scan ExistingRDD"),
        s"nothing may be pre-materialized:\n$plan")
      assert(df.collect().map(_.getLong(0)).toSeq == Seq(70L))
    } finally spark.sql("DROP TABLE IF EXISTS lakecat_lazy")
  }

  test("snapshot consistency: a commit landing after analysis is " +
      "invisible to the already-analyzed query") {
    val lw = freshTable("lakecat_snap")
    try {
      val base = (1L to 100L).map(k => (k, 1L)).toDF("k", "n")
      lw.commitBucketed(base, "lakecat_snap", 4, Seq("k"), replace = true)
      val pinned = spark.sql(
        "SELECT CAST(sum(n) AS BIGINT) AS total FROM graft_lake.lakecat_snap")
      pinned.queryExecution.analyzed // force analysis now
      lw.commitBucketed(base.withColumn("n", lit(100L)),
        "lakecat_snap", 4, Seq("k"))
      assert(pinned.head().getLong(0) == 100L,
        "the pre-commit analysis must keep reading manifest v1")
      assert(spark.sql(
        "SELECT CAST(sum(n) AS BIGINT) AS total FROM graft_lake.lakecat_snap")
        .head().getLong(0) == 100L * 100L,
        "a fresh statement must see the new commit")
    } finally spark.sql("DROP TABLE IF EXISTS lakecat_snap")
  }

  test("unknown and unbucketed tables fail loudly with the catalog name") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_lake.lakecat_missing").collect()
    }
    assert(e.getMessage.contains("graft_lake"), e.getMessage)
  }
}
