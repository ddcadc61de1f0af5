package graft.analytics

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** The three-way equality contract's first leg, asserted directly:
  * for every TPC-H query, the SQL-TEXT rendering (TpchSql, `spark.sql`
  * over registered views) must equal the DataFrame body (TpchSuite)
  * row for row, column for column, at sf0.001. The second and third
  * legs (DataFrame ≡ DuckDB oracle ≡ SQL-text) are the per-round
  * driver gates q64–q85 / q88–q109, which share one twin verbatim.
  */
class TpchSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val t = Tables.load(spark, "/root/testdata/sf0.001")

  private def dfBody(i: Int): DataFrame = i match {
    case 1  => TpchSuite.q01(t); case 2  => TpchSuite.q02(t)
    case 3  => TpchSuite.q03(t); case 4  => TpchSuite.q04(t)
    case 5  => TpchSuite.q05(t); case 6  => TpchSuite.q06(t)
    case 7  => TpchSuite.q07(t); case 8  => TpchSuite.q08(t)
    case 9  => TpchSuite.q09(t); case 10 => TpchSuite.q10(t)
    case 11 => TpchSuite.q11(t); case 12 => TpchSuite.q12(t)
    case 13 => TpchSuite.q13(t); case 14 => TpchSuite.q14(t)
    case 15 => TpchSuite.q15(t); case 16 => TpchSuite.q16(t)
    case 17 => TpchSuite.q17(t); case 18 => TpchSuite.q18(t)
    case 19 => TpchSuite.q19(t); case 20 => TpchSuite.q20(t)
    case 21 => TpchSuite.q21(t); case 22 => TpchSuite.q22(t)
  }

  (1 to 22).foreach { i =>
    test(f"tpch$i%02d: SQL text equals the DataFrame body, value for value") {
      val sqlOut = TpchSql.run(spark, t, i)
      val dfOut = dfBody(i)
      assert(sqlOut.columns.toSeq == dfOut.columns.toSeq,
        "column names must match")
      assert(sqlOut.schema.map(_.dataType) == dfOut.schema.map(_.dataType),
        s"column types must match: ${sqlOut.schema} vs ${dfOut.schema}")
      // ties inside each query's ORDER BY are engine-free here (both
      // are Spark), but sort row strings anyway so the assert never
      // depends on tie order
      val a = sqlOut.collect().map(_.toString).sorted.toSeq
      val b = dfOut.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"tpch$i: SQL-text rows diverge from DataFrame rows")
    }
  }

  test("the SQL-text path earns the same physical plan: Q5's six-table " +
      "star is all broadcast joins with filters pushed to the scans") {
    val plan = TpchSql.run(spark, t, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "a dim join fell back to sort-merge on the SQL-text path")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      s"expected a broadcast star, got:\n$plan")
    val fmt = TpchSql.run(spark, t, 5).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(fmt.contains("EqualTo(r_name,ASIA)"),
      "the region filter must reach the parquet scan (PushedFilters)")
  }

  test("partsupp materializes ONCE per (session, dir): memoized instance, " +
      "persisted, and suite consumers probe the in-memory relation") {
    val a = TpchSuite.partsupp(t)
    val b = TpchSuite.partsupp(Tables.load(spark, "/root/testdata/sf0.001"))
    assert(a eq b, "two Tables on the same (session, dir) must share one frame")
    assert(a.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "partsupp must be persisted")
    a.count() // materialize the cache before reading consumer plans
    // every partsupp consumer's analyzed-with-cache plan probes the
    // InMemoryRelation — ONE lineitem aggregate per suite run, not one
    // per consumer (q02 references it twice inside its own plan)
    Seq(TpchSuite.q02(t), TpchSuite.q09(t), TpchSuite.q11(t),
      TpchSuite.q16(t), TpchSuite.q20(t)).zip(Seq(2, 9, 11, 16, 20))
      .foreach { case (q, i) =>
        assert(q.queryExecution.withCachedData.toString
          .contains("InMemoryRelation"), s"q$i must probe the cache")
      }
    // after an external clearCache (the verify loop's between-query
    // release) the next consumer re-persists instead of silently
    // losing the materialization
    spark.catalog.clearCache()
    val c = TpchSuite.partsupp(t)
    assert(c.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "partsupp must re-persist after an external clearCache")
  }
}
