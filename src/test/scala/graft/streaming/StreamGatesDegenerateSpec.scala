package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Degenerate-input discipline for the round-15 MV gates (the
  * islandsGate lesson, unified): an EMPTY input — or a data-derived
  * EMPTY SHARD in the middle of a healthy stream — must never kill the
  * stream. Empty input renders an empty, correctly-typed result (the
  * batch twin also returns 0 rows); an empty micro-batch is skipped
  * and the surviving shards still fold to the exact batch answer.
  * Null dates in trendGate remain a LOUD failure (silent vanishing
  * would diverge from the twin — that require is a correctness guard,
  * not an emptiness guard).
  */
class StreamGatesDegenerateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val t = Tables.load(spark, "/root/testdata/sf0.001")

  test("tpchQ1Gate: empty lineitem completes with 0 rows, exact schema") {
    val out = StreamGates.tpchQ1Gate(t.lineitem.limit(0))
    assert(out.columns.toSeq == Seq("l_returnflag", "l_linestatus",
      "sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
      "avg_qty", "avg_price", "avg_disc", "count_order"))
    assert(out.count() == 0)
  }

  test("vocabGate: empty documents completes with 0 rows, exact schema") {
    val out = StreamGates.vocabGate(t.documents.limit(0), k = 10)
    assert(out.columns.toSeq == Seq("token_id", "token", "cnt"))
    assert(out.count() == 0)
  }

  test("trendGate: empty orders completes with 0 rows; null dates still die loudly") {
    val out = StreamGates.trendGate(t.orders.limit(0))
    assert(out.columns.toSeq ==
      Seq("grp", "n", "slope_micro", "intercept_micro"))
    assert(out.count() == 0)
    val withNull = t.orders.unionByName(
      t.orders.limit(1).withColumn("o_orderdate",
        lit(null).cast("timestamp")))
    val e = intercept[IllegalArgumentException] {
      StreamGates.trendGate(withNull)
    }
    assert(e.getMessage.contains("null dates"))
    // ALL-null dates is non-empty input too: min(date) is null exactly
    // as it is for empty input, but the null COUNT is > 0 — the guard
    // must key on the count, or this silently renders an empty MV
    val allNull = t.orders.limit(5)
      .withColumn("o_orderdate", lit(null).cast("timestamp"))
    val e2 = intercept[IllegalArgumentException] {
      StreamGates.trendGate(allNull)
    }
    assert(e2.getMessage.contains("null dates"))
  }

  /** Keep only the first and last sixths of the key span so the
    * 3-shard range cut leaves the MIDDLE shard empty — the
    * data-derived empty micro-batch the guards must skip. */
  private def gapped(df: DataFrame, key: String): DataFrame = {
    val b = df.agg(min(col(key)).as("lo"), max(col(key)).as("hi")).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val span = hi - lo + 1
    df.filter(col(key) < lo + span / 6 || col(key) >= hi - span / 6)
  }

  test("tpchQ1Gate: an empty middle shard is skipped and the MV still " +
      "equals the one-shot batch aggregate") {
    import graft.ops.Exact.{meanOf, meanOfLong, moneySum}
    val li = gapped(t.lineitem, "l_orderkey")
    val out = StreamGates.tpchQ1Gate(li).collect().map(_.toString).toSeq
    val exp = li
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).as("sum_charge"),
        meanOfLong(col("l_quantity").cast("long")).as("avg_qty"),
        meanOf(col("l_extendedprice")).as("avg_price"),
        meanOf(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toString).toSeq
    assert(out.nonEmpty && out == exp)
  }

  test("vocabGate: an empty middle shard is skipped and the vocabulary " +
      "still equals the one-shot batch build") {
    val docs = gapped(t.documents, "doc_id")
    val out = StreamGates.vocabGate(docs, k = 50)
      .collect().map(_.toString).toSeq
    val exp = graft.ops.CorpusOps.vocabulary(docs, k = 50)
      .collect().map(_.toString).toSeq
    assert(out.nonEmpty && out == exp)
  }
}
