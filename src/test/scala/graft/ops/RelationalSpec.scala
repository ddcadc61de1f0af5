package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Relational ops are gate-covered (DuckDB oracle); this spec holds
  * the properties the SQL gate can't express — here, the sketch-merge
  * identity behind incremental NDV.
  */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("incrementalNdv: union of per-shard sketches estimates like one pass, within bounds") {
    import org.apache.spark.sql.functions._
    val df = spark.range(20000)
      .select((col("id") % 4999).as("l_partkey"),
        (col("id") % 397).as("l_suppkey"),
        col("id").as("l_orderkey"))
    // merge identity: the union of shard sketches gives the SAME
    // estimate as one whole-corpus sketch (DataSketches HLL merge is
    // deterministic) — this is what makes per-shard persistence sound
    val sharded = df.groupBy((col("l_orderkey") % 4).as("shard"))
      .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head.getLong(0)
    val onePass = df
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))")).head.getLong(0)
    assert(sharded == onePass)
    // and the declared report's booleans hold
    val out = Relational.incrementalNdv(df).collect()(0)
    assert(out.getLong(0) == 4999L && out.getLong(1) == 397L)
    assert(out.getBoolean(2) && out.getBoolean(3))
  }

  test("fullOuterActivity: both null arms surface with side indicators (golden)") {
    import spark.implicits._
    val customer = Seq(
      (1L, "BUILDING"), (2L, "BUILDING"), (3L, "MACHINERY")
    ).toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, "F"), (11L, 1L, "F"), (12L, 3L, "F"), (13L, 2L, "O")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val out = Relational.fullOuterActivity(customer, orders).collect()
      .map(r => (r.getLong(0), Option(r.get(2)), r.getString(3))).toSeq
    assert(out == Seq(
      (1L, Some(2L), "both"),          // building + 2 F orders
      (2L, None, "customer_only"),     // building, no F orders
      (3L, Some(1L), "orders_only")),  // F orders, not building
      out.toString)
  }

  test("scd2Intervals: status runs collapse, intervals chain, current row open") {
    import spark.implicits._
    val d = java.sql.Date.valueOf(_: String)
    val orders = Seq(
      (1L, 101L, "O", d("2024-01-01")),
      (1L, 102L, "O", d("2024-02-01")), // same run as 101
      (1L, 103L, "F", d("2024-03-01")), // status change
      (1L, 104L, "O", d("2024-04-01")), // back to O → NEW run
      (2L, 201L, "F", d("2024-01-15"))
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    val out = Relational.scd2Intervals(orders).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getLong(5))).toSeq
    assert(out == Seq(
      (1L, "O", "2024-01-01", Some("2024-03-01"), 2L),
      (1L, "F", "2024-03-01", Some("2024-04-01"), 1L),
      (1L, "O", "2024-04-01", None, 1L),
      (2L, "F", "2024-01-15", None, 1L)), out.toString)
  }

  test("revenueShareByNation: shares from exact integer sums (golden)") {
    import spark.implicits._
    val li = Seq((1L, 10L, 30.0, 0.0), (2L, 20L, 60.0, 0.5))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = Seq((10L, 100L), (20L, 200L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((100L, "ALPHA"), (200L, "BETA")).toDF("n_nationkey", "n_name")
    val out = Relational.revenueShareByNation(li, sup, nat).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    // revenues 30 and 30 → shares exactly 0.5 each
    assert(out == Seq(("ALPHA", 30.0, 0.5), ("BETA", 30.0, 0.5)), out.toString)
  }

  test("modeQuantity: most frequent value per group, deterministic tie-break") {
    import spark.implicits._
    val li = Seq(
      ("A", 7L), ("A", 7L), ("A", 3L),
      ("R", 9L), ("R", 2L)  // tie -> smaller quantity wins
    ).toDF("l_returnflag", "l_quantity")
    val out = Relational.modeQuantity(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("A", 7L, 2L), ("R", 2L, 1L)), out.toString)
  }
}
