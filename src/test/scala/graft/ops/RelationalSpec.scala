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
}
