package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Golden values for the portability quantization contract. */
class ExactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("v")).collect()(0).get(0)
  }

  test("quant is floor(x*s+0.5)/s — half-up ties in pure IEEE") {
    import org.apache.spark.sql.functions.lit
    assert(one(Exact.quant2(lit(1.005))) == 1.0)   // 1.005 is really 1.00499…; binary-true rounding, NOT BigDecimal's 1.01
    // 2.675 stores as 2.67499…982, but ×100 rounds UP to exactly 267.5
    // (within half-ulp) → 2.68. The point is not which way it goes —
    // it's that both engines do the identical IEEE mult and agree.
    assert(one(Exact.quant2(lit(2.675))) == 2.68)
    assert(one(Exact.quant2(lit(1.455))) == 1.46)  // 1.45500000…1 rounds up
    assert(one(Exact.quant4(lit(0.123456))) == 0.1235)
    assert(one(Exact.quant6(lit(-0.0000004))) == 0.0)
  }

  test("moneySum is order-independent and matches the decimal-exact sum") {
    import spark.implicits._
    // adversarial addends: pure-double summation would drift by order
    val xs = Seq(0.1, 0.2, 0.3, 1e10, -1e10, 0.00005, 123.456789)
    val expected = {
      val q = xs.map(x => math.floor(x * 10000.0 + 0.5).toLong)
      math.floor(q.sum.toDouble / 10000.0 * 100.0 + 0.5) / 100.0
    }
    for (seed <- 1 to 5) {
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      val got = shuffled.toDF("x")
        .repartition(4) // force parallel partial aggregation
        .agg(Exact.moneySum(org.apache.spark.sql.functions.col("x")).as("s"))
        .collect()(0).getDouble(0)
      assert(got == expected, s"seed $seed")
    }
  }

  test("meanOf counts all rows (count(*) semantics)") {
    import spark.implicits._
    val got = Seq(1.0, 2.0, 4.0).toDF("x")
      .agg(Exact.meanOf(org.apache.spark.sql.functions.col("x")).as("m"))
      .collect()(0).getDouble(0)
    assert(got == math.floor(7.0 / 3.0 * 10000.0 + 0.5) / 10000.0)
  }
}
