package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Golden contract for the native minhash-signature expression: its
  * values must be BIT-IDENTICAL to the composed-SQL definition it
  * replaced (explode → conv(substring(md5(tok),1,15),16,10) % p →
  * min((a·h+b) % p) per coefficient), because the DuckDB gate twins
  * still compute signatures that way.
  */
class MinHashSigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 16
  private val p = MinHashSig.P

  /** The pre-round-7 aggregate-form signature — the reference
    * semantics the expression must reproduce exactly.
    */
  private def aggregateForm(docs: org.apache.spark.sql.DataFrame) = {
    val sigCols = MinHashSig.coefficients(k).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("hb") + lit(b)) % p).as(s"h$i")
    }
    docs.select(col("doc_id"), explode(col("toks")).as("tok"))
      .withColumn("hb", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % p)
      .groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  private def exprForm(docs: org.apache.spark.sql.DataFrame) =
    docs.filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        call_function("graft_minhash_sig", col("toks"), lit(k), lit(7L)).as("_sig"))
      .select(col("doc_id") +:
        (0 until k).map(i => element_at(col("_sig"), i + 1).as(s"h$i")): _*)

  private lazy val docs = Seq(
    (1L, Seq("the", "quick", "brown", "fox")),
    (2L, Seq("pack", "my", "box", "with", "five", "dozen", "liquor", "jugs")),
    (3L, Seq("single")),
    (4L, (1 to 200).map(i => s"tok$i")), // wide array: exercises the loop
    (5L, Seq("unicode: übérmensch", "emoji ☃", "")) // non-ascii + empty string
  ).toDF("doc_id", "toks")

  test("expression matches the composed md5+affine aggregate bit-for-bit") {
    val want = aggregateForm(docs).orderBy("doc_id").collect()
    val got = exprForm(docs).orderBy("doc_id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("interpreted eval agrees with codegen") {
    // force the interpreted path by eval'ing the expression directly
    val toksArr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("alpha", "beta", "gamma").map(
        org.apache.spark.unsafe.types.UTF8String.fromString))
    val e = MinHashSig(
      org.apache.spark.sql.catalyst.expressions.Literal(
        toksArr, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)), k, 7L)
    val interp = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    val viaDf = exprForm(Seq((1L, Seq("alpha", "beta", "gamma"))).toDF("doc_id", "toks"))
      .collect().head
    assert((0 until k).map(i => viaDf.getLong(i + 1)) == interp)
  }

  test("empty and all-null token arrays yield NULL (the aggregate form emitted no row)") {
    val weird = Seq((1L, Seq.empty[String])).toDF("doc_id", "toks")
      .unionByName(Seq((2L, Seq[String](null, null))).toDF("doc_id", "toks"))
    val out = weird
      .select(col("doc_id"),
        call_function("graft_minhash_sig", col("toks"), lit(k), lit(7L)).as("s"))
      .orderBy("doc_id").collect()
    assert(out(0).isNullAt(1) && out(1).isNullAt(1))
  }

  test("null tokens are skipped, not poisoning the signature") {
    val mixed = Seq((1L, Seq[String]("alpha", null, "beta"))).toDF("doc_id", "toks")
    val clean = Seq((1L, Seq("alpha", "beta"))).toDF("doc_id", "toks")
    val a = exprForm(mixed).collect().head
    val b = exprForm(clean).collect().head
    assert((0 until k).forall(i => a.getLong(i + 1) == b.getLong(i + 1)))
  }

  test("signature stage is a narrow projection: no aggregate in the plan") {
    val plan = exprForm(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"signature plan should not aggregate:\n$plan")
    assert(!plan.contains("Exchange"), s"signature plan should not shuffle:\n$plan")
  }
}
