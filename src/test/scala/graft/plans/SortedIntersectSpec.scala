package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Contract for the native sorted-merge intersection: over sorted,
  * duplicate-free, null-free ARRAY<STRING> inputs it must equal
  * `size(array_intersect(a, b))` — the built-in hash-set semantics
  * the verify stage's correctness is defined by. The gate hashes ride
  * on this equality (jaccard = inter / (na + nb - inter), quantized).
  */
class SortedIntersectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaExpr(a: Seq[String], b: Seq[String]): Long =
    Seq((a, b)).toDF("a", "b")
      .select(call_function("graft_sorted_inter", col("a"), col("b")).as("i"))
      .collect().head.getLong(0)

  test("golden cases") {
    assert(viaExpr(Seq("a", "b", "c"), Seq("b", "c", "d")) == 2L)
    assert(viaExpr(Seq(), Seq("x")) == 0L)
    assert(viaExpr(Seq("x"), Seq()) == 0L)
    assert(viaExpr(Seq("a", "b"), Seq("c", "d")) == 0L)
    assert(viaExpr(Seq("a", "b", "c"), Seq("a", "b", "c")) == 3L)
    // non-ascii: binary UTF8 order, same as array_sort's
    assert(viaExpr(Seq("a", "é", "☃"), Seq("é", "☃")) == 2L)
    assert(viaExpr(Seq("", "a"), Seq("", "b")) == 1L)
  }

  test("differential: equals size(array_intersect) on 500 random sorted distinct arrays") {
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 40).map(i => s"tok$i") ++ Seq("", "é", "☃", "übér")
    def arr() = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size)).distinct.sorted
    val pairs = (1 to 500).map(_ => (arr(), arr()))
    val df = pairs.toDF("a", "b").select(
      call_function("graft_sorted_inter", col("a"), col("b")).as("got"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("want"))
    assert(df.filter(col("got") =!= col("want")).count() == 0)
  }

  test("interpreted eval agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    def lit(xs: Seq[String]) = Literal(
      ArrayData.toArrayData(xs.map(UTF8String.fromString).toArray),
      ArrayType(StringType))
    val e = SortedIntersect(lit(Seq("a", "c", "x")), lit(Seq("c", "x", "z")))
    assert(e.eval(null) == 2L)
    assert(viaExpr(Seq("a", "c", "x"), Seq("c", "x", "z")) == 2L)
  }

  test("scala.Null trailing elements stop the scan instead of matching") {
    // array_sort puts nulls last; the scan must not count or cross them
    val df = Seq(1).toDF("x").select(
      call_function("graft_sorted_inter",
        array(lit("a"), lit("b"), lit(null).cast("string")),
        array(lit("a"), lit(null).cast("string"))).as("i"))
    assert(df.collect().head.getLong(0) == 1L)
  }

  test("verify path stays whole-stage-codegen: no HashAggregate after the pair join") {
    // the shape verifyJaccard builds: pairs joined to per-doc sorted arrays,
    // intersected per row — there must be no aggregate between join and filter
    val toks = Seq(
      (1L, Seq("a", "b", "c", "d"), 4L),
      (2L, Seq("b", "c", "d", "e"), 4L),
      (3L, Seq("x", "y"), 2L)).toDF("doc_id", "toks", "n")
    val sorted = toks.select(col("doc_id"), array_sort(col("toks")).as("ts"), col("n"))
    val cand = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val out = cand
      .join(sorted.select(col("doc_id").as("doc_a"), col("ts").as("ta"), col("n").as("na")), "doc_a")
      .join(sorted.select(col("doc_id").as("doc_b"), col("ts").as("tb"), col("n").as("nb")), "doc_b")
      .withColumn("inter", call_function("graft_sorted_inter", col("ta"), col("tb")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"verify shape must not aggregate:\n$plan")
    val rows = out.select("doc_a", "doc_b", "inter").orderBy("doc_b").collect()
    assert(rows.map(_.getLong(2)).toSeq == Seq(3L, 0L))
  }
}
