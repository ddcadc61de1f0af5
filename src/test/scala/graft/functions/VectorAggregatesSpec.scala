package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VectorAggregatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("centroid is the element-wise mean per group, with map-side combine") {
    val df = Seq(
      (0, Seq(1.0f, 2.0f)),
      (0, Seq(3.0f, 4.0f)),
      (1, Seq(10.0f, 20.0f)),
      (1, Seq(30.0f, 40.0f)),
      (1, Seq(50.0f, 60.0f))
    ).toDF("label", "embedding").repartition(4) // force partial buffers + merge
    val rows = df.groupBy("label")
      .agg(VectorAggregates.centroid($"embedding").as("c"))
      .orderBy("label").collect()
    assert(rows(0).getSeq[Double](1) == Seq(2.0, 3.0))
    assert(rows(1).getSeq[Double](1) == Seq(30.0, 40.0))
  }

  test("centroid skips empty groups' empty vectors gracefully") {
    val df = Seq((0, Seq.empty[Float]), (0, Seq(2.0f, 4.0f))).toDF("label", "embedding")
    val rows = df.groupBy("label")
      .agg(VectorAggregates.centroid($"embedding").as("c")).collect()
    assert(rows(0).getSeq[Double](1) == Seq(2.0, 4.0))
  }

  test("centroid works on the embeddings fixture table") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = emb.groupBy("label")
      .agg(VectorAggregates.centroid($"embedding").as("c")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Double](1).length == 64))
  }
}
