package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Count-min sketch contracts: (1) MERGEABILITY — the sketch of a
  * union is the per-(d,bucket) sum of the shard sketches, which is
  * what makes the operator incrementally maintainable at 100 TB;
  * (2) the estimate is a bounded OVERESTIMATE (est ≥ exact, never
  * under); (3) the heavy-hitter composition only emits grams whose
  * estimate clears the threshold, and finds every truly-heavy
  * sampled gram (overestimates can add rows, never drop one).
  */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = {
    val boiler = "the quick brown fox jumps over the lazy dog"
    (0L until 60L).map { i =>
      val tail = if (i % 3 == 0) "alpha beta gamma delta" else s"unique$i filler$i"
      (i, s"$boiler $tail")
    }.toDF("doc_id", "text")
  }

  private def grams(d: org.apache.spark.sql.DataFrame) = d
    .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
    .filter(size(col("tk")) >= 2)
    .select(col("doc_id"), explode(TextOps.kgrams(col("tk"), 2)).as("gram"))

  test("sketches of disjoint shards sum to the sketch of the union") {
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 === 1)
    val merged = CorpusOps.mergeCmsSketches(
      CorpusOps.cmsSketch(grams(a), "gram"),
      CorpusOps.cmsSketch(grams(b), "gram"))
    val full = CorpusOps.cmsSketch(grams(docs), "gram")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("merge through a persisted round trip: daily-shard estimates stay exact") {
    val dir = java.nio.file.Files.createTempDirectory("cms").toString
    val day1 = docs.filter(col("doc_id") < 30)
    val day2 = docs.filter(col("doc_id") >= 30)
    CorpusOps.cmsSketch(grams(day1), "gram").write.parquet(s"$dir/sketch")
    val folded = CorpusOps.mergeCmsSketches(
      spark.read.parquet(s"$dir/sketch"),
      CorpusOps.cmsSketch(grams(day2), "gram"))
    val keys = grams(docs).select("gram").distinct()
    val viaFold = CorpusOps.cmsEstimate(folded, keys, "gram")
    val viaFull = CorpusOps.cmsEstimate(CorpusOps.cmsSketch(grams(docs), "gram"), keys, "gram")
    assert(viaFold.exceptAll(viaFull).isEmpty && viaFull.exceptAll(viaFold).isEmpty)
  }

  test("estimate is an overestimate: est >= exact for every occurring gram") {
    val g = grams(docs)
    val sketch = CorpusOps.cmsSketch(g, "gram")
    val exact = g.groupBy("gram").agg(count(lit(1)).as("exact"))
    val est = CorpusOps.cmsEstimate(sketch, g.select("gram").distinct(), "gram")
    val joined = est.join(exact, "gram")
    assert(joined.filter(col("est") < col("exact")).count() == 0)
    // and with width >> types, most estimates are exact
    assert(joined.filter(col("est") === col("exact")).count() > 0)
  }

  test("heavy hitters: threshold respected, truly-heavy sampled grams never dropped") {
    val hh = CorpusOps.cmsHeavyHitters(docs, threshold = 30L, sampleMod = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hh.nonEmpty && hh.forall(_._2 >= 30L))
    // truly heavy AND sampled grams must all appear
    val g = grams(docs)
    val heavySampled = g.groupBy("gram").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 30)
      .join(grams(docs.filter(col("doc_id") % 3 === 0)).select("gram").distinct(), "gram")
      .select("gram").collect().map(_.getString(0)).toSet
    assert(heavySampled.subsetOf(hh.map(_._1).toSet))
  }
}
