package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Round15OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("columnStats: SQL-standard equi-depth split (first n mod k " +
      "buckets one deeper), exact NDV and bounds per bucket") {
    // 10 rows, k=4 -> depths 3,3,2,2 over ascending v
    val df = Seq(5L, 5L, 5L, 10L, 10L, 20L, 30L, 30L, 40L, 50L)
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val got = Relational.columnStats(df, col("v"), col("id"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.map(_._2).toSeq == Seq(3L, 3L, 2L, 2L), s"depths: ${got.toSeq}")
    // bucket 1 = three 5s: ndv 1, bounds [5,5]; bucket 2 = 10,10,20
    assert(got(0) == ((1L, 3L, 1L, 5L, 5L)))
    assert(got(1) == ((2L, 3L, 2L, 10L, 20L)))
    // bucket 3 = 30,30; bucket 4 = 40,50
    assert(got(2) == ((3L, 2L, 1L, 30L, 30L)))
    assert(got(3) == ((4L, 2L, 2L, 40L, 50L)))
    // the fact table must not globally sort: the only Sort allowed
    // below the final orderBy is window-local over histogram/tie rows
    val plan = Relational.columnStats(df, col("v"), col("id"), k = 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("Window"), "expected the histogram windows")
  }

  test("rollingMedianInt: lower median over partial and full windows, " +
      "outlier-resistant where the mean is not") {
    val s = Seq(("a", 1L, 10L), ("a", 2L, 12L), ("a", 3L, 1000L),
      ("a", 4L, 11L), ("a", 5L, 13L)).toDF("g", "t", "x")
    val got = Relational.rollingMedianInt(s, col("g"), col("t"), col("x"),
      window = 3).collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // t=1: [10] -> 10; t=2: [10,12] lower median -> 10
    assert(got(1L) == 10L && got(2L) == 10L)
    // t=3: [10,12,1000] -> 12 (the outlier does not drag the median)
    assert(got(3L) == 12L)
    // t=4: [12,1000,11] sorted [11,12,1000] -> 12; t=5: [1000,11,13] -> 13
    assert(got(4L) == 12L && got(5L) == 13L)
  }

  test("linearTrendInt: exact micro slope/intercept, negative slopes " +
      "truncate toward zero like the twin, degenerate groups NULL") {
    // y = 3t + 10 exactly: slope 3e6, intercept 1e7
    val s = Seq(("a", 0L, 10L), ("a", 1L, 13L), ("a", 2L, 16L),
      // falling series: y = -2t + 100
      ("b", 0L, 100L), ("b", 1L, 98L), ("b", 2L, 96L),
      // single point: variance 0 -> NULL
      ("c", 5L, 7L)).toDF("g", "t", "x")
    val got = Relational.linearTrendInt(s, col("g"), col("t"), col("x"))
      .collect()
    val m = got.map(r => r.getString(0) ->
      ((if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(m("a") == ((Some(3000000L), Some(10000000L))))
    assert(m("b") == ((Some(-2000000L), Some(100000000L))))
    assert(m("c") == ((None, None)))
  }

  test("theilSenInt: median pairwise slope shrugs off an outlier that " +
      "drags OLS; lower-median rank, trunc-toward-zero parity") {
    // y = 2t except t=4 spikes to 1000: OLS slope is wrecked, the
    // median pairwise slope stays 2e6 micro
    val s = Seq(("a", 0L, 0L), ("a", 1L, 2L), ("a", 2L, 4L),
      ("a", 3L, 6L), ("a", 4L, 1000L)).toDF("g", "t", "x")
    val ts = Relational.theilSenInt(s, col("g"), col("t"), col("x"))
      .collect()(0)
    assert(ts.getLong(1) == 10L, "C(5,2) pairs")
    assert(ts.getLong(2) == 2000000L, s"robust slope, got $ts")
    val ols = Relational.linearTrendInt(s, col("g"), col("t"), col("x"))
      .collect()(0)
    assert(ols.getLong(2) > 100000000L, "OLS must be dragged by the spike")
  }

  test("ppsSystematic: exactly k draws, heavy rows drawn with " +
      "multiplicity, deterministic under repartitioning") {
    // weights 1,1,8,1,1 -> W=12, k=4 grid = floor(12(2j+1)/8) = 1,4,7,10
    // layout: id1 [0,1) id2 [1,2) id3 [2,10) id4 [10,11) id5 [11,12)
    val df = Seq((1L, 1L), (2L, 1L), (3L, 8L), (4L, 1L), (5L, 1L))
      .toDF("id", "w")
    val got = CorpusOps.ppsSystematic(df, col("id"), col("w"), k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)),
      s"got ${got.toSeq}")
    val again = CorpusOps.ppsSystematic(df.repartition(7), col("id"),
      col("w"), k = 4).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSeq == got.toSeq)
  }

  test("hardNegatives: band filter applies BEFORE the per-anchor rank " +
      "and the near-dup ceiling excludes high-cosine candidates") {
    // 4-dim toy corpus, every vector in one LSH bucket-reachable set:
    // anchor q=(1,0,0,0); candidates: near-dup (0.999..), in-band
    // (~0.6), in-band (~0.3), out-of-band low (~0.05)
    def row(id: Long, v: Seq[Double]) = (id, v)
    val emb = Seq(
      row(0L, Seq(1.0, 0.0, 0.0, 0.0)),
      row(1L, Seq(0.999, 0.01, 0.0, 0.0)),
      row(2L, Seq(0.6, 0.8, 0.0, 0.0)),
      row(3L, Seq(0.3, 0.954, 0.0, 0.0)),
      row(4L, Seq(0.05, 0.999, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val got = Similarity.hardNegatives(emb, nQueries = 1, k = 5,
      lo = 0.1, hi = 0.9, bits = 2, dim = 4).collect()
      .map(r => (r.getLong(2), r.getLong(1)))
    val ids = got.map(_._1).toSet
    assert(!ids.contains(1L), "near-dup above the ceiling must be excluded")
    assert(!ids.contains(4L), "below-floor candidate must be excluded")
    // the two in-band vectors rank by cosine desc IF bucket-reachable;
    // with 2 hyperplanes all-positive-x vectors share buckets or a
    // hamming-1 probe, so both must appear
    assert(ids == Set(2L, 3L), s"got $ids")
    assert(got.toMap.apply(2L) == 1L, "higher cosine ranks first")
  }
}
