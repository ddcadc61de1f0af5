package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-12 scale operators: Bloom-prefiltered join, Misra-Gries heavy
  * hitters, deterministic stratified sampling, 2-D skyline, CDC
  * snapshot diff, k-core peeling.
  */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("bloomFilteredJoin equals the plain join AND the prefilter actually prunes") {
    val fact = (1L to 5000L).map(i => (i % 500, i)).toDF("fk", "payload")
    val dim = (0L to 499L).filter(_ % 50 == 0).map(k => (k, s"d$k")).toDF("dk", "tag")
    val plain = fact.join(dim, col("fk") === col("dk"))
      .select("fk", "payload", "tag").collect().map(_.toString).sorted.toSeq
    val bloomed = Skew.bloomFilteredJoin(fact, dim, "fk", "dk",
        expectedKeys = 1000L, fpp = 0.03)
      .select("fk", "payload", "tag").collect().map(_.toString).sorted.toSeq
    assert(bloomed == plain && plain.size == 100)
    // the pruning claim: fact rows surviving the bloom prefilter are
    // far fewer than the fact table (10 of 500 keys match; fpp 3%)
    val bf = dim.stat.bloomFilter("dk", 1000L, 0.03)
    val survivors = fact.collect().count(r => bf.mightContainLong(r.getLong(0)))
    assert(survivors < 1000, s"bloom let $survivors of 5000 rows through")
  }

  test("heavyHitters is exact vs the naive groupBy on a skewed stream " +
      "split across partitions") {
    // heavy values 1..3 (1200/800/500 rows) over a 4000-value rare
    // tail, shuffled across 8 partitions so per-partition counts are
    // well under the global threshold
    val rows = ((1 to 1200).map(_ => 1L) ++ (1 to 800).map(_ => 2L) ++
      (1 to 500).map(_ => 3L) ++ (1 to 4000).map(i => 100L + i)).zipWithIndex
    val df = rows.toDF("v", "ord").repartition(8, col("ord"))
    val got = Relational.heavyHitters(df, col("v"), minCount = 400L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1200L), (2L, 800L), (3L, 500L)))
  }

  test("stratifiedSample: exact per-stratum size, invariant under repartitioning") {
    val df = (1L to 900L).map(i => (i, s"s${i % 3}")).toDF("id", "grp")
    val a = Relational.stratifiedSample(df, "grp", "id", 7)
      .select("grp", "id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a.groupBy(_._1).view.mapValues(_.size).toMap ==
      Map("s0" -> 7, "s1" -> 7, "s2" -> 7))
    val b = Relational.stratifiedSample(df.repartition(13), "grp", "id", 7)
      .select("grp", "id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a == b, "sample must be a pure function of the data, not its layout")
  }

  test("skyline2D matches the dominance definition, with duplicate and " +
      "equal-coordinate points") {
    val pts = Seq(
      (1.0, 9L), (1.0, 9L), (1.0, 3L), // dup + dominated at same x
      (2.0, 12L), (2.0, 12L),
      (3.0, 12L),                      // dominated by (2.0, 12)
      (3.0, 15L), (5.0, 1L))           // (5.0, 1) dominated by (1.0, 9)
    val df = pts.toDF("x", "y")
    val got = Relational.skyline2D(df, "x", "y")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // brute-force oracle over distinct points
    val d = pts.distinct
    val want = d.filter { case (x, y) =>
      !d.exists { case (qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y) }
    }.sorted
    assert(got == want && want == Seq((1.0, 9L), (2.0, 12L), (3.0, 15L)))
  }

  test("snapshotDiff: insert/update/delete arms, null-safe payload compare, " +
      "unchanged rows dropped") {
    val v1 = Seq((1L, Some("a"), 10.0), (2L, None, 20.0), (3L, Some("c"), 30.0),
      (4L, Some("d"), 40.0)).toDF("k", "s", "m")
    val v2 = Seq((1L, Some("a"), 10.0),          // unchanged → dropped
      (2L, Some("b2"), 20.0),                    // null → value update
      (3L, None, 30.0),                          // value → null update
      (5L, Some("e"), 50.0)).toDF("k", "s", "m") // insert; 4 deleted
    val got = Relational.snapshotDiff(v1, v2, "k")
      .orderBy("k", "change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)), r.getDouble(3))).toSeq
    assert(got == Seq(
      (2L, "update_postimage", Some("b2"), 20.0),
      (2L, "update_preimage", None, 20.0),
      (3L, "update_postimage", None, 30.0),
      (3L, "update_preimage", Some("c"), 30.0),
      (4L, "delete", Some("d"), 40.0),
      (5L, "insert", Some("e"), 50.0)))
  }

  test("incrementalGroupSum folds inserts/deletes/group-moving updates " +
      "to exactly the full recompute") {
    val v1 = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
      .toDF("k", "g", "v")
    // 1 deleted; 2 moves a→b with new value; 5 inserted into a
    val v2 = Seq((2L, "b", 25L), (3L, "b", 30L), (4L, "b", 40L), (5L, "a", 50L))
      .toDF("k", "g", "v")
    val mv0 = v1.groupBy(col("g").as("grp"))
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val got = Relational.incrementalGroupSum(mv0,
        Relational.snapshotDiff(v1, v2, "k"), col("g"), col("v"))
      .orderBy("grp").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val want = v2.groupBy(col("g").as("grp"))
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("grp").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want && want == Seq(("a", 1L, 50L), ("b", 3L, 95L)))
    // a group emptied by the feed disappears instead of lingering at 0
    val v3 = Seq((3L, "b", 30L), (4L, "b", 40L)).toDF("k", "g", "v")
    val gone = Relational.incrementalGroupSum(mv0,
        Relational.snapshotDiff(v1, v3, "k"), col("g"), col("v"))
      .collect().map(_.getString(0)).toSeq
    assert(gone == Seq("b"))
  }

  test("linearTrend recovers a planted exact line per group") {
    // group p: y = 3x + 7 exactly; group q: y = -2x + 100
    val rows = (0L to 50L).map(x => ("p", x, 3 * x + 7)) ++
      (0L to 50L).map(x => ("q", x, -2 * x + 100))
    val got = Relational.linearTrend(rows.toDF("g", "x", "y"),
        col("g"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == Seq(("p", 51L, 3.0, 7.0), ("q", 51L, -2.0, 100.0)))
  }

  test("kCore: triangle core survives, pendant chain peels; the round " +
      "count is honored exactly") {
    // triangle {1,2,3} each deg>=2; chain 3-4-5-6 peels from the tail
    // one round at a time under k=2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val full = GraphOps.kCore(edges, k = 2, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(full == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // one round only: just node 6's pendant edge is gone, so 4 and 5
    // still sit on the residual path 3-4-5 (deg 2,1) — round count is
    // a replayability contract, not a convergence loop
    val one = GraphOps.kCore(edges, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0)).toSeq
    assert(one == Seq(1L, 2L, 3L, 4L))
  }
}
