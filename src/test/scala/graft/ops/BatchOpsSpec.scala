package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-12 second wave: latest-row-per-key compaction, FK orphan
  * audit, weighted median, join-cardinality profile, equi-width
  * histogram, multi-source BFS.
  */
class BatchOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("latestRows keeps the max-seq version per key and never plans a Window") {
    // key 1: three out-of-order versions; key 2: one; key 3: two
    val versions = Seq(
      (1L, 2L, "v2", 20.0), (1L, 0L, "v0", 0.0), (1L, 1L, "v1", 10.0),
      (2L, 5L, "only", 1.0),
      (3L, 7L, "new", 2.0), (3L, 3L, "old", 9.0)
    ).toDF("k", "seq", "tag", "x")
    val got = Relational.latestRows(versions, "k", "seq")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSeq
    assert(got == Seq((1L, 2L, "v2", 20.0), (2L, 5L, "only", 1.0), (3L, 7L, "new", 2.0)))
    // the scale claim: ONE aggregate, no window sort of every version
    val plan = Relational.latestRows(versions, "k", "seq")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"latestRows planned a window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("fkOrphanReport counts planted orphans; a clean FK reports zeros") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((1L, "a"), (1L, "b"), (2L, "c"), (9L, "x"), (9L, "y"), (8L, "z"))
      .toDF("fk", "payload")
    val got = Relational.fkOrphanReport(Seq(
        ("dirty", child, "fk", parent, "pk"),
        ("clean", child.filter(col("fk") <= 3), "fk", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
    // ordered by fk_name: clean first
    assert(got == Seq(
      ("clean", 3L, 0L, 0L, -1L),
      ("dirty", 6L, 3L, 2L, 8L)))
  }

  test("weightedMedian: hand-checked halves, including the exact-boundary tie") {
    // group g: values 1(w3), 2(w1), 3(w4) — total 8, cum(1)=3, cum(2)=4,
    // 2*4 >= 8 exactly -> median 2 (lower weighted median)
    // group h: single value
    val rows = Seq(("g", 1L, 3L), ("g", 2L, 1L), ("g", 3L, 4L), ("h", 9L, 5L))
      .toDF("grp", "v", "w")
    val got = Relational.weightedMedian(rows, col("grp"), col("v"), col("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("g", 2L, 8L), ("h", 9L, 5L)))
  }

  test("joinCardinality predicts exactly what the join produces") {
    val l = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val r = Seq(1L, 1L, 2L, 4L).toDF("j")
    val got = Relational.joinCardinality(Seq(("lr", l, col("k"), r, col("j"))))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3))).head
    val actual = l.join(r, col("k") === col("j")).count()
    assert(got == (("lr", 5L, 4L, actual)) && actual == 7L)
    // disjoint keys -> est 0, not null
    val none = Relational.joinCardinality(
      Seq(("none", l, col("k"), Seq(99L).toDF("j"), col("j"))))
      .collect().head.getLong(3)
    assert(none == 0L)
  }

  test("histogramInt: max value lands in the last bin; constant column is one bin") {
    val vals = (0L to 100L).toDF("v")
    val got = Relational.histogramInt(vals, col("v"), bins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // width = ceil(101/10) = 11 -> bins 0..9, bin 9 covers [99, 109] with 2 rows
    assert(got.size == 10 && got.head == ((0L, 0L, 10L, 11L)) &&
      got.last == ((9L, 99L, 109L, 2L)))
    assert(got.map(_._4).sum == 101L)
    val const = Relational.histogramInt(Seq(5L, 5L, 5L).toDF("v"), col("v"), bins = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(const == Seq((0L, 3L)))
  }

  test("reconciliationReport: identical tables emit NOTHING; each planted " +
      "drift kind localizes to its bucket") {
    val src = (1L to 200L).map(k => (k, k * 10)).toDF("k", "v")
    assert(Relational.reconciliationReport(src, src, col("k"), col("v"), 16).isEmpty)
    // drop key 33 (bucket 1), corrupt key 40's value (bucket 8),
    // duplicate key 50 (bucket 2)
    val dst = src.filter(col("k") =!= 33)
      .withColumn("v", when(col("k") === 40, col("v") + 1).otherwise(col("v")))
      .unionByName(src.filter(col("k") === 50))
    val got = Relational.reconciliationReport(src, dst, col("k"), col("v"), 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 8L))
    // bucket 1 lost a row, bucket 2 gained one, bucket 8 counts agree
    // (the value checksum alone catches the corruption)
    assert(got == Seq((1L, 13L, 12L), (2L, 13L, 14L), (8L, 13L, 13L)))
  }

  test("nearestNeighbor: min distance with min-id tiebreak; isolated points absent") {
    // 1@(0,0) and 2@(1,1): mutual NN at dist 1; 3@(3,3) has both at
    // dist 2 (tie on dist against nothing) -> nearest is 2 at dist 2;
    // 4@(100,100) isolated
    val pts = Seq((1L, 0L, 0L), (2L, 1L, 1L), (3L, 3L, 3L), (4L, 100L, 100L))
      .toDF("id", "x", "y")
    val got = GeoOps.nearestNeighbor(pts, d = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 2L, 2L)))
    // tiebreak: 5@(5,3) sits at dist 2 from BOTH 3 and 7@(7,3) -> min id 3
    val tie = pts.unionByName(Seq((5L, 5L, 3L), (7L, 7L, 3L)).toDF("id", "x", "y"))
    val nn5 = GeoOps.nearestNeighbor(tie, d = 4)
      .filter(col("id") === 5).collect().head
    assert(nn5.getLong(1) == 3L && nn5.getLong(2) == 2L)
  }

  test("itemItemRecs: hand-checked cosine ranks, both directions served") {
    // baskets: {A,B} x3, {A,C} x1 -> co(A,B)=3, co(A,C)=1;
    // supports A=4, B=3, C=1
    val rows = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (3L, "A"), (3L, "B"),
      (4L, "A"), (4L, "C")
    ).toDF("bk", "it")
    val got = Relational.itemItemRecs(rows, "bk", "it", minSupport = 1L, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    // sim(A,B) = 3/sqrt(12) = 0.866025; sim(A,C) = 1/sqrt(4) = 0.5
    assert(got == Seq(
      ("A", 1L, "B", 3L, 0.866025), ("A", 2L, "C", 1L, 0.5),
      ("B", 1L, "A", 3L, 0.866025),
      ("C", 1L, "A", 1L, 0.5)))
  }

  test("bfsLevels: shortest hops from multiple sources, round-bounded frontier") {
    // path 1-2-3-4-5 plus source 10 touching 4: dists from {1, 10}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 4L))
      .toDF("src", "dst")
    val sources = Seq(1L, 10L).toDF("id")
    val got = GraphOps.bfsLevels(edges, sources, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 2L), (10L, 0L)))
    // rounds = 1 stops the frontier: node 3 (2 hops from every source)
    // is absent — the bound is a replayability contract
    val one = GraphOps.bfsLevels(edges, sources, rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(one == Seq((1L, 0L), (2L, 1L), (4L, 1L), (5L, 2L), (10L, 0L))
      .filterNot(_._1 == 5L))
  }
}
