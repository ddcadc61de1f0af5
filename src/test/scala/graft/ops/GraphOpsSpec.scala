package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRankInt: hand-derived star-graph scores, exact at every iteration") {
    // undirected star: hub 1 — leaves 2, 3 (both directions)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    // hand derivation (micro-units, floors applied per edge):
    //  s0: all 1,000,000
    //  s1: hub 150000 + 2·(85e6 div 100)        = 1,850,000
    //      leaf 150000 + (85e6 div 200)          =   575,000
    //  s2: hub 150000 + 2·(85·575000 div 100)    = 1,127,500
    //      leaf 150000 + (85·1850000 div 200)    =   936,250
    //  s3: hub 150000 + 2·(85·936250 div 100)    = 1,741,624
    //      leaf 150000 + (85·1127500 div 200)    =   629,187
    val s3 = GraphOps.pageRankInt(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s3 == Map(1L -> 1741624L, 2L -> 629187L, 3L -> 629187L), s3.toString)
    val s1 = GraphOps.pageRankInt(edges, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L), s1.toString)
  }

  test("triangleCounts: K4 minus an edge, duplicate orientations collapse") {
    // nodes 1..4, all edges except (3,4): triangles (1,2,3) and
    // (1,2,4) — node 1 and 2 in two each, 3 and 4 in one
    val edges = Seq(
      (1L, 2L), (2L, 1L),           // duplicate orientation collapses
      (1L, 3L), (1L, 4L), (2L, 3L), (4L, 2L),
      (5L, 6L)                      // an edge in no triangle
    ).toDF("src", "dst")
    val out = GraphOps.triangleCounts(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 0L, 6L -> 0L),
      out.toString)
  }

  test("pageRankInt: dangling nodes keep the base score; hubs outrank leaves") {
    // 4 → 1 only (4 is a source; nothing points at it)
    val edges = Seq((1L, 2L), (2L, 1L), (4L, 1L)).toDF("src", "dst")
    val s = GraphOps.pageRankInt(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(4L) == 150000L, "no in-edges → damping base only")
    assert(s(1L) > s(2L), "the node with two in-edges must outrank")
  }
}
