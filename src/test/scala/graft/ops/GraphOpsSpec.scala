package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("connectedComponents: chain + triangle + isolate-pair resolve to min " +
      "labels; a long chain needs (and gets) diameter-many sweeps") {
    import org.apache.spark.sql.functions.col
    // components: a 6-node chain (diameter 5 — more sweeps than a
    // clique), a triangle, and a 2-node pair; direction mixed to
    // prove undirectedness
    val edges = Seq(
      (1L, 2L), (3L, 2L), (3L, 4L), (5L, 4L), (5L, 6L), // chain 1..6
      (10L, 11L), (11L, 12L), (12L, 10L),               // triangle
      (21L, 20L)                                        // pair
    ).toDF("src", "dst")
    val got = GraphOps.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (1L to 6L).map((_, 1L)) ++
      (10L to 12L).map((_, 10L)) ++ Seq((20L, 20L), (21L, 20L))
    assert(got == want, got.toString)
    // maxIter below the diameter fails LOUDLY — a silently-wrong
    // component map is the worst output
    val e = intercept[IllegalArgumentException] {
      GraphOps.connectedComponents(edges, maxIter = 2)
        .filter(col("id") === 6L).collect()
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
    // self-loop-only nodes survive in BOTH forms
    val loop = Seq((7L, 7L), (1L, 2L)).toDF("src", "dst")
    val viaP = GraphOps.connectedComponents(loop)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaS = GraphOps.connectedComponentsBigStar(loop)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaP == Seq((1L, 1L), (2L, 1L), (7L, 7L)) && viaS == viaP,
      s"$viaP vs $viaS")
  }

  test("foldComponents: bridges merge components, a smaller-id NEW node " +
      "takes over as the min, intra-component edges no-op, untouched " +
      "components pass through — equal to the full recompute") {
    val oldE = Seq((10L, 11L), (20L, 21L), (30L, 31L)).toDF("src", "dst")
    val labels = GraphOps.connectedComponents(oldE)
    // bridge {10,11}–{20,21}; attach NEW node 5 (< every old min) to 21;
    // (30,31) is an intra-component no-op; {30,31} otherwise untouched
    val newE = Seq((11L, 20L), (5L, 21L), (30L, 31L)).toDF("src", "dst")
    val folded = GraphOps.foldComponents(labels, newE)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val full = GraphOps.connectedComponents(
      oldE.unionByName(newE))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(folded == full, s"$folded vs $full")
    assert(folded.contains((21L, 5L)) && folded.contains((10L, 5L)),
      "the new node's smaller id must become the merged component's label")
    assert(folded.contains((30L, 30L)) && folded.contains((31L, 30L)))
  }

  test("connectedComponentsBigStar: matches the propagation core on a mixed " +
      "fixture, and resolves a 300-hop chain in O(log n) rounds where " +
      "propagation would need 299 sweeps") {
    val edges = Seq(
      (1L, 2L), (3L, 2L), (3L, 4L), (5L, 4L), (5L, 6L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (21L, 20L)
    ).toDF("src", "dst")
    val viaProp = GraphOps.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaStar = GraphOps.connectedComponentsBigStar(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaStar == viaProp, s"$viaStar vs $viaProp")
    // the diameter lever: a 300-node path converges inside 15 rounds
    // (log-ish), which the require() inside the op enforces — label
    // propagation at the same cap provably cannot finish (spec above)
    import org.apache.spark.sql.functions.col
    val chain = spark.range(1L, 300L)
      .select(col("id").as("src"), (col("id") + 1L).as("dst"))
    val far = GraphOps.connectedComponentsBigStar(chain, maxIter = 15)
      .filter(col("id") === 300L).collect().head.getLong(1)
    assert(far == 1L, s"chain far end must label 1, got $far")
  }

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

  test("triangleCountsCapped: the hub and its edges vanish, counts are exact " +
      "on the capped subgraph, hub-only nodes drop out") {
    // K4-minus-(3,4) as above, plus hub 9 wired to everything (deg 6
    // > cap 3) and node 7 connected ONLY to the hub
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L), (9L, 5L), (9L, 7L),
      (5L, 6L)
    ).toDF("src", "dst")
    val out = GraphOps.triangleCountsCapped(edges, maxDeg = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // degrees WITH hub edges: 1→4, 2→4 (over cap — they go too!),
    // 3→3, 4→3, 5→2, 6→1, 7→1(hub only), 9→6. Surviving edges:
    // (3,4)? absent from input. (5,6) only → no triangles.
    assert(out == Map(5L -> 0L, 6L -> 0L), out.toString)
    // a milder cap keeps 1 and 2: their mutual triangles survive
    // minus any through the removed hub
    val out4 = GraphOps.triangleCountsCapped(edges, maxDeg = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out4 == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 0L, 6L -> 0L),
      out4.toString)
  }

  test("triangleCountsSampled: p=1 equals the exact counts; sampling is " +
      "deterministic and the estimate scales by 1/p^3") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (5L, 6L)
    ).toDF("src", "dst")
    val full = GraphOps.triangleCountsSampled(edges, p = 1.0).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = GraphOps.triangleCounts(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(full.view.mapValues(_._1).toMap == exact, "p=1 keeps every edge")
    assert(full.forall { case (_, (n, est)) => est == n.toDouble },
      "1/p^3 = 1 at p=1")
    val s1 = GraphOps.triangleCountsSampled(edges, p = 0.5).collect().toSeq
    val s2 = GraphOps.triangleCountsSampled(edges, p = 0.5).collect().toSeq
    assert(s1 == s2, "hash-Bernoulli sampling must be deterministic")
    assert(s1.forall(r => r.getDouble(2) == r.getLong(1) * 8.0),
      "estimate = n_sampled / p^3")
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
