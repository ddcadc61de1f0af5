package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-13 graph wave: bounded weighted SSSP, personalized PageRank,
  * common-neighbor link prediction, deterministic seeded walks.
  */
class Round13GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("ssspInt: a cheap 2-hop path beats an expensive direct edge; " +
      "nodes beyond the round bound are absent") {
    // 1 -> 2 (w 10), 1 -> 3 (w 1), 3 -> 2 (w 1): dist(2) = 2, not 10.
    // chain 2 -> 4 -> 5 -> 6: node 6 needs 4 hops, rounds = 3 omits it
    val e = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 1L),
      (2L, 4L, 1L), (4L, 5L, 1L), (5L, 6L, 1L)).toDF("src", "dst", "w")
    val src = Seq(Tuple1(1L)).toDF("id")
    // within 3 hops the cheap route to 5 (4 hops via node 3) is not yet
    // available — dist(5) rides the expensive direct edge: 10+1+1 = 12
    val got = GraphOps.ssspInt(e, src, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 1L, 4L -> 3L, 5L -> 12L))
    // one more round: 5 improves to the cheap 4-hop route, 6 appears
    val got4 = GraphOps.ssspInt(e, src, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got4 == got + (5L -> 4L) + (6L -> 13L))
    // parallel edges keep the cheapest
    val dup = GraphOps.ssspInt(
      e.unionByName(Seq((1L, 3L, 7L)).toDF("src", "dst", "w")), src, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dup(3L) == 1L)
  }

  test("pageRankPersonalizedInt: restart mass only at seeds — a node " +
      "unreachable from the seed scores 0, the seed keeps its 150000 floor") {
    // two disjoint 2-cycles; seed only in the first
    val e = Seq((1L, 2L), (2L, 1L), (5L, 6L), (6L, 5L)).toDF("src", "dst")
    val got = GraphOps.pageRankPersonalizedInt(e, Seq(Tuple1(1L)).toDF("id"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(5L) == 0L && got(6L) == 0L, s"unreachable component leaked mass: $got")
    assert(got(1L) >= 150000L && got(2L) > 0L)
    // global pageRankInt gives BOTH components mass — the forms differ
    val glob = GraphOps.pageRankInt(e, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(glob(5L) > 0L)
  }

  test("linkPrediction: 4-cycle diagonals predicted with 2 common " +
      "neighbors, adjacent pairs never emitted") {
    // square 1-2-3-4-1: diagonals (1,3) and (2,4) share two neighbors
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = GraphOps.linkPrediction(e, minCommon = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == Set((1L, 3L, 2L, 4L), (2L, 4L, 2L, 4L)))
    // raising the threshold empties it
    assert(GraphOps.linkPrediction(e, minCommon = 3L).isEmpty)
  }

  test("randomWalksDet: reproducible traces, every step an actual edge, " +
      "isolated starts stop at step 0") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val starts = Seq(1L, 99L).toDF("id") // 99 has no edges
    val a = GraphOps.randomWalksDet(e, starts, steps = 3, seed = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = GraphOps.randomWalksDet(e, starts, steps = 3, seed = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b, "walks are not reproducible")
    val byWalk = a.groupBy(_._1)
    assert(byWalk(99L).map(x => (x._2, x._3)) == Seq((0L, 99L)),
      "isolated start must emit only its step-0 row")
    val trace1 = byWalk(1L).sortBy(_._2).map(_._3)
    assert(trace1.length == 4 && trace1.head == 1L)
    val und = Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    trace1.sliding(2).foreach { case Seq(u, v) =>
      assert(und((math.min(u, v), math.max(u, v))), s"non-edge hop $u->$v")
    }
    // a different seed changes at least one trace on this graph
    val c = GraphOps.randomWalksDet(e, starts, steps = 3, seed = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a != c, "seed does not influence the walk")
  }
}
