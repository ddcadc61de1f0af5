package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-12 third wave: CDC apply with deletes, Spearman, MAD
  * outliers, HITS, Markov transitions, Q21-shape decorrelation,
  * manifested schema evolution.
  */
class Round12OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("applyCdc: latest seq wins per key — delete then re-upsert survives, " +
      "upsert then delete vanishes; one aggregate, no window") {
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "tag")
    val feed = Seq(
      // key 1: upsert@1 then delete@2 -> gone
      (1L, "upsert", 1L, "x1"), (1L, "delete", 2L, null),
      // key 2: delete@1 then upsert@2 -> survives with v2 payload
      (2L, "delete", 1L, null), (2L, "upsert", 2L, "x2"),
      // key 3: two out-of-order upserts -> seq 5 wins
      (3L, "upsert", 5L, "late"), (3L, "upsert", 4L, "early"),
      // key 9: brand-new insert
      (9L, "upsert", 1L, "new")
    ).toDF("k", "change_type", "seq", "tag")
    val got = Relational.applyCdc(dim, feed, "k", "seq")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "x2"), (3L, "late"), (4L, "d"), (9L, "new")))
    val plan = Relational.applyCdc(dim, feed, "k", "seq")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"applyCdc planned a window:\n$plan")
  }

  test("spearmanByGroup: monotone -> 1, inverse -> -1, ties handled by " +
      "average ranks") {
    val mono = (1L to 20L).map(i => ("m", i, i * 3)) ++
      (1L to 20L).map(i => ("i", i, 100L - i * 2))
    val got = Relational.spearmanByGroup(mono.toDF("g", "x", "y"),
        col("g"), col("x"), col("y"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(got("m") == 1.0 && got("i") == -1.0)
    // all-tied y: denominator 0 -> NaN/null, never a crash; and a
    // hand case with ties: x=(1,2,2,3), y=(1,3,3,5) is still perfectly
    // monotone in the tie-average sense -> rho 1
    val tied = Seq(("t", 1L, 1L), ("t", 2L, 3L), ("t", 2L, 3L), ("t", 3L, 5L))
      .toDF("g", "x", "y")
    val rho = Relational.spearmanByGroup(tied, col("g"), col("x"), col("y"))
      .collect().head.getDouble(2)
    assert(rho == 1.0)
  }

  test("madOutliers: hand-checked median/MAD; the masking case 2-sigma misses") {
    // g: 1,2,3,4,100 -> median 3, devs |x-3| = 2,1,0,1,97 -> MAD 1;
    // outliers where |x-3| > 3*1: x=100 only
    val rows = Seq(1L, 2L, 3L, 4L, 100L).map(("g", _)).toDF("g", "v")
    val got = Relational.madOutliers(rows, col("g"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).head
    assert(got == (("g", 5L, 3.0, 1.0, 1L)))
    // even-count halves: 1,2,3,4 -> median 2.5; devs 1.5,0.5,0.5,1.5
    // -> MAD 1.0 (middle two of sorted devs: 0.5,1.5 -> 1.0)
    val even = Seq(1L, 2L, 3L, 4L).map(("e", _)).toDF("g", "v")
    val e = Relational.madOutliers(even, col("g"), col("v")).collect().head
    assert(e.getDouble(2) == 2.5 && e.getDouble(3) == 1.0 && e.getLong(4) == 0L)
  }

  test("hits: authorities concentrate on the shared target; scores are " +
      "max-normalized integers") {
    // hubs 1,2,3 all point at part 10; 1 also points at 11.
    // Authority(10) must be the max (score = scale); hub 1 beats 2,3.
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L)).toDF("src", "dst")
    val got = GraphOps.hits(e, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val auth = got.filter(_._1 == "authority").map(t => t._2 -> t._3).toMap
    val hub = got.filter(_._1 == "hub").map(t => t._2 -> t._3).toMap
    assert(auth(10L) == 1000000L && auth(11L) < auth(10L))
    assert(hub(1L) == 1000000L && hub(2L) < hub(1L) && hub(2L) == hub(3L))
  }

  test("markovTransitions: counts and row-normalized probabilities") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 5L, "a"), (2L, 6L, "c")
    ).map { case (u, i, t) => (u, i, new Timestamp(i * 60000L), t) }
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = EventOps.markovTransitions(ev)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // from a: a->b twice, a->c once (p 0.666667 / 0.333333); b->a once
    assert(got == Seq(
      ("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333), ("b", "a", 1L, 1.0)))
  }

  test("waitingSuppliers decorrelates: the executed plan joins, it does not " +
      "re-execute subqueries per row") {
    val sfDir = "/root/testdata/sf0.001"
    val t = graft.core.Tables.load(spark, sfDir)
    val df = Relational.waitingSuppliers(t.lineitem, t.supplier, t.orders, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    // decorrelation rewrites EXISTS/NOT EXISTS into semi/anti joins
    assert(plan.contains("LeftSemi") || plan.contains("ExistenceJoin"),
      s"EXISTS did not become a semi join:\n$plan")
    assert(plan.contains("LeftAnti") || plan.contains("ExistenceJoin"),
      s"NOT EXISTS did not become an anti join:\n$plan")
    assert(df.count() >= 0) // executes
  }

  test("manifested schema evolution: added column nulls for old files, " +
      "dropped column pruned from every file") {
    val root = java.nio.file.Files.createTempDirectory("evolve_spec").toString
    val lw = new graft.sinks.LakeWriter(root)
    lw.commitManifested(Seq((1L, "a")).toDF("k", "tag"), "t", append = false)
    lw.commitManifested(Seq((2L, "b", 9.5)).toDF("k", "tag", "x"), "t")
    val v2 = lw.readManifested(spark, "t").orderBy("k").collect()
    assert(v2.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(v2.head.isNullAt(2) && v2.last.getDouble(2) == 9.5)
    // v3 drops tag: the snapshot schema narrows for ALL files
    lw.commitManifested(Seq((3L, 1.5)).toDF("k", "x"), "t")
    val v3 = lw.readManifested(spark, "t")
    assert(v3.columns.toSeq == Seq("k", "x"))
    assert(v3.orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // pinned versions keep their own schema
    assert(lw.readManifested(spark, "t", version = 1).columns.toSeq ==
      Seq("k", "tag"))
  }
}
