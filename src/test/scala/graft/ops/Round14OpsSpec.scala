package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-14 analytics + lake wave: dense date spine, histogram CDF,
  * discrete hazard table, and manifested-table key erasure.
  */
class Round14OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("denseDailySpine: per-group gaps zero-filled, bounds honored, " +
      "dense groups pass through unchanged") {
    val df = Seq(("a", "2020-01-01", 5L), ("a", "2020-01-04", 7L),
      ("b", "2020-03-01", 1L), ("b", "2020-03-02", 2L))
      .toDF("g", "dt", "x")
    val got = Relational.denseDailySpine(df, col("g"), col("dt"), col("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    assert(got.toSeq == Seq(
      ("a", "2020-01-01", 5L), ("a", "2020-01-02", 0L),
      ("a", "2020-01-03", 0L), ("a", "2020-01-04", 7L),
      ("b", "2020-03-01", 1L), ("b", "2020-03-02", 2L)))
  }

  test("cdfByGroup: ties share cum/n exactly like cume_dist; " +
      "distribution sums to 1.0 at the max value") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 2L), ("g", 5L)).toDF("k", "v")
    val got = Relational.cdfByGroup(df, col("k"), col("v"))
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 0.25), (2L, 0.75), (5L, 1.0)))
  }

  test("hazardTable: at-risk is the reverse cumulative count including " +
      "censored subjects; censored-only durations emit no row") {
    // durations: 2 (event), 2 (censored), 5 (event), 7 (censored)
    // t=2: at risk 4, events 1, hazard 250000; t=5: at risk 2, events 1,
    // hazard 500000; t=7: censored only -> absent
    val df = Seq((2L, true), (2L, false), (5L, true), (7L, false))
      .toDF("dur", "ev")
    val got = Relational.hazardTable(df, col("dur"), col("ev"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 4L, 1L, 250000L), (5L, 2L, 1L, 500000L)))
  }

  test("deleteKeysBucketed selective path: only affected commits are " +
      "rewritten and retired; untouched commit partitions stay on disk " +
      "byte-identical; absent keys are a version-free no-op") {
    import graft.sinks.LakeWriter
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("del_sel").toString
    val lw = new LakeWriter(root)
    val tbl = "del_sel_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // commit 1: keys 1..10, commit 2: keys 11..20, commit 3: 21..30
    def frame(lo: Int, hi: Int) =
      (lo to hi).map(i => (i.toLong, s"row$i")).toDF("k", "payload")
    lw.commitBucketed(frame(1, 10), tbl, 4, Seq("k"), replace = true)
    lw.commitBucketed(frame(11, 20), tbl, 4, Seq("k"))
    lw.commitBucketed(frame(21, 30), tbl, 4, Seq("k"))
    val cv2dir = Paths.get(s"$root/$tbl/graft_cv=2")
    val before = Files.list(cv2dir).toArray.map(_.toString).sorted.toSeq
    val mtimes = before.map(p => Files.getLastModifiedTime(Paths.get(p)).toMillis)
    // erase keys 3 and 25 — commits 1 and 3 affected, commit 2 untouched
    val v = lw.deleteKeysBucketed(spark, tbl, Seq("k"),
      Seq(3L, 25L).toDF("k"))
    assert(v == 4, s"erasure must publish manifest version 4, got $v")
    val out = LakeWriter.readBucketedTable(spark, tbl)
      .select("k").as[Long].collect().sorted
    assert(out.toSeq == ((1L to 30L).filterNot(k => k == 3L || k == 25L)))
    // commit 2's partition untouched on disk (same files, same mtimes)
    val after = Files.list(cv2dir).toArray.map(_.toString).sorted.toSeq
    assert(after == before &&
      after.map(p => Files.getLastModifiedTime(Paths.get(p)).toMillis) == mtimes,
      "untouched commit's files must not be rewritten")
    // retired partitions persist until vacuum (pinned snapshots), but
    // are invisible to the read
    assert(Files.exists(Paths.get(s"$root/$tbl/graft_cv=1")))
    // absent keys: no write, version unchanged
    assert(lw.deleteKeysBucketed(spark, tbl, Seq("k"), Seq(999L).toDF("k")) == 0)
    // vacuum completes the physical erasure of retired partitions
    lw.vacuumBucketed(spark, tbl)
    assert(!Files.exists(Paths.get(s"$root/$tbl/graft_cv=1")),
      "vacuum must reclaim the retired pre-erasure partition")
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("islands: boundaries pair k-th start with k-th end; singletons " +
      "and the open ends are their own islands") {
    val df = Seq(1L, 2L, 3L, 7L, 9L, 10L).toDF("id")
    val got = Relational.islands(df, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 3L, 3L), (7L, 7L, 1L), (9L, 10L, 2L)))
  }

  test("ancestorClosure + subtreeAggInt: closure by squaring reaches " +
      "full depth; subtree sums are self-inclusive; roots carry all") {
    // chain 8 -> 4 -> 2 -> 1 plus sibling 5 -> 2 (parent = id / 2)
    val parents = Seq((8L, 4L), (4L, 2L), (2L, 1L), (5L, 2L))
      .toDF("child", "parent")
    val values = Seq((1L, 1L), (2L, 10L), (4L, 100L), (5L, 1000L),
      (8L, 10000L)).toDF("id", "v")
    val got = GraphOps.subtreeAggInt(parents, values, maxDepth = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((5L, 11111L)), s"root must see all 5 nodes: $got")
    assert(got(2L) == ((4L, 11110L)))
    assert(got(4L) == ((2L, 10100L)))
    assert(got(5L) == ((1L, 1000L)) && got(8L) == ((1L, 10000L)))
    // depth check: maxDepth = 2 would miss 8 -> 1 (3 hops); the
    // closure must NOT undershoot when maxDepth covers it
    val shallow = GraphOps.ancestorClosure(parents, maxDepth = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shallow.contains((8L, 1L)), "squaring must reach depth 3 pairs")
    // a forest DEEPER than maxDepth must fail loudly (fixed-point
    // check), never return a silently truncated closure
    val deep = intercept[IllegalArgumentException] {
      GraphOps.ancestorClosure(parents, maxDepth = 2).collect()
    }
    assert(deep.getMessage.contains("deeper than maxDepth"))
  }

  test("nearestEvent: picks the closest either-direction match within " +
      "the window; distance ties break to the earlier right event") {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val ev = Seq(
      // click at t=1000; views at 940 (|d|=60) and 1050 (|d|=50) -> 1050
      (1L, 10L, "click", ts(1000)), (1L, 20L, "view", ts(940)),
      (1L, 21L, "view", ts(1050)),
      // click at t=5000; views at 4990 and 5010 (tie |d|=10) -> earlier 4990
      (2L, 11L, "click", ts(5000)), (2L, 22L, "view", ts(4990)),
      (2L, 23L, "view", ts(5010)),
      // click with no view inside 10 min -> omitted
      (3L, 12L, "click", ts(9000)), (3L, 24L, "view", ts(20000)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = EventOps.nearestEvent(ev, "click", "view", 600L * 1000000L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((10L, 21L, 50000000L), (11L, 22L, -10000000L)))
  }

  test("tableChanges: v1 -> v2 emits exact CDC arms; same-version diff " +
      "is empty") {
    import graft.sinks.LakeWriter
    val root = java.nio.file.Files.createTempDirectory("cdf_t").toString
    val lw = new LakeWriter(root)
    val tbl = "cdf_spec_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    lw.commitBucketed(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      tbl, 4, Seq("k"), replace = true)
    lw.commitBucketed(Seq((1L, "a2"), (3L, "c")).toDF("k", "v"),
      tbl, 4, Seq("k"))
    val got = LakeWriter.tableChanges(spark, tbl, "k", Seq("k"), 1, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "update_preimage", "a"),
      (1L, "update_postimage", "a2"), (3L, "insert", "c")))
    assert(LakeWriter.tableChanges(spark, tbl, "k", Seq("k"), 2, 2).isEmpty)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("timeWeightedAvg: LOCF holding-time weights, exact integer " +
      "micro-average; single-observation keys omitted") {
    // key a: v=100 held 3 ticks, v=200 held 1 tick -> (300+200)/4 = 125
    val df = Seq(("a", 0L, 100L), ("a", 3L, 200L), ("a", 4L, 999L),
      ("lone", 5L, 7L)).toDF("k", "t", "v")
    val got = Relational.timeWeightedAvg(df, col("k"), col("t"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 3L, 4L, 125000000L)))
  }

  test("ohlcBars: open/close via deterministic (t, id) struct argmin; " +
      "same-timestamp ties break by id") {
    val df = Seq(("x", 1L, 10L, 11L, 50L), ("x", 1L, 20L, 12L, 80L),
      ("x", 1L, 20L, 13L, 20L), ("x", 1L, 5L, 14L, 60L))
      .toDF("s", "b", "t", "i", "v")
    val got = Relational.ohlcBars(df, col("s"), col("b"), col("t"),
      col("i"), col("v")).collect()(0)
    // open = t=5 row (v 60); close = t=20, larger id 13 (v 20)
    assert((got.getLong(2), got.getLong(3), got.getLong(4), got.getLong(5),
      got.getLong(6)) == ((60L, 80L, 20L, 20L, 4L)))
  }

  test("dynamic partition pruning: the month-partitioned fact joined " +
      "to a broadcast dim carries a runtime pruning subquery") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("dpp_spec").toString + "/fact"
    (1 to 200).map(i => (i.toLong, f"2020-${i % 12 + 1}%02d"))
      .toDF("id", "month")
      .write.mode("overwrite").partitionBy("month").parquet(dir)
    val fact = spark.read.parquet(dir)
    // DPP requires a SELECTIVE predicate on the build side — a
    // literal relation constant-folds its filter away, so the dim
    // must be a file source with a surviving Filter node
    val dimDir = Files.createTempDirectory("dpp_spec").toString + "/dim"
    (1 to 12).map(m => f"2020-$m%02d").toDF("month")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("month") < "2020-03")
    val q = fact.join(broadcast(dim), "month").groupBy("month")
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning subquery in the plan:\n$plan")
    assert(q.collect().map(_.getLong(1)).sum == 33L,
      "month 01 (16 ids: 12,24..192) + month 02 (17 ids: 1,13..193)")
  }

  test("ntileExact: differential against Spark's own ntile window under " +
      "the identical (v, id) ordering, uneven buckets and heavy ties") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 23).map(i => ("g", (i % 5).toLong, i.toLong))
      .toDF("g", "v", "id")
    for (k <- Seq(1, 4, 10, 23, 30)) {
      val got = Relational.ntileExact(df, col("g"), col("v"), col("id"), k)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
      val want = df.withColumn("bucket",
          ntile(k).over(Window.partitionBy("g").orderBy("v", "id"))
            .cast("long"))
        .collect().map(r => (r.getLong(2), r.getLong(3))).toMap
      assert(got == want, s"k=$k diverged from the reference ntile")
    }
  }

  test("maximalIndependentSet: independent (no edge inside), maximal " +
      "(every outsider has an MIS neighbor), deterministic across runs " +
      "and partitionings") {
    // two triangles bridged by a path + a pendant
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 5L), (8L, 1L)).toDF("src", "dst")
    val mis = GraphOps.maximalIndependentSet(e, "spec", rounds = 10)
      .as[Long].collect().toSet
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L), (7L, 5L), (8L, 1L))
    assert(edges.forall { case (a, b) => !(mis(a) && mis(b)) },
      s"MIS contains an edge: $mis")
    val nodes = edges.flatMap(p => Seq(p._1, p._2)).toSet
    val nbrs = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((nodes -- mis).forall(v => nbrs(v).exists(mis)),
      s"not maximal: $mis")
    val again = GraphOps.maximalIndependentSet(e.repartition(7), "spec", 10)
      .as[Long].collect().toSet
    assert(again == mis, "must be replay-deterministic")
    // a different seed is allowed to pick a different (still valid) set
    val other = GraphOps.maximalIndependentSet(e, "spec2", 10)
      .as[Long].collect().toSet
    assert(edges.forall { case (a, b) => !(other(a) && other(b)) })
  }

  test("clusteringPairMetrics: pair counting matches the hand-computed " +
      "confusion (over-merge costs precision, over-split costs recall)") {
    // truth: {1,2,3} and {4,5}; predicted: {1,2} {3,4} {5}
    // pred_pairs = 1 + 1 = 2; true_pairs = 3 + 1 = 4; tp = 1 (pair 1-2)
    val df = Seq((1L, 10L, 100L), (2L, 10L, 100L), (3L, 20L, 100L),
      (4L, 20L, 200L), (5L, 30L, 200L)).toDF("id", "pred", "truth")
    val r = Relational.clusteringPairMetrics(df, col("pred"), col("truth"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 2L, 4L)))
    assert(r.getLong(3) == 500000L, "precision 1/2")
    assert(r.getLong(4) == 250000L, "recall 1/4")
    assert(r.getLong(5) == 333333L, "f1 = 2/6")
  }

  test("reservoirK: exactly min(k, |group|) rows, contiguous ranks, " +
      "deterministic under repartitioning, disjoint seeds differ") {
    val df = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "g")
    val got = Relational.reservoirK(df, col("g"), col("id"), 5, "s1")
    val byG = got.collect().groupBy(_.getString(1))
    assert(byG("even").length == 5 && byG("odd").length == 5)
    assert(byG("even").map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // tiny group: keeps all rows
    val tiny = Relational.reservoirK(df.filter(col("id") <= 3), col("g"),
      col("id"), 5, "s1")
    assert(tiny.count() == 3)
    // replay-deterministic
    val again = Relational.reservoirK(df.repartition(7), col("g"),
      col("id"), 5, "s1").select("id").as[Long].collect().sorted.toSeq
    assert(again == got.select("id").as[Long].collect().sorted.toSeq)
    // the 100 TB path: forcing the hash-prefix pre-filter (threshold
    // below the group size) must select the IDENTICAL sample — the
    // prefix cutoff only discards rows that can never rank ≤ k
    val pre = Relational.reservoirK(df, col("g"), col("id"), 5, "s1",
      fullRankBelow = 10).select("id").as[Long].collect().sorted.toSeq
    assert(pre == again, "pre-filtered sample must equal the full rank")
    // plan shape: the hash-prefix cutoff predicate (on _h60) must sit
    // BELOW the rank Window — the window sorts survivors (~k per
    // group), never the group. (Catalyst folds the cutoff into the
    // count-join's condition, which is below the Window — fine.)
    val plan = Relational.reservoirK(df, col("g"), col("id"), 5, "s1",
      fullRankBelow = 10, verified = false)
      .queryExecution.optimizedPlan.toString
    val winIdx = plan.indexOf("Window")
    val cutBelow = plan.indexOf("_h60", winIdx)
    assert(winIdx >= 0 && cutBelow > winIdx,
      s"expected the _h60 cutoff predicate BELOW the Window, plan:\n$plan")
    // working-name collision is refused, not silently overwritten
    val boom = intercept[IllegalArgumentException] {
      Relational.reservoirK(df.withColumn("_h", col("id")), col("g"),
        col("id"), 5, "s1")
    }
    assert(boom.getMessage.contains("_h"))
  }

  test("cloneSnapshot: a v1 clone is a physical copy pinned to the " +
      "pre-upsert state and survives vacuuming the source") {
    import graft.sinks.LakeWriter
    val root = java.nio.file.Files.createTempDirectory("clone_spec").toString
    val lw = new LakeWriter(root)
    spark.sql("DROP TABLE IF EXISTS clone_spec_src")
    spark.sql("DROP TABLE IF EXISTS clone_spec_v1")
    lw.commitBucketed(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      "clone_spec_src", 4, Seq("k"), replace = true)
    lw.commitBucketed(Seq((1L, "a2")).toDF("k", "v"),
      "clone_spec_src", 4, Seq("k"))
    assert(lw.cloneSnapshot(spark, "clone_spec_src", "clone_spec_v1",
      version = 1, mergeKeys = Seq("k")) == 1)
    def cloneRows() = LakeWriter
      .readBucketedTableMerged(spark, "clone_spec_v1", Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cloneRows() == Set((1L, "a"), (2L, "b")),
      "clone must show the PRE-upsert state")
    // compact + vacuum the source down to one version — the clone is
    // physically independent and must be unaffected
    lw.compactBucketedManifested(spark, "clone_spec_src", Seq("k"))
    lw.vacuumBucketed(spark, "clone_spec_src")
    assert(cloneRows() == Set((1L, "a"), (2L, "b")))
    spark.sql("DROP TABLE IF EXISTS clone_spec_src")
    spark.sql("DROP TABLE IF EXISTS clone_spec_v1")
  }

  test("deleteKeysBucketed merged path: erasure through the merged view " +
      "preserves latest-wins for surviving keys") {
    import graft.sinks.LakeWriter
    val root = java.nio.file.Files.createTempDirectory("del_mor").toString
    val lw = new LakeWriter(root)
    val tbl = "del_mor_t"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // v1: k=1 -> a, k=2 -> b; v2 upserts k=1 -> a2
    lw.commitBucketed(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      tbl, 4, Seq("k"), replace = true)
    lw.commitBucketed(Seq((1L, "a2")).toDF("k", "v"), tbl, 4, Seq("k"))
    // erase k=2 through the merged path: k=1 must stay at its LATEST
    lw.deleteKeysBucketed(spark, tbl, Seq("k"), Seq(2L).toDF("k"),
      mergeKeys = Seq("k"))
    val out = LakeWriter.readBucketedTableMerged(spark, tbl, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a2")))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
