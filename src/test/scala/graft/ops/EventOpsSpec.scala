package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left time, per key") {
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), "e1"),
      (1L, ts("2026-01-01 12:00:00"), "e2"),
      (2L, ts("2026-01-01 09:00:00"), "e3"), // before any right row for key 2
      (3L, ts("2026-01-01 09:00:00"), "e4")  // key with no right rows at all
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2026-01-01 09:00:00"), 100L),
      (1L, ts("2026-01-01 11:00:00"), 200L),
      (1L, ts("2026-01-01 12:00:00"), 300L), // equal time → >= semantics take it
      (2L, ts("2026-01-01 10:00:00"), 400L)
    ).toDF("rk", "rt", "payload")

    val out = EventOps.asofJoin(left, "k", "t", right, "rk", "rt", Seq("payload"))
      .orderBy("tag").select("tag", "payload").collect()
    assert(out.toSeq == Seq(
      Row("e1", 100L),   // 10:00 → 09:00 row
      Row("e2", 300L),   // 12:00 → equal-time row wins (>=)
      Row("e3", null),   // right rows all later
      Row("e4", null)))  // no right rows for key
  }

  test("asofJoin survives right-side columns colliding with left names") {
    // both sides carry `ts` AND the payload is that colliding column
    val left = Seq((1L, ts("2026-01-01 10:00:00"), "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts("2026-01-01 09:30:00"))).toDF("k", "ts")
    val out = EventOps.asofJoin(left, "k", "ts", right, "k", "ts", Seq("ts"))
    // left ts keeps its column; colliding payload surfaces as ts_right
    val r = out.select("tag", "ts", "ts_right").collect()(0)
    assert(r == Row("x", ts("2026-01-01 10:00:00"), ts("2026-01-01 09:30:00")))
  }

  test("sessionize splits on gaps > 30 min and aggregates per user") {
    // user 1: 3 events 10 min apart (one session), then one 2 h later
    // user 2: single event
    val events = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00")),
      (2L, 1L, ts("2026-01-01 10:10:00")),
      (3L, 1L, ts("2026-01-01 10:20:00")),
      (4L, 1L, ts("2026-01-01 12:20:00")),
      (5L, 2L, ts("2026-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")

    val out = EventOps.sessionize(events).collect()
    // user 1: 2 sessions, avg 2 events, longest lasted 20 min
    assert(out(0) == Row(1L, 2L, 2.0, 1200000000L))
    assert(out(1) == Row(2L, 1L, 1.0, 0L))
  }

  test("eventBursts finds ordered pairs within the window across bucket boundaries") {
    // b at +9:59 from a (inside 10 min), c at +10:01 (outside);
    // a/b straddle the 600 s bucket boundary on purpose
    val events = Seq(
      (1L, 1L, "a", ts("2026-01-01 00:09:55")),
      (2L, 1L, "b", ts("2026-01-01 00:19:54")),
      (3L, 1L, "c", ts("2026-01-01 00:29:50")),
      (4L, 2L, "a", ts("2026-01-01 00:00:00")) // other user — never pairs
    ).toDF("event_id", "user_id", "event_type", "ts")

    val out = EventOps.eventBursts(events).collect()
    assert(out.toSeq == Seq(Row("a", "b", 1L), Row("b", "c", 1L)))
  }

  test("asofJoinBucketed: identical output to the window form, incl. carry across empty buckets") {
    // long times (non-timestamp path), tiny buckets (width 100) so the
    // fixture spans many buckets; key 1's right at t=5 must carry
    // through 3 EMPTY buckets to the left at t=405; equal-time and
    // no-right-yet cases ride along
    val left = Seq(
      (1L, 5L, "a"), (1L, 95L, "b"), (1L, 405L, "c"), (1L, 500L, "d"),
      (2L, 50L, "e"), (3L, 10L, "f")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 5L, 100L), (1L, 500L, 200L),
      (2L, 60L, 300L), (3L, 1L, 400L)
    ).toDF("rk", "rt", "payload")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy("tag").select("tag", "payload").collect().toSeq
    val win = run(EventOps.asofJoin(left, "k", "t", right, "rk", "rt", Seq("payload")))
    val buck = run(EventOps.asofJoinBucketed(
      left, "k", "t", right, "rk", "rt", Seq("payload"), bucketUs = 100L))
    assert(buck == win)
    assert(win == Seq(
      Row("a", 100L), Row("b", 100L), Row("c", 100L), Row("d", 200L),
      Row("e", null), Row("f", 400L)))
  }

  test("asofJoinBucketed: null payloads never eclipse earlier non-null values") {
    // bucket 0 of key 1 ends with a NULL-payload right row: the
    // bucket summary must still carry 5 forward (per-payload last
    // non-null, like the window form), and the all-null bucket for
    // key 2 must reach back past itself
    val left = Seq((1L, 150L, "a"), (2L, 350L, "b")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, Some(5L)), (1L, 90L, None),
      (2L, 10L, Some(7L)), (2L, 250L, None)
    ).toDF("rk", "rt", "payload")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.orderBy("tag").select("tag", "payload").collect().toSeq
    val win = run(EventOps.asofJoin(left, "k", "t", right, "rk", "rt", Seq("payload")))
    val buck = run(EventOps.asofJoinBucketed(
      left, "k", "t", right, "rk", "rt", Seq("payload"), bucketUs = 100L))
    assert(buck == win)
    assert(win == Seq(Row("a", 5L), Row("b", 7L)))
  }

  test("asofJoinBucketed handles non-orderable (map) payloads like the plain form") {
    val left = Seq((1L, 250L, "a")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, Map("v" -> "keep")),
      (1L, 90L, null.asInstanceOf[Map[String, String]])
    ).toDF("rk", "rt", "attrs")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("tag", "attrs").collect().toSeq
    val win = run(EventOps.asofJoin(left, "k", "t", right, "rk", "rt", Seq("attrs")))
    val buck = run(EventOps.asofJoinBucketed(
      left, "k", "t", right, "rk", "rt", Seq("attrs"), bucketUs = 100L))
    assert(buck == win)
    assert(win.head.getMap[String, String](1) == Map("v" -> "keep"))
  }

  test("asofJoinBucketed rejects non-orderable-as-long time columns loudly") {
    val left = Seq((1L, "2026-01-01", "x")).toDF("k", "t", "tag")
    val right = Seq((1L, "2025-12-31", 1L)).toDF("rk", "rt", "p")
    val e = intercept[IllegalArgumentException] {
      EventOps.asofJoinBucketed(left, "k", "t", right, "rk", "rt", Seq("p"))
    }
    assert(e.getMessage.contains("timestamp or integral"))
    // fractional time columns would truncate-and-reorder: also loud
    val e2 = intercept[IllegalArgumentException] {
      EventOps.asofJoinBucketed(
        Seq((1L, 1.5, "x")).toDF("k", "t", "tag"),
        "k", "t",
        Seq((1L, 1.2, 1L)).toDF("rk", "rt", "p"), "rk", "rt", Seq("p"))
    }
    assert(e2.getMessage.contains("timestamp or integral"))
  }

  test("concurrentSessions: hand-derived day peaks, and the global running " +
      "sum never rides an unpartitioned corpus-sized window") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    import org.apache.spark.sql.execution.window.WindowExec
    // u1 session [0,600s] overlaps u2's [300,300] → day-0 peak 2;
    // u3 and u1's second session are disjoint; u2's day-1 event alone
    val ev = Seq(
      (1L, 1L, 0L), (1L, 2L, 600L), (2L, 3L, 300L),
      (3L, 4L, 7200L), (1L, 5L, 10800L), (2L, 6L, 90000L))
      .toDF("user_id", "event_id", "secs")
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(col("secs")).as("ts"))
    val out = EventOps.concurrentSessions(ev)
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((0L, 2L), (1L, 1L)))
    // scale shape: the only UNPARTITIONED window is the ≤|partitions|-
    // row offset sum (over the per-partition totals), never the delta
    // frame itself
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val wins = EventOps.concurrentSessions(ev)
        .queryExecution.executedPlan.collect { case w: WindowExec => w }
      val unpart = wins.filter(_.partitionSpec.isEmpty)
      assert(unpart.nonEmpty && unpart.forall(_.toString.contains("tot")),
        s"only the partition-totals offset window may be global:\n${unpart.mkString("\n")}")
      assert(wins.exists(w => w.partitionSpec.nonEmpty &&
        w.toString.contains("pid")),
        "the delta cumulation must be pid-partitioned")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("attribution: integer credit split with last-touch remainder; " +
      "credits sum to exactly 1e6 per attributed purchase (golden)") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // segment 0: click,view,click before purchase@4 → 333333 each,
    // remainder 1 to the LAST touch (click@3 → click total 666667);
    // segment 1: one view before purchase@6 → full 1e6
    val ev = Seq(
      (1L, 1L, "click", 1L), (1L, 2L, "view", 2L), (1L, 3L, "click", 3L),
      (1L, 4L, "purchase", 4L), (1L, 5L, "view", 5L), (1L, 6L, "purchase", 6L),
      (2L, 7L, "click", 10L) // touch with NO purchase after: unattributed
    ).toDF("user_id", "event_id", "event_type", "secs")
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_seconds(col("secs")).as("ts"))
    val got = EventOps.attribution(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("click", 666667L, 2L), ("view", 1333333L, 2L)),
      got.toString)
  }

  test("activeCoverage: interval union length + peak (golden, incl. " +
      "1µs point sessions and an overlap)") {
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val ev = Seq(
      (1L, 1L, 0L), (1L, 2L, 600L), (2L, 3L, 300L), // overlap: union [0, 600s]+1µs
      (3L, 4L, 7200L), (1L, 5L, 10800L), (2L, 6L, 90000L)) // 3 point sessions, 1µs each
      .toDF("user_id", "event_id", "secs")
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(col("secs")).as("ts"))
    val r = EventOps.activeCoverage(ev).collect().head
    assert((r.getLong(0), r.getLong(1)) == (600000004L, 2L), r.toString)
  }

  test("asofJoinBucketed: a single hot key spreads across >1 window partition") {
    import org.apache.spark.sql.execution.window.WindowExec
    // ONE key, 400 left rows over 40 buckets — the window form would
    // serialize all of it into one task
    val left = (1L to 400L).map(i => (7L, i * 10L, i)).toDF("k", "t", "n")
    val right = (1L to 40L).map(i => (7L, i * 100L, i * 1000L)).toDF("rk", "rt", "payload")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = EventOps.asofJoinBucketed(
        left, "k", "t", right, "rk", "rt", Seq("payload"), bucketUs = 100L)
      // the MAIN pass partitions by (key, bucket) — 2-expression spec —
      // so the hot key's rows hash to many tasks, not one
      val mainWins = out.queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.size == 2 => w
      }
      assert(mainWins.nonEmpty,
        s"expected a (key, bucket)-partitioned window:\n${out.queryExecution.executedPlan}")
      // and the values still match the serial window form exactly
      // left rows before the first right row carry a null payload
      def toMap(rows: Array[Row]) =
        rows.map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val win = toMap(EventOps.asofJoin(left, "k", "t", right, "rk", "rt", Seq("payload"))
        .select("n", "payload").collect())
      val buck = toMap(out.select("n", "payload").collect())
      assert(buck == win)
      // sanity on semantics: left at t=1000 sees right at 1000 (>=)
      assert(buck(100L) == 10000L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("asofLastOrder: bucketed and window paths agree on real tables") {
    val dir = "/root/testdata/sf0.001"
    val t = graft.core.Tables.load(spark, dir)
    val a = EventOps.asofLastOrder(t.events, t.orders).collect().toSeq
    val b = EventOps.asofLastOrder(t.events, t.orders, bucketed = true).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("hourlyStats buckets by hour as epoch micros") {
    val events = Seq(
      (1L, "click", ts("2026-01-01 10:15:00"), 1.5),
      (2L, "click", ts("2026-01-01 10:45:00"), 2.5),
      (3L, "view", ts("2026-01-01 11:05:00"), 10.0)
    ).toDF("event_id", "event_type", "ts", "value")
    val out = EventOps.hourlyStats(events).collect()
    val h10 = Timestamp.valueOf("2026-01-01 10:00:00").getTime * 1000L
    val h11 = Timestamp.valueOf("2026-01-01 11:00:00").getTime * 1000L
    assert(out.toSeq == Seq(
      Row(h10, "click", 2L, 4.0, 2.0),
      Row(h11, "view", 1L, 10.0, 10.0)))
  }

  test("funnel: strictly-after ordering, partial stages, no-step-1 users absent") {
    def us(s: String) = ts(s).getTime * 1000L
    val events = Seq(
      // u1 completes all three in order
      (1L, "view", ts("2026-01-01 10:00:00")),
      (1L, "click", ts("2026-01-01 10:05:00")),
      (1L, "purchase", ts("2026-01-01 10:10:00")),
      // u2: a click BEFORE the first view must not count; one after does
      (2L, "click", ts("2026-01-01 09:00:00")),
      (2L, "view", ts("2026-01-01 10:00:00")),
      (2L, "click", ts("2026-01-01 10:30:00")),
      // u3: purchase before the first view — stage stays 1
      (3L, "purchase", ts("2026-01-01 09:00:00")),
      (3L, "view", ts("2026-01-01 10:00:00")),
      // u4 never views → absent from the funnel
      (4L, "click", ts("2026-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = EventOps.funnel(events).collect().map(r =>
      (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSeq
    assert(out == Seq(
      (1L, 3L, Some(us("2026-01-01 10:00:00")), Some(us("2026-01-01 10:05:00")),
        Some(us("2026-01-01 10:10:00"))),
      (2L, 2L, Some(us("2026-01-01 10:00:00")), Some(us("2026-01-01 10:30:00")), None),
      (3L, 1L, Some(us("2026-01-01 10:00:00")), None, None)), out.toString)
  }

  test("incrementalCohortRetention: daily folds reproduce the one-shot " +
      "triangle; a user's cohort can even move EARLIER when history backfills") {
    val d0 = ts("2026-01-01 00:00:00")
    def plusDays(d: Int) = new Timestamp(d0.getTime + d * 86400000L)
    val all = Seq(
      (1L, d0), (1L, plusDays(7)), (1L, plusDays(21)),
      (2L, d0), (2L, plusDays(14)),
      (3L, plusDays(7)), (3L, plusDays(28))
    ).zipWithIndex.map { case ((u, t), i) => (i.toLong, u, t) }
      .toDF("event_id", "user_id", "ts")
    val oneShot = EventOps.cohortRetention(all).collect().toSeq
    for (cut <- Seq(2L, 4L, 6L)) {
      val idx = EventOps.activityWeeks(all.filter(s"event_id < $cut"))
      val (tri, updated) = EventOps.incrementalCohortRetention(
        all.filter(s"event_id >= $cut"), idx)
      assert(tri.collect().toSeq == oneShot, s"fold at $cut must equal one-shot")
      assert(updated.count() == EventOps.activityWeeks(all).count(),
        "updated index is the full activity table")
    }
  }

  test("rollingActiveUsers: trailing 7-day distinct counts (golden)") {
    val d0 = ts("2026-01-01 12:00:00")
    def plusDays(d: Int) = new Timestamp(d0.getTime + d * 86400000L)
    val ev = Seq(
      (1L, d0), (2L, d0),             // day D: users 1, 2
      (1L, plusDays(3)),              // day D+3: user 1 again
      (3L, plusDays(8))               // day D+8: user 3 (D out of window)
    ).toDF("user_id", "ts")
    val day0 = math.floorDiv(d0.getTime * 1000L, 86400000000L)
    val out = EventOps.rollingActiveUsers(ev).collect()
      .map(r => (r.getLong(0) - day0, r.getLong(1))).toSeq
    // windows end at each ACTIVE day: D → {1,2}; D+3 → {1,2};
    // D+8 → {1 (D+3 in window), 3} — D's users fell out
    assert(out == Seq((0L, 2L), (3L, 2L), (8L, 2L)), out.toString)
  }

  test("rollingActiveUsersSketch: estimates within tolerance, exact counts ride along") {
    val d0 = ts("2026-01-01 12:00:00")
    def plusDays(d: Int) = new Timestamp(d0.getTime + d * 86400000L)
    val ev = (1L to 40L).flatMap(u =>
      Seq((u, d0), (u, plusDays((u % 5).toInt)))).toDF("user_id", "ts")
    val out = EventOps.rollingActiveUsersSketch(ev).collect()
      .map(r => (r.getLong(1), r.getBoolean(2))).toSeq
    assert(out.nonEmpty && out.forall(_._2),
      s"HLL at lgK=14 is near-exact at 40 users — every window within 10%: $out")
    val exact = EventOps.rollingActiveUsers(ev).collect().map(_.getLong(1)).toSeq
    assert(out.map(_._1) == exact)
  }

  test("topEventPaths: repeated journeys count per occurrence (golden)") {
    val base = ts("2026-01-01 10:00:00")
    def at(m: Int) = new Timestamp(base.getTime + m * 60000L)
    val ev = Seq(
      // u1 walks view→click→purchase twice (6 events → 4 trigrams,
      // v c p appearing twice)
      (1L, 1L, "view", at(0)), (2L, 1L, "click", at(1)), (3L, 1L, "purchase", at(2)),
      (4L, 1L, "view", at(3)), (5L, 1L, "click", at(4)), (6L, 1L, "purchase", at(5)),
      // u2 contributes one different trigram
      (7L, 2L, "error", at(0)), (8L, 2L, "error", at(1)), (9L, 2L, "view", at(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.topEventPaths(ev).collect()
      .map(r => (r.getString(1), r.getLong(2))).toSeq
    assert(out.head == (("view click purchase", 2L)), out.toString)
    assert(out.contains(("error error view", 1L)))
    assert(out.contains(("purchase view click", 1L)), "the bridging trigram counts")
  }

  test("pitJoin: probes hit the containing interval, not a later one; " +
      "pre-history and keyless probes keep nulls") {
    val d = java.sql.Date.valueOf(_: String)
    val orders = Seq(
      (1L, 101L, "O", d("2024-01-01")),
      (1L, 103L, "F", d("2024-03-01")),
      (1L, 104L, "O", d("2024-04-01"))
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    val probes = Seq(
      (10L, 1L, d("2023-12-01")), // before any interval → null
      (11L, 1L, d("2024-02-15")), // inside the first O run
      (12L, 1L, d("2024-03-01")), // boundary: F starts AT this date
      (13L, 1L, d("2024-09-09")), // open current interval
      (14L, 9L, d("2024-02-15"))  // key with no history → null
    ).toDF("event_id", "custkey", "pdate")
    val out = EventOps.pitJoin(probes, "custkey", "pdate",
        Relational.scd2Intervals(orders), "o_custkey", Seq("o_orderstatus"))
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
    assert(out == Seq(
      (10L, None), (11L, Some("O")), (12L, Some("F")),
      (13L, Some("O")), (14L, None)), out.toString)
  }

  test("cohortRetention: first-event week anchors the cohort; gaps leave holes") {
    // week boundary arithmetic in raw micros: wk = floor(us / 7d)
    val d0 = ts("2026-01-01 00:00:00")
    def plusDays(d: Int) = new Timestamp(d0.getTime + d * 86400000L)
    val events = Seq(
      (1L, d0), (1L, plusDays(7)), (1L, plusDays(21)),  // offsets 0, 1, 3
      (2L, d0), (2L, plusDays(7)),                      // offsets 0, 1
      (3L, plusDays(7))                                 // later cohort, offset 0
    ).toDF("user_id", "ts")
    val out = EventOps.cohortRetention(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val w0 = math.floor(d0.getTime * 1000.0 / 604800000000.0).toLong
    // d0 is mid-week in epoch terms, so +7d always lands in wk+1
    assert(out == Seq(
      (w0, 0L, 2L), (w0, 1L, 2L), (w0, 3L, 1L), (w0 + 1, 0L, 1L)), out.toString)
  }
}
