package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.EventOps

/** Streaming correctness via the unified-model differential: the same
  * operator over readStream micro-batches must equal its batch twin
  * on identical data. File source + AvailableNow trigger + memory
  * sink — no timers, fully deterministic.
  */
class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events_stream").toString + "/data"
    val events = Seq(
      (1L, "click", ts("2026-01-01 10:05:00"), 1.5, 1L),
      (2L, "click", ts("2026-01-01 10:55:00"), 2.5, 1L),
      (3L, "view", ts("2026-01-01 11:10:00"), 10.0, 2L),
      (4L, "view", ts("2026-01-01 11:40:00"), 4.0, 2L),
      (5L, "click", ts("2026-01-01 12:01:00"), 8.0, 1L)
    ).toDF("event_id", "event_type", "ts", "value", "user_id")
    events.write.parquet(dir)
    dir
  }

  private def streamingEvents = {
    val schema = spark.read.parquet(eventsDir).schema
    spark.readStream.schema(schema).parquet(eventsDir)
  }

  test("streaming hourlyStats equals the batch twin on the same data") {
    // complete mode: append would hold back windows the (final)
    // watermark hasn't passed — on a finite input that's ALL of them
    EventStream.runAvailableNow(
      EventStream.hourlyStats(streamingEvents), "hourly_diff", outputMode = "complete")
    val streamed = spark.table("hourly_diff").orderBy("hour", "event_type").collect()
    val batch = EventOps.hourlyStats(spark.read.parquet(eventsDir)).collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("hourlyGate: time-sharded micro-batches with per-shard restarts == batch twin") {
    val ev = spark.read.parquet(eventsDir)
    val gated = StreamGates.hourlyGate(ev, nShards = 3).collect()
    val batch = EventOps.hourlyStats(ev).collect()
    assert(gated.toSeq == batch.toSeq)
    assert(gated.nonEmpty)
  }

  test("sessionGate: sessions merge across shard boundaries and restarts == lag-gap batch rule") {
    import org.apache.spark.sql.functions.{col, expr, lag, min => fmin, max => fmax, count => fcount, sum => fsum, unix_micros}
    import org.apache.spark.sql.expressions.Window
    val ev = spark.read.parquet(eventsDir)
    val gated = StreamGates.sessionGate(ev, nShards = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // batch lag-gap twin (the q22 rule, per session, end = last + gap)
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val batch = ev.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("is_new",
        expr("CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL " +
          "OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000 " +
          "THEN 1 ELSE 0 END"))
      .withColumn("session_id", fsum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(fmin("us").as("session_start"),
        (fmax("us") + 1800000000L).as("session_end"),
        fcount(org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .select("session_start", "session_end", "user_id", "n_events")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gated == batch)
    assert(gated.nonEmpty)
  }

  test("runningTotalsGate: state restores across restarts, final == batch integer sums") {
    import org.apache.spark.sql.functions.{col, count => fcount, expr, sum => fsum, lit}
    val ev = spark.read.parquet(eventsDir)
    val gated = StreamGates.runningTotalsGate(ev, nShards = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = ev.groupBy("user_id")
      .agg(fcount(lit(1)).as("n_events"),
        fsum(expr("CAST(floor(value*10000.0+0.5) AS BIGINT)")).as("q_total"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gated == batch)
    assert(gated.nonEmpty)
  }

  test("funnelGate: per-user funnel state survives restarts — steps straddling " +
      "shard boundaries still complete; equals the batch funnel") {
    // u1's three steps are far apart in time, so 3 time shards cut
    // BETWEEN them: the (t1, t2) state must restore across two cold
    // restarts for stage 3 to emerge. u2 clicks before viewing.
    val ev = Seq(
      (11L, "view", ts("2026-01-01 01:00:00"), 1L),
      (12L, "click", ts("2026-01-01 09:00:00"), 1L),
      (13L, "purchase", ts("2026-01-01 21:00:00"), 1L),
      (14L, "click", ts("2026-01-01 01:30:00"), 2L),
      (15L, "view", ts("2026-01-01 08:30:00"), 2L),
      (16L, "click", ts("2026-01-01 20:30:00"), 2L)
    ).toDF("event_id", "event_type", "ts", "user_id")
    val gated = StreamGates.funnelGate(ev, nShards = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gated == Seq((1L, 3L), (2L, 2L)), gated.toString)
    val batch = graft.ops.EventOps.funnel(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gated == batch)
  }

  test("enrichedGate: per-batch broadcast dim join + hourly rollup == batch twin") {
    import org.apache.spark.sql.functions.{col, count => fcount, lit, unix_micros, date_trunc}
    val ev = spark.read.parquet(eventsDir)
    val dim = Seq((1L, "AUTO"), (2L, "HOUSE")).toDF("c_custkey", "c_mktsegment")
    val gated = StreamGates.enrichedGate(ev, dim, nShards = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    val batch = ev.join(dim, col("user_id") === col("c_custkey"))
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour"), col("c_mktsegment"))
      .agg(fcount(lit(1)).as("n_events"),
        graft.ops.Exact.moneySum(col("value")).as("sum_value"))
      .orderBy("hour", "c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(gated == batch)
    assert(gated.nonEmpty)
  }

  test("correlatedGate: interval-join state survives restarts — cross-shard pairs emit once") {
    import org.apache.spark.sql.functions.col
    // span 10:00–11:30 cut into 3 shards at 10:30 and 11:00; two of
    // the three qualifying pairs straddle a shard (= restart) boundary
    val dir = Files.createTempDirectory("events_corr").toString + "/data"
    Seq(
      (10L, "click", ts("2026-01-01 10:00:00"), 1.0, 1L),
      (11L, "view", ts("2026-01-01 10:05:00"), 1.0, 1L),  // pair with 10 (in-shard)
      (12L, "click", ts("2026-01-01 10:29:00"), 1.0, 1L),
      (13L, "view", ts("2026-01-01 10:31:00"), 1.0, 1L),  // pair with 12 (cross-shard)
      (14L, "click", ts("2026-01-01 10:58:00"), 1.0, 2L),
      (15L, "view", ts("2026-01-01 11:05:00"), 1.0, 2L),  // pair with 14 (cross-shard)
      (16L, "click", ts("2026-01-01 11:30:00"), 1.0, 3L)  // no view follows
    ).toDF("event_id", "event_type", "ts", "value", "user_id")
      .write.parquet(dir)
    val ev = spark.read.parquet(dir)
    val gated = StreamGates.correlatedGate(ev, nShards = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gated == Seq((1L, 10L, 11L), (1L, 12L, 13L), (2L, 14L, 15L)),
      s"expected the three planted pairs exactly once: $gated")
  }

  test("session windows close on gap and count events") {
    EventStream.runAvailableNow(
      EventStream.sessionStats(streamingEvents, gap = "30 minutes"), "sessions",
      outputMode = "complete")
    val out = spark.table("sessions").orderBy("user_id", "session_start").collect()
    // user 1: 10:05 alone, 10:55 alone (50 min gap), 12:01 alone
    // user 2: 11:10+11:40 → one session (exactly 30 min gap merges)
    assert(out.count(_.getLong(2) == 1L) == 3)
    val u2 = out.filter(_.getLong(2) == 2L)
    assert(u2.length == 1 && u2(0).getLong(3) == 2L)
  }

  test("stream-static join enriches events against a batch dimension") {
    val dim = Seq(("click", "interactive"), ("view", "passive")).toDF("event_type", "category")
    EventStream.runAvailableNow(
      EventStream.enrichedHourly(streamingEvents, dim, "event_type", "category"),
      "enriched", outputMode = "complete")
    val out = spark.table("enriched").orderBy("hour", "category").collect()
    // clicks at 10:05+10:55 (interactive), views at 11:10+11:40
    // (passive), click at 12:01 (interactive)
    assert(out.map(_.getString(1)).toSeq == Seq("interactive", "passive", "interactive"))
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 2L, 1L))
    assert(out(1).getDouble(3) == 14.0)
  }

  test("stream-stream interval join pairs clicks with in-window views only") {
    val dir = Files.createTempDirectory("events_ss").toString + "/data"
    Seq(
      (1L, "click", ts("2026-01-01 10:00:00"), 0.0, 1L),
      (2L, "view", ts("2026-01-01 10:05:00"), 0.0, 1L), // within 10 min of click 1
      (3L, "view", ts("2026-01-01 10:20:00"), 0.0, 1L), // 20 min later → out of window
      (4L, "click", ts("2026-01-01 11:00:00"), 0.0, 2L),
      (5L, "view", ts("2026-01-01 11:01:00"), 0.0, 2L), // within
      (6L, "view", ts("2026-01-01 11:30:00"), 0.0, 3L) // no click for user 3
    ).toDF("event_id", "event_type", "ts", "value", "user_id").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    EventStream.runAvailableNow(
      EventStream.correlatedPairs(stream), "ss_pairs", outputMode = "append")
    val got = spark.table("ss_pairs").orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L), (4L, 5L)))
  }

  test("streaming dedup drops in-horizon re-deliveries, state stays bounded by watermark") {
    val dir = Files.createTempDirectory("events_dup").toString + "/data"
    Seq(
      (1L, "click", ts("2026-01-01 10:00:00"), 1.0, 1L),
      (1L, "click", ts("2026-01-01 10:00:30"), 1.0, 1L), // re-delivery of event 1
      (2L, "view", ts("2026-01-01 10:05:00"), 2.0, 1L),
      (2L, "view", ts("2026-01-01 10:05:00"), 2.0, 1L), // exact re-delivery
      (3L, "click", ts("2026-01-01 10:10:00"), 3.0, 2L)
    ).toDF("event_id", "event_type", "ts", "value", "user_id").write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    EventStream.runAvailableNow(
      EventStream.dedupedEvents(stream), "dedup_stream", outputMode = "append")
    val got = spark.table("dedup_stream").select("event_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("mapGroupsWithState running totals accumulate per user") {
    val stream = streamingEvents
      .selectExpr("user_id", "value").as[EventStream.UserEvent]
    EventStream.runAvailableNow(
      EventStream.runningTotals(stream).toDF(), "running", outputMode = "update")
    val last = spark.table("running")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.max("n_events").as("n"),
           org.apache.spark.sql.functions.max("total_value").as("t"))
      .orderBy("user_id").collect()
    assert(last(0) == Row(1L, 3L, 12.0))
    assert(last(1) == Row(2L, 2L, 14.0))
  }

  test("globalDedupStream: fp-index dedup across micro-batches AND restarts") {
    val in = Files.createTempDirectory("gds_in").toString
    val cp = Files.createTempDirectory("gds_cp").toString
    val idxRoot = Files.createTempDirectory("gds_idx").toString
    val emitted = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    def run(tag: Int): Unit = {
      val docs = spark.readStream.schema("doc_id LONG, text STRING").parquet(in)
      val q = EventStream.globalDedupStream(
        docs, "gds_idx", idxRoot, buckets = 4,
        checkpoint = Some(cp), availableNow = true) { (out, _) =>
        emitted ++= out.select("doc_id").collect().map(r => tag -> r.getLong(0))
      }
      q.awaitTermination()
    }
    try {
      // run 1: in-batch dup (2 of 1) collapses; 1 and 3 survive
      Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta"))
        .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
      run(1)
      assert(emitted.filter(_._1 == 1).map(_._2).sorted == Seq(1L, 3L))
      // run 2 (a RESTART — fresh query, same checkpoint + index):
      // 4 duplicates run 1's history and must be caught by the INDEX,
      // which no watermark-horizon dedup could do; 5 is novel
      Seq((4L, "alpha beta"), (5L, "epsilon zeta"))
        .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
      run(2)
      assert(emitted.filter(_._1 == 2).map(_._2).sorted == Seq(5L))
      // the index holds one row per distinct text, min doc_id kept
      assert(spark.table("gds_idx").collect()
        .map(r => r.getLong(1)).sorted.toSeq == Seq(1L, 3L, 5L))
    } finally spark.sql("DROP TABLE IF EXISTS gds_idx")
  }

  test("a throwing batch-plan build does not leak the micro-batch cache") {
    // sabotage: the index table EXISTS but lacks the pfp column, so
    // building the incremental-dedup plan throws during analysis —
    // after the first persist, before any action. The unpersist must
    // still run or the leaked cache lives for the stream's lifetime.
    val in = Files.createTempDirectory("leak_in").toString + "/data"
    val idxRoot = Files.createTempDirectory("leak_idx").toString
    Seq((1L, "some text\n\nmore text")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(in)
    Seq((1L, "junk")).toDF("not_pfp", "v").write
      .option("path", s"$idxRoot/leak_bad_idx").saveAsTable("leak_bad_idx")
    // the leak is a CacheManager entry (the persist is never
    // materialized before the throw, so getPersistentRDDs can't see
    // it); cacheManager is private[sql] — reflection reads it
    def cacheIsEmpty: Boolean = {
      val ss = spark.sharedState
      val cm = ss.getClass.getMethod("cacheManager").invoke(ss)
      cm.getClass.getMethod("isEmpty").invoke(cm).asInstanceOf[Boolean]
    }
    spark.catalog.clearCache()
    assert(cacheIsEmpty)
    try {
      val docs = spark.readStream.schema("doc_id LONG, text STRING").parquet(in)
      val q = EventStream.paragraphDedupStream(
        docs, "leak_bad_idx", idxRoot, buckets = 4,
        availableNow = true) { (_, _) => () }
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination()
      }
      assert(cacheIsEmpty,
        "the failed batch must unpersist its micro-batch cache")
    } finally spark.sql("DROP TABLE IF EXISTS leak_bad_idx")
  }

  test("paragraphDedupStream: index-backed boilerplate stripping across batches and restarts") {
    val in = Files.createTempDirectory("pds_in").toString
    val cp = Files.createTempDirectory("pds_cp").toString
    val idxRoot = Files.createTempDirectory("pds_idx").toString
    val emitted = scala.collection.mutable.Map[Long, (Long, Long, String)]()
    def run(): Unit = {
      val docs = spark.readStream.schema("doc_id LONG, text STRING").parquet(in)
      val q = EventStream.paragraphDedupStream(
        docs, "pds_idx", idxRoot, buckets = 4,
        checkpoint = Some(cp), availableNow = true) { (out, _) =>
        emitted ++= out.collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      }
      q.awaitTermination()
    }
    try {
      // batch 1: docs share a banner paragraph; doc 1 claims it
      Seq(
        (1L, "banner text\n\ncontent one"),
        (2L, "banner text\n\ncontent two"))
        .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
      run()
      assert(emitted(1L) == ((2L, 2L, "banner text\n\ncontent one")))
      assert(emitted(2L) == ((2L, 1L, "content two")))
      // batch 2 after a RESTART: the banner arrives again a batch
      // later — only the persisted INDEX can catch it
      Seq((3L, "banner text\n\ncontent three"))
        .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
      run()
      assert(emitted(3L) == ((2L, 1L, "content three")))
      // index holds one first per distinct paragraph (banner + 3 contents)
      assert(spark.table("pds_idx").count() == 4)
      // batch 3 BACKFILLS a smaller doc_id carrying the same banner:
      // arrival order decides firstness on a stream (indexWins), so
      // the banner is still stripped — the batch-mode least() rule
      // would have re-emitted it
      Seq((0L, "banner text\n\nbackfill content"))
        .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
      run()
      assert(emitted(0L) == ((2L, 1L, "backfill content")))
    } finally spark.sql("DROP TABLE IF EXISTS pds_idx")
  }

  test("nearDupStream: minhash-index near-dup pairs across batches and restarts") {
    val in = Files.createTempDirectory("nds_in").toString
    val cp = Files.createTempDirectory("nds_cp").toString
    val idxRoot = Files.createTempDirectory("nds_idx").toString
    val emitted = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    def run(tag: Int): Unit = {
      val docs = spark.readStream.schema("doc_id LONG, text STRING").parquet(in)
      val q = EventStream.nearDupStream(
        docs, "nds_idx", idxRoot, threshold = 0.5, buckets = 4,
        checkpoint = Some(cp), availableNow = true) { (out, _) =>
        emitted ++= out.select("doc_a", "doc_b").collect()
          .map(r => (tag, r.getLong(0), r.getLong(1)))
      }
      q.awaitTermination()
    }
    try {
      // batch 1: 1 and 2 are near-dups (7 of 9 tokens shared); 3 is far
      Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "alpha beta gamma delta epsilon zeta eta iota kappa"),
        (3L, "one two three four"))
        .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
      run(1)
      assert(emitted.filter(_._1 == 1).map(t => (t._2, t._3)) == Seq((1L, 2L)))
      // batch 2 after a RESTART: 4 near-dups doc 1 from LAST batch —
      // only the persisted index can see that pair; 5 is novel
      Seq(
        (4L, "alpha beta gamma delta epsilon zeta eta psi"),
        (5L, "five six seven eight"))
        .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(in)
      run(2)
      val got2 = emitted.filter(_._1 == 2).map(t => (t._2, t._3)).sorted
      assert(got2 == Seq((1L, 4L), (2L, 4L)))
      // the streamed emissions equal the batch recompute restricted to
      // pairs involving each arrival wave — the unified-model check
      val all = spark.read.parquet(in)
      val batchTwin = graft.ops.Dedup.minhashLshPairs(all, 0.5)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(emitted.map(t => (t._2, t._3)).toSet == batchTwin)
      // index grew exactly once per doc (replay-safe anti-join)
      assert(spark.table("nds_idx_toks").select("doc_id").distinct().count() == 5)
    } finally {
      spark.sql("DROP TABLE IF EXISTS nds_idx_bands")
      spark.sql("DROP TABLE IF EXISTS nds_idx_toks")
      ()
    }
  }
}
