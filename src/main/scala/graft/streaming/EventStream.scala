package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery}

import graft.ops.Exact

/** Streaming pipeline over the events stream — the timeline /
  * event-time capability the reference's README implies (SURVEY.md
  * §0.1, §2.10). Structured Streaming only: `readStream` sources,
  * event-time windows + watermarks, `mapGroupsWithState` for custom
  * state. Each operator takes a streaming DataFrame and returns one,
  * so sources/sinks stay the caller's choice (file source in specs,
  * kafka-shaped sources in production — same plan).
  *
  * The batch twin of [[hourlyStats]] is `EventOps.hourlyStats`; the
  * differential spec asserts they agree on the same data, which is
  * the correctness story Structured Streaming's unified model is
  * built for.
  */
object EventStream {

  /** Tumbling 1-hour event-time aggregation with a watermark: late
    * rows beyond `watermark` are dropped, state is bounded (without a
    * watermark, window state grows forever — the 100 TB failure mode).
    * Output matches EventOps.hourlyStats: hour as epoch micros.
    */
  def hourlyStats(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Exact.moneySum(col("value")).as("sum_value"),
        Exact.meanOf(col("value")).as("avg_value"))
      .select(
        unix_micros(col("window.start")).as("hour"),
        col("event_type"), col("n_events"), col("sum_value"), col("avg_value"))

  /** SLIDING event-time windows (2-hour width, 1-hour slide): every
    * event lands in width/slide = 2 overlapping windows — the
    * trailing-window dashboard aggregate tumbling windows can't
    * express. Spark expands each row to its windows BEFORE the
    * partial aggregate, so the shuffle carries ≤ 2·|groups|
    * pre-aggregated rows, and the watermark bounds state exactly as
    * in the tumbling form.
    */
  def slidingStats(events: DataFrame, watermark: String = "3 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Exact.moneySum(col("value")).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("wstart"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based session windows (native session_window — state merges
    * adjacent windows, watermark evicts closed sessions).
    */
  def sessionStats(events: DataFrame, gap: String = "30 minutes",
                   watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("session_window.start")).as("session_start"),
        unix_micros(col("session_window.end")).as("session_end"),
        col("user_id"), col("n_events"))

  /** Stream-static enrichment: join the stream against a batch
    * dimension (re-planned per micro-batch, broadcast when small —
    * the standard way to decorate events with slowly-changing
    * reference data), then a watermarked windowed rollup per
    * enriched category.
    */
  def enrichedHourly(
      events: DataFrame, dim: DataFrame, joinKey: String,
      category: String, watermark: String = "2 hours"): DataFrame =
    events
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq(joinKey))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col(category))
      .agg(count(lit(1)).as("n_events"), Exact.moneySum(col("value")).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("hour"),
        col(category), col("n_events"), col("sum_value"))

  /** Watermarked STREAM-STREAM interval join: each `leftType` event
    * pairs with the same user's `rightType` events that follow within
    * `within`. Both sides carry watermarks and the join condition
    * bounds event time on BOTH ends — the two requirements for Spark
    * to evict buffered join state as the watermark advances. An
    * un-ranged stream-stream join buffers an entire side forever;
    * this shape runs with state bounded by (watermark + within) per
    * key, at any input rate. Inner join ⇒ matches emit as they occur
    * (append mode).
    */
  def correlatedPairs(
      events: DataFrame, leftType: String = "click", rightType: String = "view",
      within: String = "10 minutes", watermark: String = "2 hours"): DataFrame = {
    val a = events.filter(col("event_type") === leftType)
      .select(col("user_id").as("a_user"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"))
      .select(col("a_user").as("user_id"), col("a_id"), col("b_id"),
        unix_micros(col("a_ts")).as("a_us"), unix_micros(col("b_ts")).as("b_us"))
  }

  /** LEFT OUTER stream-stream interval join — [[correlatedPairs]]
    * with the unmatched-left arm: a click with NO view inside its
    * window emits (click, null) once the watermark passes the
    * window's close (Spark buffers the left row until
    * `a_ts + within` falls behind the watermark, THEN emits the null
    * arm — the only point at which "no match" is decidable on an
    * unbounded stream). Same bounded-state shape as the inner form:
    * both sides watermarked, the range condition bounds event time on
    * both ends, state ≤ rate·(watermark + within) per key. This is
    * the funnel-abandonment primitive: the null-arm rows ARE the
    * clicks that never converted.
    */
  def correlatedPairsOuter(
      events: DataFrame, leftType: String = "click", rightType: String = "view",
      within: String = "10 minutes", watermark: String = "2 hours"): DataFrame = {
    val a = events.filter(col("event_type") === leftType)
      .select(col("user_id").as("a_user"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      .withWatermark("a_ts", watermark)
    val b = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
      .withWatermark("b_ts", watermark)
    a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr(s"INTERVAL $within"),
      "left_outer")
      .select(col("a_user").as("user_id"), col("a_id"), col("b_id"),
        unix_micros(col("a_ts")).as("a_us"), unix_micros(col("b_ts")).as("b_us"))
  }

  /** Streaming exact dedup with BOUNDED state: drops re-deliveries of
    * the same `idCols` seen within the watermark horizon
    * (`dropDuplicatesWithinWatermark` — state for an id is evicted
    * once the watermark passes its first sighting, so state size is
    * rate·horizon, not the full history). This is the ingest-side
    * twin of the batch dedup family: at-least-once sources (REST
    * polls, kafka replays) re-deliver, and deduping AT INGEST keeps
    * re-deliveries out of the lake entirely. Exact-once per id is
    * only guaranteed for duplicates arriving within the horizon —
    * the documented (and the only state-bounded) contract.
    */
  def dedupedEvents(
      events: DataFrame, idCols: Seq[String] = Seq("event_id"),
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming exact dedup against the PERSISTED fingerprint index —
    * the ingest side of the incremental-dedup family.
    * [[dedupedEvents]] bounds re-delivery state to the watermark
    * horizon; only the index catches a duplicate of something
    * ingested LAST MONTH. Per micro-batch (foreachBatch — the batch
    * engine runs inside the stream, so the whole batch dedup family
    * applies unchanged):
    *
    *  1. fingerprint the batch, keep the min-doc_id row per fp
    *     (batch-internal dup collapse),
    *  2. anti-join the bucketed index (`Dedup.exactDedupIndex`
    *     substrate — history never shuffles),
    *  3. `emit` the survivors to the caller's sink,
    *  4. append the novel (fp, canonical_id) rows to the index,
    *     bucketed by fp — the same anti-join-append contract as the
    *     daily batch loop.
    *
    * Delivery is at-least-once: a crash between emit and append
    * re-emits that batch's docs on replay (the re-appended fps
    * anti-join away, so the INDEX stays consistent regardless).
    * Nothing driver-resident grows with history — all dedup state
    * lives in the bucketed table.
    */
  def globalDedupStream(
      docs: DataFrame, indexName: String, indexRoot: String,
      buckets: Int = 32, checkpoint: Option[String] = None,
      availableNow: Boolean = false)(
      emit: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val spark = batch.sparkSession
      val fp = batch.withColumn("fp", graft.ops.TextOps.fingerprint(col("text")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy("doc_id")
      val first = fp.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
      val exists = spark.catalog.tableExists(indexName)
      val novel =
        if (exists)
          first.join(
            graft.sinks.LakeWriter.readBucketedTable(spark, indexName),
            Seq("fp"), "left_anti")
        else first
      // two consumers (emit + index append) — evaluate once
      val cached = novel.persist()
      try {
        emit(cached.drop("fp"), batchId)
        // manifested commit: the batch's index rows become visible
        // atomically, so a concurrent probe never sees a torn append
        new graft.sinks.LakeWriter(indexRoot).commitBucketed(
          cached.select(col("fp"), col("doc_id").as("canonical_id")),
          indexName, buckets, Seq("fp"))
        ()
      } finally { cached.unpersist(); () }
    }
    val trig =
      if (availableNow)
        writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      else writer
    checkpoint.fold(trig)(trig.option("checkpointLocation", _)).start()
  }

  /** Streaming PARAGRAPH dedup — boilerplate stripping on the intake
    * path: each micro-batch of documents is paragraph-deduped against
    * the persisted first-occurrence index
    * ([[graft.ops.Dedup.paragraphIndex]], bucketed by pfp) plus the
    * batch itself, the cleaned documents are emitted, and the batch's
    * NOVEL paragraph firsts append to the index — so tomorrow's
    * stream sees today's chrome. Same durability contract as
    * [[globalDedupStream]]: replayed batches re-emit, and their
    * re-appended firsts anti-join away, keeping the index consistent;
    * no dedup state lives in the driver or in watermark-bounded
    * stores — a cookie banner from last year still dedups.
    */
  def paragraphDedupStream(
      docs: DataFrame, indexName: String, indexRoot: String,
      buckets: Int = 32, checkpoint: Option[String] = None,
      availableNow: Boolean = false)(
      emit: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val spark = batch.sparkSession
      val exists = spark.catalog.tableExists(indexName)
      // two consumers (clean + index append) re-read the batch —
      // persist the micro-batch once
      val b = batch.persist()
      // built INSIDE the try: from the first persist on, any throw
      // (plan analysis included) must reach the unpersist finally —
      // a leaked micro-batch cache lives for the stream's lifetime
      var cleaned: Dataset[Row] = null
      try {
        // indexWins: arrival order decides firstness on a stream — a
        // backfilled smaller doc_id must not re-emit a paragraph an
        // earlier batch already owns (the batch-mode least() rule
        // would, and the output corpus would carry the chrome twice)
        cleaned =
          (if (exists)
            graft.ops.Dedup.incrementalParagraphDedup(
              b, graft.sinks.LakeWriter.readBucketedTable(spark, indexName),
              indexWins = true)
          else graft.ops.Dedup.paragraphDedup(b)).persist()
        // materialized BEFORE the index grows: `cleaned` reads the
        // index table and the novel-firsts append below MUTATES it —
        // an emit that merely stages the plan (e.g. unions it into a
        // later write) would re-evaluate against the appended index
        // and lose this batch's own chrome. The eager count pins the
        // pre-append rows; emit receives the materialized cache.
        // (Consumption must still finish within this foreachBatch
        // invocation — the micro-batch source frame dies with it.)
        cleaned.count()
        emit(cleaned, batchId)
        val localIdx = graft.ops.Dedup.paragraphIndex(b)
        val novel =
          if (exists)
            localIdx.join(
              graft.sinks.LakeWriter.readBucketedTable(spark, indexName).select("pfp"),
              Seq("pfp"), "left_anti")
          else localIdx
        new graft.sinks.LakeWriter(indexRoot)
          .commitBucketed(novel, indexName, buckets, Seq("pfp"))
        ()
      } finally {
        b.unpersist()
        if (cleaned != null) cleaned.unpersist()
        ()
      }
    }
    val trig =
      if (availableNow)
        writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      else writer
    checkpoint.fold(trig)(trig.option("checkpointLocation", _)).start()
  }

  /** Streaming NEAR-dup detection against the persisted minhash
    * index — the last member of the index-backed intake family
    * (exact: [[globalDedupStream]]; paragraph:
    * [[paragraphDedupStream]]; near-dup: this). Per micro-batch:
    *
    *  1. probe: `Dedup.incrementalMinhashPairs(batch, index)` — the
    *     same bucketed band-key probe the daily batch loop runs
    *     (old×old unrepresentable; history never shuffles), plus the
    *     batch's internal pairs. First batch (no index yet) runs the
    *     full in-batch `minhashLshPairs`.
    *  2. emit the pairs — eagerly MATERIALIZED first (the probe plan
    *     reads the index tables step 3 mutates; same pinning rule as
    *     [[paragraphDedupStream]]).
    *  3. append the batch's band/token index rows, anti-joined by
    *     doc_id so a replayed batch never double-appends.
    *
    * Replay semantics are strictly stronger than the siblings': a
    * batch replayed AFTER its append still re-emits the same pairs,
    * because the probe tolerates the batch being in the index already
    * (same-id pairs are unrepresentable in the candidate rule, and
    * re-found pairs collapse in its distinct) — so emit is
    * at-least-once across a crash at ANY point, and the index stays
    * exactly-once by the anti-join.
    *
    * Batch dedup pipelines persist mid-plan frames into the Dedup
    * module ledger; a long-running stream must not accumulate them,
    * so each batch releases that ledger after its terminal actions —
    * don't run a CONCURRENT batch Dedup pipeline on this session
    * while the stream is live (the release could force its mid-plan
    * frames to recompute).
    */
  def nearDupStream(
      docs: DataFrame, indexName: String, indexRoot: String,
      threshold: Double = 0.5, k: Int = 16, bands: Int = 4,
      buckets: Int = 32, checkpoint: Option[String] = None,
      availableNow: Boolean = false)(
      emit: (DataFrame, Long) => Unit): StreamingQuery = {
    val writer = docs.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val spark = batch.sparkSession
      val exists = spark.catalog.tableExists(s"${indexName}_bands")
      val b = batch.persist()
      // built INSIDE the try (same rule as paragraphDedupStream): a
      // throwing probe-plan build must still unpersist the batch —
      // the pipeline's Dedup ledger entries are likewise released in
      // the finally, whichever point the build died at
      var pairs: Dataset[Row] = null
      try {
        pairs =
          (if (exists)
            graft.ops.Dedup.incrementalMinhashPairs(
              b, graft.ops.Dedup.readMinhashIndex(spark, indexName),
              threshold, k, bands)
          else graft.ops.Dedup.minhashLshPairs(b, threshold, k, bands)).persist()
        pairs.count() // pin pre-append results (the plan reads the index)
        emit(pairs, batchId)
        val local = graft.ops.Dedup.minhashIndexFrames(b, k, bands)
        val (novelBands, novelToks) =
          if (exists) {
            val indexed = graft.sinks.LakeWriter
              .readBucketedTable(spark, s"${indexName}_toks").select("doc_id")
            (local.bands.join(indexed, Seq("doc_id"), "left_anti"),
              local.toks.join(indexed, Seq("doc_id"), "left_anti"))
          } else (local.bands, local.toks)
        val w = new graft.sinks.LakeWriter(indexRoot)
        w.commitBucketed(novelBands, s"${indexName}_bands", buckets, Seq("bkey"))
        w.commitBucketed(novelToks, s"${indexName}_toks", buckets, Seq("doc_id"))
        ()
      } finally {
        b.unpersist()
        if (pairs != null) pairs.unpersist()
        graft.ops.Dedup.releaseCaches()
      }
    }
    val trig =
      if (availableNow)
        writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      else writer
    checkpoint.fold(trig)(trig.option("checkpointLocation", _)).start()
  }

  /** Streaming IMAGE near-dup intake against the persisted aHash
    * index — the multimodal member of the index-backed intake family
    * (exact/paragraph/near-dup text intakes above); media arrives
    * incrementally too (the reference re-crawls monthly,
    * `dota_extraction.yml:4-6`). Per micro-batch:
    *
    *  1. decode ONCE into the batch's 8-byte chunk-hash frame (the
    *     only thing that ever shuffles — pixels stay in the batch);
    *  2. probe: the same pigeonhole candidate join the batch path
    *     runs ([[graft.multimodal.MediaOps.incrementalImageNearDup]]),
    *     new×index plus new×new; first batch probes an empty index
    *     slice of itself, leaving exactly the in-batch pairs;
    *  3. emit the pairs — materialized BEFORE the index grows (the
    *     probe plan reads the table step 4 appends to);
    *  4. append the batch's NOVEL chunk rows (anti-join by media_id),
    *     as one atomic manifested commit.
    *
    * Replay semantics match [[nearDupStream]]: a batch replayed after
    * its append re-emits the same pairs (self-pairs are
    * unrepresentable, re-found pairs collapse in distinct), and the
    * index stays exactly-once by the anti-join — which is also why
    * this path probes the candidate rule directly rather than through
    * `incrementalImageNearDup`, whose id-disjointness guard would
    * correctly reject a replayed batch.
    */
  def imageNearDupStream(
      media: DataFrame, indexName: String, indexRoot: String,
      decoder: graft.multimodal.MediaOps.ImageDecoder =
        graft.multimodal.MediaOps.StubDecoder,
      maxHamming: Int = 5, buckets: Int = 32,
      checkpoint: Option[String] = None, availableNow: Boolean = false)(
      emit: (DataFrame, Long) => Unit): StreamingQuery = {
    val M = graft.multimodal.MediaOps
    val writer = media.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val spark = batch.sparkSession
      val exists = spark.catalog.tableExists(s"${indexName}_chunks")
      // persisted: the decoded hash frame has two consumers (probe +
      // novel append) — without the cache every image decodes twice
      val newChunks = M.chunkHashes(M.imageHashes(batch, decoder), maxHamming).persist()
      var pairs: Dataset[Row] = null
      try {
        val idx =
          if (exists) M.readImageHashIndex(spark, indexName)
          else newChunks.limit(0) // schema-true empty: in-batch arm only
        pairs = M.incrementalImageCandidates(newChunks, idx)
          .distinct()
          .filter(col("hamming") <= maxHamming)
          .persist()
        pairs.count() // pin pre-append results (the plan reads the index)
        emit(pairs, batchId)
        val novel =
          if (exists)
            newChunks.join(idx.select("media_id").distinct(),
              Seq("media_id"), "left_anti")
          else newChunks
        M.writeImageHashIndex(novel,
          new graft.sinks.LakeWriter(indexRoot, mode = "append"),
          indexName, buckets)
      } finally {
        newChunks.unpersist()
        if (pairs != null) pairs.unpersist()
        ()
      }
    }
    val trig =
      if (availableNow)
        writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      else writer
    checkpoint.fold(trig)(trig.option("checkpointLocation", _)).start()
  }

  /** Streaming AUDIO near-dup intake against the persisted envelope-
    * hash index — [[imageNearDupStream]] for the audio member: per
    * batch, decode once into per-window chunk hashes, probe the
    * (chunk, ckey, start_ms) candidate join (new×index + new×new),
    * emit materialized pairs, append the novel rows as one manifested
    * commit. `windowMs`/`strideMs`/`maxHamming` MUST equal the index
    * build's (the [[graft.multimodal.MediaOps.audioHashIndexFrame]]
    * contract — different values change window grids or chunk widths
    * and silently drop true candidates). Same replay semantics as
    * [[imageNearDupStream]].
    */
  def audioNearDupStream(
      media: DataFrame, indexName: String, indexRoot: String,
      decoder: graft.multimodal.MediaOps.AudioDecoder =
        graft.multimodal.MediaOps.StubAudioDecoder,
      windowMs: Long = 10000L, strideMs: Long = 5000L,
      maxHamming: Int = 5, buckets: Int = 32,
      checkpoint: Option[String] = None, availableNow: Boolean = false)(
      emit: (DataFrame, Long) => Unit): StreamingQuery = {
    val M = graft.multimodal.MediaOps
    val writer = media.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      val spark = batch.sparkSession
      val exists = spark.catalog.tableExists(s"${indexName}_achunks")
      val newChunks = M.pigeonholeChunks(
        M.audioFingerprints(batch, decoder, windowMs, strideMs),
        "fhash", maxHamming).persist()
      var pairs: Dataset[Row] = null
      try {
        val idx =
          if (exists) M.readAudioHashIndex(spark, indexName)
          else newChunks.limit(0)
        pairs = M.incrementalAudioCandidates(newChunks, idx)
          .distinct()
          .filter(col("hamming") <= maxHamming)
          .persist()
        pairs.count()
        emit(pairs, batchId)
        val novel =
          if (exists)
            newChunks.join(idx.select("media_id").distinct(),
              Seq("media_id"), "left_anti")
          else newChunks
        M.writeAudioHashIndex(novel,
          new graft.sinks.LakeWriter(indexRoot, mode = "append"),
          indexName, buckets)
      } finally {
        newChunks.unpersist()
        if (pairs != null) pairs.unpersist()
        ()
      }
    }
    val trig =
      if (availableNow)
        writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      else writer
    checkpoint.fold(trig)(trig.option("checkpointLocation", _)).start()
  }

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

  /** Custom keyed state via mapGroupsWithState: per-user running
    * event count + value total, updated per micro-batch. The state is
    * one tiny record per key — the shape that scales to any key
    * cardinality because Spark shards state by key across executors.
    */
  def runningTotals(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(userId, 0L, 0.0))
          val next = rows.foldLeft(prev)((acc, e) =>
            UserRunning(userId, acc.n_events + 1, acc.total_value + e.value))
          state.update(next)
          next
      }
  }

  final case class FunnelEvent(
      user_id: Long, event_type: String, us: Long, event_id: Long)
  final case class FunnelProgress(user_id: Long, stage: Long,
      t1: Option[Long], t2: Option[Long], t3: Option[Long])

  /** STREAMING FUNNEL: per-user ordered-step progress
    * ([[graft.ops.EventOps.funnel]]'s rule — step i+1 counts only
    * strictly after the first completion of step i) maintained as one
    * tiny keyed-state record, updated per micro-batch. Each batch's
    * group rows fold in (us, event_id) order, so a batch replays in
    * event-time order; under time-ordered arrival across batches (the
    * gate's time-contiguous shards) the first qualifying event
    * encountered IS the batch rule's min, and the final state equals
    * the batch funnel row bit-for-bit — whatever the shard cut or
    * restart points. Users who never complete step 1 carry stage 0
    * (the gate filters them, matching the batch output's absence).
    */
  def funnelProgress(events: Dataset[FunnelEvent],
      steps: Seq[String] = Seq("view", "click", "purchase")): Dataset[FunnelProgress] = {
    require(steps.size == 3, "funnelProgress pins the 3-step state shape")
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          var st = state.getOption.getOrElse(
            FunnelProgress(userId, 0L, None, None, None))
          rows.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
            if (e.event_type == steps(0) && st.t1.isEmpty)
              st = st.copy(t1 = Some(e.us))
            else if (e.event_type == steps(1) && st.t2.isEmpty &&
                st.t1.exists(e.us > _))
              st = st.copy(t2 = Some(e.us))
            else if (e.event_type == steps(2) && st.t3.isEmpty &&
                st.t2.exists(e.us > _))
              st = st.copy(t3 = Some(e.us))
          }
          val next = st.copy(stage =
            Seq(st.t1, st.t2, st.t3).count(_.isDefined).toLong)
          state.update(next)
          next
      }
  }

  final case class UserRunningExact(user_id: Long, n_events: Long, q_total: Long)

  /** [[runningTotals]] with a GATE-EXACT accumulator: the raw-double
    * fold above accumulates in arrival order (last-ulp noise across
    * replays and shard cuts), so its totals can't hash-match a batch
    * twin. Here the state carries the per-row quantized INTEGER
    * `floor(value·10⁴ + 0.5)` (the [[graft.ops.Exact.moneySum]]
    * per-row step) — integer addition is order-free, so the final
    * state after any micro-batch arrival order, restart, or shard cut
    * equals the batch integer sum bit-for-bit; the caller defers the
    * one /10⁴ division if it wants money units.
    */
  def runningTotalsExact(events: Dataset[UserEvent]): Dataset[UserRunningExact] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserRunningExact]) =>
          val prev = state.getOption.getOrElse(UserRunningExact(userId, 0L, 0L))
          val next = rows.foldLeft(prev)((acc, e) =>
            UserRunningExact(userId, acc.n_events + 1,
              acc.q_total + math.floor(e.value * 10000.0 + 0.5).toLong))
          state.update(next)
          next
      }
  }

  /** Convenience: run a streaming frame to completion against all
    * currently-available input (Trigger.AvailableNow) into an
    * in-memory table; used by specs and local smoke runs.
    */
  def runAvailableNow(df: DataFrame, queryName: String, outputMode: String = "append"): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
