package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-oriented operators over the `events` table — the timeline /
  * event-processing capability the reference's README implies
  * (SURVEY.md §0.1: match timelines, gold curves, teamfight windows).
  *
  * The two non-trivial operators Spark lacks natively — bounded range
  * join and as-of join — are built the scalable way:
  *  - range join: bucketize time, explode one side into adjacent
  *    buckets, equi-join on (key, bucket), post-filter the exact
  *    predicate. Turns an O(n·m) theta join into a co-partitioned
  *    equi-join; this is what Databricks' range-join hint does.
  *  - as-of join: union both sides, one window pass per key carrying
  *    the last right-side value forward. One shuffle, no point lookups.
  */
object EventOps {

  /** JSON property extraction + aggregation. `get_json_object` is a
    * codegen'd path expression — no UDF; at scale prefer parsing once
    * with `from_json` into a struct column if many keys are read.
    */
  def jsonProps(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(
        Exact.meanOfLong(col("k")).as("avg_k"),
        min("k").as("min_k"),
        max("k").as("max_k"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Tumbling-hour aggregation (batch twin of the streaming pipeline).
    * The hour bucket is emitted as epoch MICROS (BIGINT), not a
    * timestamp: parquet/arrow timestamp columns carry tz-awareness
    * metadata that differs between engines (LTZ vs naive) and fails
    * the value compare even when the instants are identical.
    */
  def hourlyStats(events: DataFrame): DataFrame =
    events
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Exact.moneySum(col("value")).as("sum_value"),
        Exact.meanOf(col("value")).as("avg_value"))
      .orderBy("hour", "event_type")

  /** Bounded range join: pairs of events of the same user within
    * `windowSec` after each other. Bucket width == window so a right
    * row at bucket b only ever matches left rows in {b-1, b}; the left
    * side explodes into 2 buckets and the join is a plain equi-join on
    * (user_id, bucket) — co-partitioned, AQE-skew-splittable.
    */
  def eventBursts(events: DataFrame, windowSec: Long = 600L): DataFrame = {
    val wus = windowSec * 1000000L // window in microseconds (timestamp precision)
    val a = events.select(
      col("user_id").as("ua"), col("event_id").as("ea"),
      col("event_type").as("ta"), unix_micros(col("ts")).as("tsa"))
    val b = events.select(
      col("user_id").as("ub"), col("event_id").as("eb"),
      col("event_type").as("tb"), unix_micros(col("ts")).as("tsb"))
    val aExpl = a.withColumn(
      "bucket",
      explode(array((col("tsa") / wus).cast("long"), (col("tsa") / wus).cast("long") + 1)))
    val bBuck = b.withColumn("bucket", (col("tsb") / wus).cast("long"))
    aExpl
      .join(bBuck, Seq("bucket"))
      .filter(
        col("ua") === col("ub") && col("ea") =!= col("eb") &&
          col("tsb") > col("tsa") && col("tsb") <= col("tsa") + wus)
      .groupBy(col("ta").as("type_first"), col("tb").as("type_next"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("type_first", "type_next")
  }

  /** Generic as-of join: for each left row, the latest right row with
    * `right.time <= left.time` on the same key. Implementation: union
    * the two sides, a single window pass per key ordered by (time,
    * side) carries the last right value forward; right rows sort
    * before left rows at equal time (>= semantics). One shuffle on the
    * key; at 100 TB this beats per-row lookups or a theta join by
    * orders of magnitude and never materializes candidate pairs.
    *
    * `right` must be unique per (key, time) — dedupe first, as the tie
    * winner is otherwise engine-dependent.
    */
  def asofJoin(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val (l2, r2, lCols) =
      asofPrep(left, leftKey, leftTime, right, rightKey, rightTime, rightPayload)
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy("_k").orderBy("_t", "_side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned)((d, c) =>
      d.withColumn(s"_p_$c", last(col(s"_p_$c"), ignoreNulls = true).over(w)))
    asofProject(filled, lCols, rightPayload)
  }

  /** Shared prep for both as-of forms: left/right projected into the
    * reserved `_k`/`_t`/`_side`/`_p_*` shape. The right side is
    * projected into prefixed temporaries BEFORE any union — a
    * payload/key column sharing a name with a left column (both sides
    * having `ts`, say) must never be dropped or rebound.
    */
  private def asofPrep(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightPayload: Seq[String],
      extraReserved: Set[String] = Set.empty): (DataFrame, DataFrame, Array[String]) = {
    val lCols = left.columns
    // only the names THIS form actually binds are reserved — the plain
    // form must keep accepting a left column named _b
    val reserved = Set("_k", "_t", "_side") ++ extraReserved
    require(!lCols.exists(c => reserved(c) || c.startsWith("_p_")),
      s"left columns may not use reserved asof names (${reserved.mkString("/")}/_p_*): ${lCols.mkString(",")}")
    val l2 = rightPayload.foldLeft(
      left.withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
        .withColumn("_side", lit(1)))(
      (d, c) => d.withColumn(s"_p_$c", lit(null).cast(right.schema(c).dataType)))
    val r2 = right.select(
      (Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side")) ++
        rightPayload.map(c => col(c).as(s"_p_$c"))): _*)
    (l2, r2, lCols)
  }

  private def asofProject(
      filled: DataFrame, lCols: Array[String], rightPayload: Seq[String]): DataFrame =
    filled
      .filter(col("_side") === 1)
      .select((lCols.map(col) ++ rightPayload.map { c =>
        // a payload sharing a left column's name surfaces as <c>_right
        // instead of silently producing a duplicate/ambiguous column
        val out = if (lCols.contains(c)) s"${c}_right" else c
        col(s"_p_$c").as(out)
      }): _*)

  /** [[asofJoin]] with time-range bucketing — the skew-resilient form.
    * The window form serializes each key into one task, so a mega-hot
    * key (one user with 10⁹ events) becomes one straggler at scale.
    * Here the window partitions by (key, time-bucket): a hot key
    * splits across as many tasks as it spans buckets. Identical
    * output to [[asofJoin]] (the spec proves it differentially):
    *
    *  1. per (key, bucket): the LAST right row of that bucket — a
    *     partial-aggregating groupBy (`max_by` per payload; ties
    *     impossible, right is unique per (key, time));
    *  2. carry-in: each bucket-summary becomes available from the
    *     NEXT bucket onward (summaries shifted to bucket+1, merged
    *     with the left's bucket list, one `last` sweep per key — rows
    *     here are per-BUCKET, not per-event, so even a hot key's
    *     serial sweep is trivial);
    *  3. main pass: in-bucket rows plus one synthetic carry row per
    *     (key, left-bucket) at `_tl` = MIN_VALUE, then the same
    *     last-right-forward window as the plain form, now partitioned
    *     by (key, bucket).
    *
    * `bucketUs` is in the time column's LONG units (micros for
    * timestamps). Pick it so a bucket holds minutes-to-hours of a hot
    * key's traffic: too fine costs carry rows, too coarse under-splits.
    */
  def asofJoinBucketed(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightPayload: Seq[String], bucketUs: Long = 3600L * 1000000L): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}
    val (l2, r2, lCols) =
      asofPrep(left, leftKey, leftTime, right, rightKey, rightTime, rightPayload,
        extraReserved = Set("_b", "_tl", "_lt"))
    def asLong(side: String, srcType: DataType): Column = srcType match {
      case TimestampType => unix_micros(col("_t"))
      // parquet timestamps without a zone read back as NTZ (the
      // testdata tables do); map the wall-clock through the session
      // zone — exact and monotone under the pinned-UTC GraftSession
      // contract (Tables.scala), which every entry point uses
      case TimestampNTZType => unix_micros(col("_t").cast(TimestampType))
      case ByteType | ShortType | IntegerType | LongType => col("_t").cast("long")
      // fail loudly on everything else: a string column would cast to
      // null (one garbage bucket per key), and a FRACTIONAL numeric
      // would truncate — both silently diverging from the plain form,
      // which orders any orderable type faithfully
      case other => throw new IllegalArgumentException(
        s"asofJoinBucketed needs a timestamp or integral $side time column, got $other " +
          "— use asofJoin for other orderable types (fractional times would " +
          "truncate and reorder equal-bucket rows)")
    }
    // exact integer FLOOR division (long `div` truncates toward zero,
    // which mis-buckets negative times): (tl - pmod(tl, w)) / w
    def bucketOf(tl: Column): Column =
      ((tl - pmod(tl, lit(bucketUs))) / bucketUs).cast("long")
    val l3 = l2.withColumn("_tl", asLong("left", left.schema(leftTime).dataType))
      .withColumn("_b", bucketOf(col("_tl")))
    val r3 = r2.withColumn("_tl", asLong("right", right.schema(rightTime).dataType))
      .withColumn("_b", bucketOf(col("_tl")))
    // (1) last NON-NULL value per payload per (key, bucket) — each
    // payload column independently, mirroring the plain form's
    // last(ignoreNulls) exactly: a trailing null-payload right row
    // must not eclipse an earlier non-null one. max_by with the
    // ordering key nulled out on null-payload rows skips them (rows
    // with a null ordering key never win), and unlike a max(struct)
    // it puts no orderability demand on the payload type itself —
    // map-typed payloads stay legal, as in the plain form.
    val lastAggs = rightPayload.map { c =>
      max_by(col(s"_p_$c"), when(col(s"_p_$c").isNotNull, col("_tl"))).as(s"_p_$c")
    }
    val bucketLast = r3.groupBy(col("_k"), col("_b"))
      .agg(lastAggs.head, lastAggs.tail: _*)
    // (2) carry-in per left bucket: summaries shift to bucket+1, then
    // one per-key last-sweep over BUCKET-granular rows
    val leftBuckets = l3.select(col("_k"), col("_b")).distinct()
      .withColumn("_lt", lit(1))
    val shifted = bucketLast.withColumn("_b", col("_b") + 1).withColumn("_lt", lit(0))
    val merged = shifted.unionByName(
      rightPayload.foldLeft(leftBuckets)((d, c) =>
        d.withColumn(s"_p_$c", lit(null).cast(right.schema(c).dataType))))
    val wCarry = Window.partitionBy("_k").orderBy("_b", "_lt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = rightPayload.foldLeft(merged)((d, c) =>
      d.withColumn(s"_p_$c", last(col(s"_p_$c"), ignoreNulls = true).over(wCarry)))
      .filter(col("_lt") === 1)
      .select((Seq(col("_k"), col("_b"), lit(Long.MinValue).as("_tl"), lit(0).as("_side")) ++
        rightPayload.map(c => col(s"_p_$c"))): _*)
    // (3) per-(key, bucket) window over in-bucket rows + the carry row
    val slim = Seq("_k", "_b", "_tl", "_side") ++ rightPayload.map(c => s"_p_$c")
    val main = l3.unionByName(r3.select(slim.map(col): _*), allowMissingColumns = true)
      .unionByName(carry, allowMissingColumns = true)
    val w = Window.partitionBy("_k", "_b").orderBy("_tl", "_side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(main)((d, c) =>
      d.withColumn(s"_p_$c", last(col(s"_p_$c"), ignoreNulls = true).over(w)))
    asofProject(filled, lCols, rightPayload)
  }

  /** As-of enrichment: each event gets the customer's most recent order
    * at or before the event time (user_id ⋈ o_custkey). Orders are
    * deduped to max(o_orderkey) per (custkey, orderdate) so the tie
    * winner is well-defined. Inner semantics: unmatched events drop.
    */
  def asofLastOrder(
      events: DataFrame, orders: DataFrame, bucketed: Boolean = false): DataFrame = {
    // Zone-less parquet timestamps read back as TIMESTAMP_NTZ (both
    // events.ts when the fixture stores readable timestamps, and
    // o_orderdate always). Align the right time axis to LTZ explicitly
    // — identity under the UTC session tz — so the union in asofJoin
    // doesn't depend on implicit NTZ/LTZ coercion; the bucketed form
    // maps either type to epoch micros itself.
    val r = orders
      .groupBy(col("o_custkey"), col("o_orderdate").cast("timestamp_ltz").as("o_orderdate"))
      .agg(max("o_orderkey").as("o_orderkey"))
    val l = events.select("event_id", "user_id", "ts", "event_type")
    val joined =
      if (bucketed)
        // ~90-day buckets: order dates span years, events months — a
        // hot user splits across buckets without drowning in carries
        asofJoinBucketed(l, "user_id", "ts", r, "o_custkey", "o_orderdate",
          Seq("o_orderkey"), bucketUs = 90L * 86400L * 1000000L)
      else
        asofJoin(l, "user_id", "ts", r, "o_custkey", "o_orderdate", Seq("o_orderkey"))
    joined
      .filter(col("o_orderkey").isNotNull)
      .select("event_id", "user_id", "event_type", "o_orderkey")
      .orderBy("event_id")
  }

  /** 2-D binned histogram (the movement-heatmap capability,
    * SURVEY §0.1): floor-bin two numeric axes, count per cell. One
    * partial+final hash aggregation — shuffle carries only |cells|
    * rows per partition, so a 100 TB event stream reduces to a
    * heatmap-sized result with no intermediate blowup.
    */
  def histogram2d(
      df: DataFrame, x: Column, y: Column,
      xBinWidth: Double, yBinWidth: Double): DataFrame =
    df.groupBy(
        floor(x / xBinWidth).cast("long").as("x_bin"),
        floor(y / yBinWidth).cast("long").as("y_bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy("x_bin", "y_bin")

  /** Heatmap over the events table: value × JSON property `k`. */
  def eventHeatmap(events: DataFrame): DataFrame =
    histogram2d(
      events.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k").isNotNull),
      col("value"), col("k").cast("double"),
      xBinWidth = 25.0, yBinWidth = 2.0)

  /** Gap-rule session bounds — THE shared sessionization core
    * ([[sessionize]], [[concurrentSessions]], [[activeCoverage]] all
    * read it, so the gap rule and its (us, event_id) tie order can
    * never drift between the ops or from their oracle twins): a new
    * session starts after `gapUs` of inactivity; two window passes
    * over one (user_id) partitioning — one shuffle total.
    * Output: (user_id, session_id, n_events, s, e) — bounds in µs.
    */
  private def sessionBounds(events: DataFrame, gapUs: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(byUser))
      .withColumn(
        "is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("us").as("s"), max("us").as("e"))
  }

  /** Session interval deltas swept into per-segment concurrency — the
    * shared TWO-PHASE global-prefix-sum core of [[concurrentSessions]]
    * and [[activeCoverage]]: +1 at each session start, −1 one µs after
    * its end; range-partition on the sweep key (equal keys never
    * split), cumulate within partitions (range-frame peers share
    * values in both engines), add broadcast EXCLUSIVE per-partition
    * offsets; each row also gets its segment length from the
    * within-partition lead, boundary-stitched with the next
    * partition's first key from the same ≤|partitions|-row summary.
    * Output: (t, conc, len) — len null only for the final row.
    */
  private def sweepSegments(sess: DataFrame): DataFrame = {
    val deltas = sess.select(col("s").as("t"), lit(1L).as("d"))
      .unionByName(sess.select((col("e") + 1L).as("t"), lit(-1L).as("d")))
    val parts = deltas.repartitionByRange(32, col("t"), col("d"))
      .withColumn("pid", spark_partition_id())
      // materialized: TWO consumers (the sweep and the partition
      // summary) — without it, a re-executed range exchange could
      // re-sample different bounds and desync pid between them
      .localCheckpoint()
    val wIn = Window.partitionBy("pid").orderBy("t", "d")
    val within = parts
      .withColumn("cum", sum("d").over(wIn))
      .withColumn("nxt_in", lead("t", 1).over(wIn))
    val bounds = parts.groupBy("pid").agg(sum("d").as("tot"), min("t").as("ft"))
      .withColumn("off", coalesce(
        sum("tot").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("nft", lead("ft", 1).over(Window.orderBy("pid")))
      .select("pid", "off", "nft")
    within.join(broadcast(bounds), "pid")
      .select(col("t"), (col("cum") + col("off")).as("conc"),
        (coalesce(col("nxt_in"), col("nft")) - col("t")).as("len"))
  }

  /** Gap-based sessionization: a new session starts after `gapMin`
    * minutes of inactivity ([[sessionBounds]] is the shared core).
    */
  def sessionize(events: DataFrame, gapMin: Long = 30L): DataFrame =
    sessionBounds(events, gapMin * 60000000L)
      .withColumn("dur_us", col("e") - col("s"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        Exact.meanOfLong(col("n_events")).as("avg_events"),
        max("dur_us").as("max_dur_us"))
      .orderBy("user_id")

  /** PEAK CONCURRENT SESSIONS per day — the sweep-line interval-
    * overlap count (how many sessions were simultaneously open), the
    * capacity-planning query interval data exists for. Sessions are
    * [[sessionize]]'s gap-rule intervals; each contributes +1 at its
    * start and −1 one microsecond after its end, and concurrency is
    * the running sum over the globally time-ordered deltas.
    *
    * The running sum is the scale hazard: a naive unpartitioned
    * window drags every delta through ONE task. Here it is the
    * TWO-PHASE distributed prefix sum (the t54 sequence-packing
    * pattern): range-partition the deltas by the sweep key, cumulate
    * within each partition (peers share a range-frame value in both
    * engines), then add each partition's exclusive offset — a
    * ≤|partitions|-row frame, broadcast back. Identical row-level
    * values to the oracle's single global window, computed without
    * one. All integer math; ties order by (t, d) so closes at an
    * instant count before opens at the same instant.
    * Output: (day, peak) — day = µs-epoch day number.
    */
  def concurrentSessions(events: DataFrame, gapMin: Long = 30L): DataFrame =
    sweepSegments(sessionBounds(events, gapMin * 60000000L))
      // integer DIV, not double division: a double quotient can land
      // one ulp under an exact day boundary and truncate off-by-one
      .withColumn("day", expr("t DIV 86400000000"))
      .groupBy("day").agg(max("conc").as("peak"))
      .orderBy("day")

  /** GLOBAL ACTIVE COVERAGE — the interval-UNION length: total time
    * at least one session was open anywhere, plus the peak
    * concurrency ([[concurrentSessions]]' sibling summary; "how busy
    * was the service, and for how long was it busy at all"). The
    * sweep assigns each inter-delta segment its concurrency and sums
    * the lengths of the conc > 0 segments — an exact interval union
    * with no interval-vs-interval join.
    *
    * Same two-phase distributed machinery as [[concurrentSessions]];
    * the one new need is each segment's END, i.e. lead(t) in GLOBAL
    * order — taken as lead(t) within the range partition, stitched
    * across boundaries with the next partition's first key (a
    * ≤|partitions|-row broadcast frame). Peers at one instant get
    * zero-length segments, so tie order can't change the sum.
    * Output: one row (active_us, peak).
    */
  def activeCoverage(events: DataFrame, gapMin: Long = 30L): DataFrame =
    sweepSegments(sessionBounds(events, gapMin * 60000000L))
      .agg(
        coalesce(sum(when(col("conc") > 0L, col("len"))), lit(0L)).as("active_us"),
        max("conc").as("peak"))

  /** MULTI-TOUCH ATTRIBUTION — marketing's linear model made exact:
    * every purchase splits 1,000,000 micro-credits equally over the
    * user's click/view touches since their previous purchase, with
    * the integer remainder going to the LAST touch (deterministic; no
    * fractional credit ever — Σ credits ≡ 1e6 per attributed
    * purchase, auditable to the unit). Segmentation is one per-user
    * cumulative purchase count (a gaps-and-islands variant: a touch's
    * segment = purchases strictly before it, a purchase closes the
    * segment bearing its own count), then touches equi-join their
    * segment's purchase on (user, segment).
    *
    * Scale shape: all windows are user-partitioned, the join is an
    * equi-join on (user, segment), and the output aggregates to
    * |touch types| rows — nothing corpus-sized moves unpartitioned.
    * Output: (event_type, credit_micro, n_touches).
    */
  def attribution(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val e = events
      .withColumn("us", unix_micros(col("ts")))
      .select(col("user_id"), col("event_id"), col("event_type"), col("us"))
      .withColumn("seg", coalesce(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(byUser.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val touches = e.filter(col("event_type").isin("click", "view"))
      .select("user_id", "seg", "event_id", "event_type", "us")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("seg"))
    val wSeg = Window.partitionBy("user_id", "seg")
    val wLast = wSeg.orderBy(col("us").desc, col("event_id").desc)
    touches.join(purchases, Seq("user_id", "seg"))
      .withColumn("n", count(lit(1)).over(wSeg))
      .withColumn("rk", row_number().over(wLast))
      .withColumn("credit", expr("1000000 DIV n") +
        when(col("rk") === 1, expr("1000000 % n")).otherwise(lit(0L)))
      .groupBy("event_type")
      .agg(sum("credit").as("credit_micro"), count(lit(1)).as("n_touches"))
      .orderBy("event_type")
  }

  /** ORDERED FUNNEL per user: how far each user progressed through
    * `steps`, where step i+1 counts only if it happens STRICTLY AFTER
    * the user's first completion of step i (the product-analytics
    * funnel rule — a purchase before the first view is not a
    * conversion). Emits one row per user who completed step 1:
    * (user_id, stage, t1..tn as epoch micros, nulls past the stage).
    *
    * Scale shape: one narrow pass per step — filter to the step's
    * events, user-keyed join against the previous step's firsts,
    * partial-aggregated min — all user-partitioned equi-joins, no
    * windows over the whole timeline, no event×event self-join.
    * Timestamps stay integer micros end-to-end (exact, engine-
    * portable, and BIGINT in the output schema per the oracle
    * timestamp rule).
    */
  def funnel(events: DataFrame,
      steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(
      col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    var out = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("us").as("t1"))
    for ((st, i) <- steps.tail.zipWithIndex) {
      val prev = s"t${i + 1}"
      val nxt = s"t${i + 2}"
      val firsts = e.filter(col("event_type") === st)
        .join(out.select(col("user_id"), col(prev)), "user_id")
        .filter(col("us") > col(prev))
        .groupBy("user_id").agg(min("us").as(nxt))
      out = out.join(firsts, Seq("user_id"), "left")
    }
    val stage = (2 to steps.size).foldLeft(lit(1L)) { (acc, i) =>
      acc + when(col(s"t$i").isNotNull, 1L).otherwise(0L)
    }
    out.withColumn("stage", stage)
      .select(col("user_id") +: col("stage") +:
        (1 to steps.size).map(i => col(s"t$i")): _*)
      .orderBy("user_id")
  }

  /** COHORT RETENTION: users grouped by the week of their first event
    * (weeks = floor(epoch micros / 7 days) — pure integer math, no
    * calendar dependency), counted distinct in every later week they
    * return. The (cohort_wk, wk_offset, n_users) triangle is the
    * retention curve a growth dashboard plots.
    *
    * Scale shape: first-event week is one user-keyed partial
    * aggregate; activity rows join it user-keyed; the distinct and
    * final count partial-aggregate down to the tiny
    * cohorts×offsets grid before the last shuffle.
    */
  def cohortRetention(events: DataFrame): DataFrame =
    cohortFromActivity(activityWeeks(events))

  /** INCREMENTAL [[cohortRetention]]: fold a new event shard into a
    * maintained activity index without rescanning event history. The
    * index is the distinct (user_id, wk) activity table — already the
    * retention triangle's sufficient statistic, |users|·|weeks
    * active| rows however many raw events history holds — and the
    * fold is exact because BOTH halves of the computation decompose:
    * distinct activity is a union-dedup, and each user's first week
    * is min over their activity rows. Returns the triangle plus the
    * updated index; the daily loop feeds `updatedIndex` back in
    * (gated: t116's twin is t112's full-history SQL verbatim).
    */
  def incrementalCohortRetention(
      shard: DataFrame, index: DataFrame): (DataFrame, DataFrame) = {
    val updated = index.select("user_id", "wk")
      .unionByName(activityWeeks(shard))
      .distinct()
    (cohortFromActivity(updated), updated)
  }

  /** ROLLING ACTIVE USERS: distinct users in the trailing
    * `windowDays`-day window ending at each active day (WAU at the
    * default 7) — the engagement curve next to [[cohortRetention]]'s
    * triangle. Days are pure integer floor(epoch micros / 1 day).
    *
    * Scale shape: the distinct (user, day) activity table is the
    * input (|users|·|active days|, tiny next to raw events); the
    * trailing window is a bounded-fanout range join against the
    * tiny distinct-day table (each activity row lands in ≤windowDays
    * windows), then a partial-aggregated distinct count.
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "window must cover at least one day")
    val du = events.select(col("user_id"),
      floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .distinct()
    val days = du.select(col("day").as("d")).distinct()
    du.join(broadcast(days),
        col("day") >= col("d") - (windowDays - 1) && col("day") <= col("d"))
      .groupBy("d").agg(countDistinct("user_id").as("active_users"))
      .orderBy("d")
  }

  /** [[rollingActiveUsers]]'s 100 TB form: per-day MERGEABLE HLL
    * sketches unioned over each trailing window — history days are
    * sketched once and never re-scanned (the q49 incremental-NDV
    * discipline applied to the engagement curve), where the exact
    * form re-counts every window. Gated the q38 way: the report
    * carries the EXACT count and a within-10% boolean, so the oracle
    * checks the estimate's quality without having to reproduce the
    * sketch.
    */
  def rollingActiveUsersSketch(events: DataFrame,
      windowDays: Int = 7): DataFrame = {
    val du = events.select(col("user_id"),
      floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
      .distinct()
    val perDay = du.groupBy("day")
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    val days = du.select(col("day").as("d")).distinct()
    val est = perDay.join(broadcast(days),
        col("day") >= col("d") - (windowDays - 1) && col("day") <= col("d"))
      .groupBy("d")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    rollingActiveUsers(events, windowDays)
      .join(est, "d")
      .select(col("d"), col("active_users"),
        (abs(col("est") - col("active_users")) <=
          col("active_users") * lit(0.10)).as("within_10pct"))
      .orderBy("d")
  }

  /** TOP EVENT PATHS: the most common length-`n` event-type sequences
    * across user timelines — the "what do users actually do" journey
    * report. Each user's timeline becomes one ordered type string
    * (deterministic (us, event_id) order), n-gram shingles count
    * occurrences, top-k by (count DESC, path).
    *
    * Scale shape: one user-keyed aggregate builds the sequence (a
    * user's timeline fits a row — the sessionize assumption), the
    * shingle counts partial-aggregate to the tiny type^n space, and
    * top-k is TakeOrderedAndProject.
    */
  def topEventPaths(events: DataFrame, n: Int = 3, k: Int = 20): DataFrame = {
    val seqs = events
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type")).as("e"))
      .groupBy("user_id")
      .agg(array_sort(collect_list(col("e"))).as("evs"))
      .select(col("user_id"),
        transform(col("evs"), e => e.getField("event_type")).as("types"))
    // kgrams WITHOUT the dedup shingle wrapper: a user repeating a
    // journey counts once per occurrence, exactly what the report
    // measures
    val grams = when(size(col("types")) >= n,
      TextOps.kgrams(col("types"), n)).otherwise(array().cast("array<string>"))
    seqs
      .select(explode(grams).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("path"))
      .limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n_paths").desc, col("path"))).cast("long"))
      .select("rnk", "path", "n_paths")
  }

  /** POINT-IN-TIME join — the feature-store lookup: each probe row
    * (key, date) joins the validity interval that CONTAINED its date
    * (`from ≤ date < to`, null `to` = still current), never a later
    * one — the join that makes training features leakage-free and
    * dashboards historically accurate. Intervals are expected
    * non-overlapping per key ([[Relational.scd2Intervals]]'s
    * contract), so at most one interval matches; probes before their
    * key's first interval (or with no intervals at all) keep nulls
    * (left semantics).
    *
    * Scale shape: one key-partitioned equi-join with the containment
    * as a join-time filter — per-key interval lists are SCD
    * histories (small by nature), so the fan-out is bounded;
    * AQE-skew-splittable for hot keys.
    */
  def pitJoin(
      probes: DataFrame, probeKey: String, probeDate: String,
      intervals: DataFrame, intervalKey: String,
      payload: Seq[String],
      from: String = "valid_from", to: String = "valid_to"): DataFrame =
    probes.join(intervals,
      probes(probeKey) === intervals(intervalKey) &&
        intervals(from) <= probes(probeDate) &&
        (intervals(to).isNull || probes(probeDate) < intervals(to)),
      "left")
      .select(probes.columns.map(probes(_)) ++ payload.map(intervals(_)): _*)

  /** Distinct (user_id, wk) activity rows — weeks as pure integer
    * floor(epoch micros / 7 days), no calendar dependency. Public as
    * the index builder for [[incrementalCohortRetention]]'s day one.
    */
  def activityWeeks(events: DataFrame): DataFrame =
    events.select(col("user_id"),
      floor(unix_micros(col("ts")) / lit(604800000000L)).cast("long").as("wk"))
      .distinct()

  /** TWO-PROPORTION A/B SIGNIFICANCE per group with ZERO floating
    * point: the pooled two-proportion z-test z² > 3.8416 (95%, the
    * χ²₁ bound) evaluated as the cross-multiplied INTEGER inequality
    *
    *   625·D²·n > 2401·n_a·n_b·x·(n−x),  D = x_a·n_b − x_b·n_a
    *
    * (3.8416 = 2401/625 exactly), in DECIMAL(38,0) — so two engines
    * can never disagree by an ulp on a borderline experiment. One
    * partial-aggregating pass builds the four sufficient counts per
    * group; the verdict is a pure column expression. `variant` must
    * be 0/1, `converted` a boolean column.
    */
  def abTest(df: DataFrame, grp: Column, variant: Column, converted: Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val c = converted.cast("long")
    val s = df.select(grp.as("grp"), variant.cast("long").as("v"), c.as("c"))
      .groupBy("grp")
      .agg(sum(when(col("v") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("v") === 0, col("c")).otherwise(0L)).as("x_a"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("v") === 1, col("c")).otherwise(0L)).as("x_b"))
    def d(n: String) = col(n).cast(dec)
    val bigD = d("x_a") * d("n_b") - d("x_b") * d("n_a")
    val n = d("n_a") + d("n_b")
    val x = d("x_a") + d("x_b")
    s.select(col("grp"), col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        (lit(625).cast(dec) * bigD * bigD * n >
          lit(2401).cast(dec) * d("n_a") * d("n_b") * x * (n - x))
          .as("significant"))
      .orderBy("grp")
  }

  /** MARKOV TRANSITION MATRIX over per-user event sequences: the
    * (from_type → to_type) first-order transition counts and
    * probabilities — the statistic behind next-event prediction,
    * funnel leak analysis, and bot detection (a bot's transition row
    * is near-deterministic). One lag window per USER partition (the
    * sessionize discipline — never a global sort), then a hash
    * aggregate on the (from, to) pair; `p` is the row-normalized
    * probability, computed with one broadcast join of the
    * |event types|-sized from-totals and quantized to 6 dp. Ties in
    * simultaneous events break on event_id, so the sequence — and
    * therefore every count — is deterministic on any engine.
    */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("to_type", lead("event_type", 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("tot"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        Exact.quant6(col("n").cast("double") / col("tot").cast("double")).as("p"))
      .orderBy("from_type", "to_type")
  }

  private def cohortFromActivity(activity: DataFrame): DataFrame = {
    val first = activity.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    activity.join(first, "user_id")
      .select(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_wk", "wk_offset").agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_wk", "wk_offset")
  }

  /** NEAREST-event join — each `leftType` event matched to its
    * temporally CLOSEST `rightType` event of the same user within
    * ±`windowUs`, EITHER direction (the as-of join is
    * backward-only; attribution and sensor alignment want "the
    * nearest reading", past or future). Candidates come from a
    * time-bucket equi-join (bucket width = the window, left rows
    * probe buckets b−1/b/b+1 — every |Δ| ≤ window pair shares one of
    * the three, so it's lossless and never a theta join), then one
    * `min(struct(|Δ|, ts, id))` argmin partial-aggregates per left
    * event — ties on distance break to the EARLIER right event, then
    * the smaller id, deterministic on any engine. Unmatched left
    * events are omitted (inner semantics). Output:
    * (user_id, a_id, b_id, delta_us).
    */
  def nearestEvent(events: DataFrame, leftType: String, rightType: String,
      windowUs: Long): DataFrame = {
    require(windowUs > 0, "window must be positive")
    val base = events.select(col("user_id"), col("event_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
    val l = base.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("a_id"), col("us").as("a_us"))
      .withColumn("b0", expr(s"a_us DIV ${windowUs}L"))
      .withColumn("bkt", explode(array(col("b0") - 1, col("b0"), col("b0") + 1)))
      .drop("b0")
    val r = base.filter(col("event_type") === rightType)
      .select(col("user_id").as("_ru"), col("event_id").as("b_id"),
        col("us").as("b_us"))
      .withColumn("bkt", expr(s"b_us DIV ${windowUs}L"))
    l.join(r, col("user_id") === col("_ru") && l("bkt") === r("bkt"))
      .filter(abs(col("b_us") - col("a_us")) <= windowUs)
      .groupBy("user_id", "a_id", "a_us")
      .agg(min(struct(abs(col("b_us") - col("a_us")).as("d"),
        col("b_us"), col("b_id"))).as("best"))
      .select(col("user_id"), col("a_id"), col("best.b_id").as("b_id"),
        (col("best.b_us") - col("a_us")).as("delta_us"))
      .orderBy("a_id")
  }
}
