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
    val lCols = left.columns
    val reserved = Set("_k", "_t", "_side")
    require(!lCols.exists(c => reserved(c) || c.startsWith("_p_")),
      s"left columns may not use reserved asof names (_k/_t/_side/_p_*): ${lCols.mkString(",")}")
    // the right side is projected into prefixed temporaries BEFORE the
    // union — a payload/key column sharing a name with a left column
    // (both sides having `ts`, say) must never be dropped or rebound
    val l2 = rightPayload.foldLeft(
      left.withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
        .withColumn("_side", lit(1)))(
      (d, c) => d.withColumn(s"_p_$c", lit(null).cast(right.schema(c).dataType)))
    val r2 = right.select(
      (Seq(col(rightKey).as("_k"), col(rightTime).as("_t"), lit(0).as("_side")) ++
        rightPayload.map(c => col(c).as(s"_p_$c"))): _*)
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy("_k").orderBy("_t", "_side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(unioned)((d, c) =>
      d.withColumn(s"_p_$c", last(col(s"_p_$c"), ignoreNulls = true).over(w)))
    filled
      .filter(col("_side") === 1)
      .select((lCols.map(col) ++ rightPayload.map { c =>
        // a payload sharing a left column's name surfaces as <c>_right
        // instead of silently producing a duplicate/ambiguous column
        val out = if (lCols.contains(c)) s"${c}_right" else c
        col(s"_p_$c").as(out)
      }): _*)
  }

  /** As-of enrichment: each event gets the customer's most recent order
    * at or before the event time (user_id ⋈ o_custkey). Orders are
    * deduped to max(o_orderkey) per (custkey, orderdate) so the tie
    * winner is well-defined. Inner semantics: unmatched events drop.
    */
  def asofLastOrder(events: DataFrame, orders: DataFrame): DataFrame = {
    // events.ts is TIMESTAMP_LTZ (nanos→micros ingestion); o_orderdate
    // reads back as TIMESTAMP_NTZ. Align the time axis explicitly —
    // identity under the UTC session tz — so the union in asofJoin
    // doesn't depend on implicit NTZ/LTZ coercion.
    val r = orders
      .groupBy(col("o_custkey"), col("o_orderdate").cast("timestamp_ltz").as("o_orderdate"))
      .agg(max("o_orderkey").as("o_orderkey"))
    asofJoin(
      events.select("event_id", "user_id", "ts", "event_type"), "user_id", "ts",
      r, "o_custkey", "o_orderdate", Seq("o_orderkey"))
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

  /** Gap-based sessionization: a new session starts after `gapMin`
    * minutes of inactivity. Two window passes, both over the same
    * (user_id, ts) partitioning — one shuffle total.
    */
  def sessionize(events: DataFrame, gapMin: Long = 30L): DataFrame = {
    val gapUs = gapMin * 60000000L // gap in microseconds — exact int math
    val byUser = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag("us", 1).over(byUser))
      .withColumn(
        "is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("is_new").over(run))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), (max("us") - min("us")).as("dur_us"))
    sessions
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        Exact.meanOfLong(col("n_events")).as("avg_events"),
        max("dur_us").as("max_dur_us"))
      .orderBy("user_id")
  }
}
