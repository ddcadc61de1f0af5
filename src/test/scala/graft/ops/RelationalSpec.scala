package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Relational ops are gate-covered (DuckDB oracle); this spec holds
  * the properties the SQL gate can't express — here, the sketch-merge
  * identity behind incremental NDV.
  */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("incrementalNdv: union of per-shard sketches estimates like one pass, within bounds") {
    import org.apache.spark.sql.functions._
    val df = spark.range(20000)
      .select((col("id") % 4999).as("l_partkey"),
        (col("id") % 397).as("l_suppkey"),
        col("id").as("l_orderkey"))
    // merge identity: the union of shard sketches gives the SAME
    // estimate as one whole-corpus sketch (DataSketches HLL merge is
    // deterministic) — this is what makes per-shard persistence sound
    val sharded = df.groupBy((col("l_orderkey") % 4).as("shard"))
      .agg(expr("hll_sketch_agg(l_partkey, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head.getLong(0)
    val onePass = df
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))")).head.getLong(0)
    assert(sharded == onePass)
    // and the declared report's booleans hold
    val out = Relational.incrementalNdv(df).collect()(0)
    assert(out.getLong(0) == 4999L && out.getLong(1) == 397L)
    assert(out.getBoolean(2) && out.getBoolean(3))
  }

  test("fullOuterActivity: both null arms surface with side indicators (golden)") {
    import spark.implicits._
    val customer = Seq(
      (1L, "BUILDING"), (2L, "BUILDING"), (3L, "MACHINERY")
    ).toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10L, 1L, "F"), (11L, 1L, "F"), (12L, 3L, "F"), (13L, 2L, "O")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus")
    val out = Relational.fullOuterActivity(customer, orders).collect()
      .map(r => (r.getLong(0), Option(r.get(2)), r.getString(3))).toSeq
    assert(out == Seq(
      (1L, Some(2L), "both"),          // building + 2 F orders
      (2L, None, "customer_only"),     // building, no F orders
      (3L, Some(1L), "orders_only")),  // F orders, not building
      out.toString)
  }

  test("scd2Intervals: status runs collapse, intervals chain, current row open") {
    import spark.implicits._
    val d = java.sql.Date.valueOf(_: String)
    val orders = Seq(
      (1L, 101L, "O", d("2024-01-01")),
      (1L, 102L, "O", d("2024-02-01")), // same run as 101
      (1L, 103L, "F", d("2024-03-01")), // status change
      (1L, 104L, "O", d("2024-04-01")), // back to O → NEW run
      (2L, 201L, "F", d("2024-01-15"))
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    val out = Relational.scd2Intervals(orders).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getLong(5))).toSeq
    assert(out == Seq(
      (1L, "O", "2024-01-01", Some("2024-03-01"), 2L),
      (1L, "F", "2024-03-01", Some("2024-04-01"), 1L),
      (1L, "O", "2024-04-01", None, 1L),
      (2L, "F", "2024-01-15", None, 1L)), out.toString)
  }

  test("scd2Fold: extends/closes open intervals, equals the full rebuild on " +
      "an adversarial same-date key-inverted fixture, and rejects interleaves") {
    import spark.implicits._
    val d = java.sql.Date.valueOf(_: String)
    // old slice: customer 1 ends in an open O run; customer 2 open F
    val old = Seq(
      (1L, 101L, "O", d("2024-01-01")),
      (1L, 103L, "F", d("2024-02-01")),
      (1L, 104L, "O", d("2024-03-01")),
      (2L, 201L, "F", d("2024-01-15"))
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    // new slice: customer 1 continues O (extends the open run) then
    // flips to F; customer 2's new runs land on ONE date with the
    // SMALLER key in the LATER temporal run (key 298 F before 299 O
    // at the same date? no — temporal order is (date, key): 298 then
    // 299; but run2 spans into 05-02 via key 290, making run2's min
    // key 290 < run1's 298 — the (valid_from, first_key) inversion);
    // customer 3 is brand new
    val fresh = Seq(
      (1L, 105L, "O", d("2024-04-01")),
      (1L, 106L, "F", d("2024-05-01")),
      (2L, 298L, "F", d("2024-05-01")),
      (2L, 299L, "O", d("2024-05-01")),
      (2L, 290L, "O", d("2024-05-02")),
      (3L, 301L, "P", d("2024-06-01"))
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    val cols = Seq("o_custkey", "o_orderstatus", "valid_from", "valid_to",
      "first_key", "n_orders")
    def render(df: org.apache.spark.sql.DataFrame) = df
      .select(cols.head, cols.tail: _*)
      .orderBy("o_custkey", "valid_from", "first_key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getLong(4), r.getLong(5))).toSeq
    val folded = render(Relational.scd2Fold(Relational.scd2State(old), fresh))
    val rebuilt = render(Relational.scd2State(old.unionByName(fresh)))
    assert(folded == rebuilt, s"fold must equal rebuild:\n$folded\nvs\n$rebuilt")
    // the open O run of customer 1 extended in place: 2 orders now
    assert(folded.exists(r => r._1 == 1L && r._2 == "O" && r._3 == "2024-03-01"
      && r._6 == 2L), folded.toString)
    // customer 2: new F at 05-01 merged into the open F interval
    // (n=2), and the same-date O run stayed SEPARATE across the
    // status flip with its min key 290 from the later date
    assert(folded.filter(_._1 == 2L) == Seq(
      (2L, "F", "2024-01-15", Some("2024-05-01"), 201L, 2L),
      (2L, "O", "2024-05-01", None, 290L, 2L)), folded.toString)
    // guard: an order interleaving with folded history fails loudly
    val late = Seq((1L, 99L, "O", d("2024-02-15")))
      .toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    val e = intercept[IllegalArgumentException] {
      Relational.scd2Fold(Relational.scd2State(old.unionByName(fresh)), late)
    }
    assert(e.getMessage.contains("interleaves"), e.getMessage)
  }

  test("scd2FoldDelta: only affected customers emitted, each complete; " +
      "latest-wins layering over the old state equals the full fold") {
    import spark.implicits._
    val d = java.sql.Date.valueOf(_: String)
    val old = Seq(
      (1L, 101L, "O", d("2024-01-01")),
      (1L, 103L, "F", d("2024-02-01")),
      (1L, 104L, "O", d("2024-03-01")),
      (2L, 201L, "F", d("2024-01-15")),
      (4L, 401L, "P", d("2024-01-20"))
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    // the slice touches customers 1 and 3 only
    val fresh = Seq(
      (1L, 105L, "O", d("2024-04-01")),
      (3L, 301L, "P", d("2024-06-01"))
    ).toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
    val cols = Seq("o_custkey", "o_orderstatus", "valid_from", "valid_to",
      "first_key", "n_orders")
    def render(df: org.apache.spark.sql.DataFrame) = df
      .select(cols.head, cols.tail: _*)
      .orderBy("o_custkey", "valid_from", "first_key").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getLong(4), r.getLong(5))).toSeq
    val state = Relational.scd2State(old)
    val delta = Relational.scd2FoldDelta(state, fresh)
    val deltaRows = render(delta)
    assert(deltaRows.map(_._1).toSet == Set(1L, 3L),
      s"delta must carry exactly the affected customers: $deltaRows")
    // affected customers are COMPLETE (closed history included), so a
    // latest-wins merge (delta replaces its customers, untouched
    // customers keep their old rows) reconstructs the full fold
    val untouched = state.join(
      fresh.select("o_custkey").distinct(), Seq("o_custkey"), "left_anti")
    val layered = render(untouched
      .select(delta.columns.map(org.apache.spark.sql.functions.col): _*)
      .unionByName(delta))
    assert(layered == render(Relational.scd2Fold(state, fresh)),
      s"layered delta must equal the full fold:\n$layered")
  }

  test("ewmaDailyQty: sequential half-life fold over sorted daily counts " +
      "(golden: [4,2,8] -> 5.5)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // rf A: 4 rows day1, 2 rows day2, 8 rows day3 → (4+2)/2=3, (3+8)/2=5.5
    val rows = Seq.fill(4)("2024-01-01") ++ Seq.fill(2)("2024-01-02") ++
      Seq.fill(8)("2024-01-03")
    val li = rows.toDF("d")
      .select(org.apache.spark.sql.functions.lit("A").as("l_returnflag"),
        to_timestamp(col("d")).as("l_shipdate"))
    val got = Relational.ewmaDailyQty(li).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("A", 5.5)), got.toString)
  }

  test("SCD-2 delta maintenance end-to-end: a batch touching ONE customer " +
      "commits O(1 customer) of files and the merged state equals the fold") {
    import spark.implicits._
    import graft.sinks.LakeWriter
    val d = java.sql.Date.valueOf(_: String)
    val root = java.nio.file.Files.createTempDirectory("scd2d").toString
    val lw = new LakeWriter(root)
    val tbl = "scd2d_state"
    try {
      // 40 customers' histories → initial full state commit
      val old = (1L to 40L).flatMap(c => Seq(
        (c, c * 100L + 1L, "O", d("2024-01-01")),
        (c, c * 100L + 2L, "F", d("2024-02-01"))))
        .toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
      lw.commitBucketed(Relational.scd2State(old), tbl, 8, Seq("o_custkey"),
        replace = true)
      val v1Files = new java.io.File(s"$root/$tbl/${LakeWriter.CvCol}=1")
        .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
      // a slice touching customer 7 only
      val fresh = Seq((7L, 999L, "F", d("2024-03-01")))
        .toDF("o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate")
      val state = LakeWriter.readBucketedTableMerged(spark, tbl, Seq("o_custkey"))
      lw.commitBucketed(Relational.scd2FoldDelta(state, fresh).coalesce(1),
        tbl, 8, Seq("o_custkey"))
      // O(affected): one bucket file for customer 7, prior files untouched
      val v2Files = new java.io.File(s"$root/$tbl/${LakeWriter.CvCol}=2")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(v2Files.length == 1, v2Files.map(_.getName).toSeq.toString)
      val v1After = new java.io.File(s"$root/$tbl/${LakeWriter.CvCol}=1")
        .listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).sorted.toSeq
      assert(v1After == v1Files, "the delta must not rewrite the state table")
      // merged view == one-shot fold of the full state
      val cols = Seq("o_custkey", "o_orderstatus", "valid_from", "valid_to",
        "first_key", "n_orders")
      def render(df: org.apache.spark.sql.DataFrame) = df
        .select(cols.map(org.apache.spark.sql.functions.col): _*)
        .orderBy("o_custkey", "valid_from", "first_key").collect().toSeq
      assert(render(LakeWriter.readBucketedTableMerged(spark, tbl, Seq("o_custkey")))
        == render(Relational.scd2Fold(Relational.scd2State(old), fresh)))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("mergeUpsert: matched keys replaced wholesale, unmatched pass " +
      "through, new keys insert (golden)") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "seg", "bal")
    val updates = Seq((2L, "B2", 99.0), (9L, "new", 1.0))
      .toDF("k", "seg", "bal")
    val got = Relational.mergeUpsert(target, updates, "k")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B2", 99.0), (3L, "c", 30.0),
      (9L, "new", 1.0)), got.toString)
  }

  test("priceAboveCustomerAvg: golden per-customer averages, and Catalyst " +
      "DECORRELATES the scalar subquery into an aggregate + join — no " +
      "per-row re-execution") {
    import spark.implicits._
    val orders = Seq(
      (1L, 10L, 100.0), (2L, 10L, 300.0),             // cust 10: avg 200
      (3L, 20L, 50.0), (4L, 20L, 50.0), (5L, 20L, 80.0) // cust 20: avg 60
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val out = Relational.priceAboveCustomerAvg(orders)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == Seq((2L, 300.0, 200.0), (5L, 80.0, 60.0)), got.toString)
    // the executed plan must be the decorrelated form: at least one
    // join, and NO subquery expression anywhere (a surviving
    // ScalarSubquery would mean per-outer-row re-execution)
    val plan = out.queryExecution.executedPlan
    val planStr = plan.toString
    assert(!planStr.contains("ScalarSubquery") && !planStr.contains("Subquery"),
      s"scalar subquery must be decorrelated away:\n$planStr")
    // (string match: plan.collect does not descend through AQE's
    // query-stage wrappers, but the rendered tree shows every node)
    assert(planStr.contains("Join"),
      s"decorrelation must produce a join:\n$planStr")
  }

  test("expectationsReport: null predicates violate, uniqueness counts surplus " +
      "rows, passing rules report zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0), "a"),
      (2L, None, "a"),        // null qty -> violates the range rule
      (2L, Some(99.0), "a"),  // dup key 2 + out-of-range
      (2L, Some(7.0), "b"),   // dup key 2 again (surplus = 2 for key 2)
      (3L, Some(7.0), "b")
    ).toDF("id", "qty", "tag")
    val out = Relational.expectationsReport(df,
      Seq(
        "qty_in_1_10" -> (org.apache.spark.sql.functions.col("qty") >= 1.0 &&
          org.apache.spark.sql.functions.col("qty") <= 10.0),
        "tag_domain" -> org.apache.spark.sql.functions.col("tag").isin("a", "b")),
      Seq("id_unique" -> Seq("id")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(out == Seq(
      ("id_unique", 2L, false),
      ("qty_in_1_10", 2L, false), // the null row AND the 99.0 row
      ("tag_domain", 0L, true)), out.toString)
  }

  test("revenueShareByNation: shares from exact integer sums (golden)") {
    import spark.implicits._
    val li = Seq((1L, 10L, 30.0, 0.0), (2L, 20L, 60.0, 0.5))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = Seq((10L, 100L), (20L, 200L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((100L, "ALPHA"), (200L, "BETA")).toDF("n_nationkey", "n_name")
    val out = Relational.revenueShareByNation(li, sup, nat).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    // revenues 30 and 30 → shares exactly 0.5 each
    assert(out == Seq(("ALPHA", 30.0, 0.5), ("BETA", 30.0, 0.5)), out.toString)
  }

  test("modeQuantity: most frequent value per group, deterministic tie-break") {
    import spark.implicits._
    val li = Seq(
      ("A", 7L), ("A", 7L), ("A", 3L),
      ("R", 9L), ("R", 2L)  // tie -> smaller quantity wins
    ).toDF("l_returnflag", "l_quantity")
    val out = Relational.modeQuantity(li).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("A", 7L, 2L), ("R", 2L, 1L)), out.toString)
  }
}
