package graft.sources.v2

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.{Fixtures, RestResponse, Transport}

class RestTableProviderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("format(graft-rest) with inline body splits documents and parses downstream") {
    import org.apache.spark.sql.functions._
    val df = spark.read.format("graft-rest")
      .option("body", Fixtures.publicMatchesJson).load()
    assert(df.columns.toSeq == Seq("value"))
    assert(df.count() == 3)
    val parsed = df.select(
      from_json(col("value"), graft.sources.Endpoints.publicMatchesSchema).as("m"))
      .select("m.match_id", "m.duration")
    assert(parsed.agg(sum("duration")).collect()(0).getLong(0) == 2400L + 1800L + 3105L)
  }

  test("url fetching happens on the driver through the scripted transport, one partition per url") {
    val calls = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    RestTableProvider.transportOverride = Some(new Transport {
      override def get(url: String, params: Map[String, String]): RestResponse = {
        calls.add(url)
        RestResponse(200, s"""[{"src":"$url","v":1},{"src":"$url","v":2}]""")
      }
    })
    try {
      val rows = spark.read.format("graft-rest")
        .option("urls", "http://x/a,http://x/b").load()
        .collect().map(_.getString(0))
      assert(rows.length == 4)
      assert(rows.count(_.contains("http://x/a")) == 2)
      assert(rows.count(_.contains("http://x/b")) == 2)
      // exactly one driver-side fetch per url for the whole action,
      // even though planning consults the scan more than once
      assert(calls.size() == 2, calls.toString)
    } finally RestTableProvider.transportOverride = None
  }

  test("micro-batch polling: each trigger polls once, rows land in the sink") {
    val polls = new java.util.concurrent.atomic.AtomicInteger(0)
    RestTableProvider.transportOverride = Some(new Transport {
      override def get(url: String, params: Map[String, String]): RestResponse = {
        val p = polls.incrementAndGet()
        RestResponse(200, s"""[{"poll":$p,"v":1},{"poll":$p,"v":2}]""")
      }
    })
    try {
      val q = spark.readStream.format("graft-rest")
        .option("url", "http://x/stream").load()
        .writeStream.format("memory").queryName("rest_polls")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = spark.table("rest_polls").collect().map(_.getString(0))
      assert(rows.length == 2)                     // one poll, two docs
      assert(rows.forall(_.contains("\"poll\":1")))
      assert(polls.get() == 1)
    } finally RestTableProvider.transportOverride = None
  }

  test("user schema parses documents to typed rows in the reader") {
    val df = spark.read.format("graft-rest")
      .schema(graft.sources.Endpoints.publicMatchesSchema)
      .option("body", Fixtures.publicMatchesJson).load()
    val rows = df.select("match_id", "duration", "radiant_team")
      .orderBy("match_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 8000000001L && rows(0).getLong(1) == 2400L)
    assert(rows(0).getAs[scala.collection.Seq[Long]]("radiant_team").toSeq ==
      Seq(14L, 21L, 34L, 51L, 86L))
    assert(rows(2).isNullAt(2)) // match without team arrays
  }

  test("filter pushdown maps predicates to endpoint query params") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Map[String, String]]()
    RestTableProvider.transportOverride = Some(new Transport {
      override def get(url: String, params: Map[String, String]): RestResponse = {
        seen.add(params)
        // endpoint honours less_than_match_id like the real API
        val cut = params.get("less_than_match_id").map(_.toLong).getOrElse(Long.MaxValue)
        val rows = Seq(8000000001L, 8000000002L, 8000000003L).filter(_ < cut)
          .map(id => s"""{"match_id":$id,"duration":100}""")
        RestResponse(200, rows.mkString("[", ",", "]"))
      }
    })
    try {
      import org.apache.spark.sql.functions.col
      val df = spark.read.format("graft-rest")
        .schema("match_id BIGINT, duration BIGINT")
        .option("url", "http://x/publicMatches")
        .option("pushdown.match_id.lt", "less_than_match_id")
        .load()
        .filter(col("match_id") < 8000000003L)
      val got = df.collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(8000000001L, 8000000002L))
      // the param reached the endpoint (fetch shrank server-side)
      assert(seen.asScala.exists(_.get("less_than_match_id").contains("8000000003")),
        seen.toString)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft"), plan.take(400)) // scanned via the DSv2 table
    } finally RestTableProvider.transportOverride = None
  }

  test("column pruning reaches the reader schema") {
    val df = spark.read.format("graft-rest")
      .schema(graft.sources.Endpoints.publicMatchesSchema)
      .option("body", Fixtures.publicMatchesJson).load()
      .select("match_id")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("match_id") && !scan.contains("radiant_team"),
      s"pruned scan expected:\n$scan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(8000000001L, 8000000002L, 8000000003L))
  }

  test("cursor paging walks less_than_match_id pages, one partition per page") {
    val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
    val ids = Seq(8000000006L, 8000000005L, 8000000004L, 8000000003L, 8000000002L, 8000000001L)
    RestTableProvider.transportOverride = Some(new Transport {
      override def get(url: String, params: Map[String, String]): RestResponse = {
        fetches.incrementAndGet()
        val cut = params.get("less_than_match_id").map(_.toLong).getOrElse(Long.MaxValue)
        val page = ids.filter(_ < cut).take(2) // server pages 2 at a time, descending
        RestResponse(200,
          page.map(id => s"""{"match_id":$id,"duration":100}""").mkString("[", ",", "]"))
      }
    })
    try {
      val df = spark.read.format("graft-rest")
        .schema("match_id BIGINT, duration BIGINT")
        .option("url", "http://x/publicMatches")
        .option("page.param", "less_than_match_id")
        .option("page.cursorField", "match_id")
        .option("page.maxPages", "3")
        .load()
      assert(df.rdd.getNumPartitions == 3) // one partition per page
      // each ACTION plans a fresh scan (snapshot-per-read, like files);
      // within one action the page walk runs exactly once
      fetches.set(0)
      val got = df.collect().map(_.getLong(0)).sorted.toSeq
      assert(got == ids.sorted)            // union of the 3 pages
      assert(fetches.get() == 3, s"fetches=${fetches.get()}")
    } finally RestTableProvider.transportOverride = None
  }

  test("cursor paging stops on an empty page") {
    val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
    RestTableProvider.transportOverride = Some(new Transport {
      override def get(url: String, params: Map[String, String]): RestResponse = {
        fetches.incrementAndGet()
        val cut = params.get("less_than_match_id").map(_.toLong).getOrElse(Long.MaxValue)
        val page = Seq(8000000002L, 8000000001L).filter(_ < cut)
        RestResponse(200,
          page.map(id => s"""{"match_id":$id}""").mkString("[", ",", "]"))
      }
    })
    try {
      val df = spark.read.format("graft-rest")
        .schema("match_id BIGINT")
        .option("url", "http://x/publicMatches")
        .option("page.param", "less_than_match_id")
        .option("page.cursorField", "match_id")
        .option("page.maxPages", "10")
        .load()
      assert(df.collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(8000000001L, 8000000002L))
      // page 1 (both rows) + page 2 (empty → stop), well under maxPages
      assert(fetches.get() == 2, s"fetches=${fetches.get()}")
    } finally RestTableProvider.transportOverride = None
  }

  test("limit pushdown stops the page walk early") {
    val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
    val ids = (1L to 10L).map(8000000000L + _).sortBy(-_)
    RestTableProvider.transportOverride = Some(new Transport {
      override def get(url: String, params: Map[String, String]): RestResponse = {
        fetches.incrementAndGet()
        val cut = params.get("less_than_match_id").map(_.toLong).getOrElse(Long.MaxValue)
        val page = ids.filter(_ < cut).take(2)
        RestResponse(200,
          page.map(id => s"""{"match_id":$id}""").mkString("[", ",", "]"))
      }
    })
    try {
      val df = spark.read.format("graft-rest")
        .schema("match_id BIGINT")
        .option("url", "http://x/publicMatches")
        .option("page.param", "less_than_match_id")
        .option("page.cursorField", "match_id")
        .option("page.maxPages", "10")
        .load()
        .limit(3)
      assert(df.collect().length == 3)
      // 2-doc pages: the 3-row limit is covered after 2 fetches, not
      // the 5 the full walk would take
      assert(fetches.get() == 2, s"fetches=${fetches.get()}")
    } finally RestTableProvider.transportOverride = None
  }

  test("micro-batch restart replays pending payloads from the checkpoint, never regresses offsets") {
    val polls = new java.util.concurrent.atomic.AtomicInteger(0)
    RestTableProvider.transportOverride = Some(new Transport {
      override def get(url: String, params: Map[String, String]): RestResponse = {
        val p = polls.incrementAndGet()
        RestResponse(200, s"""[{"poll":$p}]""")
      }
    })
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rest-ckpt").toString
    val opts = Map("url" -> "http://x/stream")
    try {
      val s1 = new RestMicroBatchStream(opts, RestTableProvider.rawSchema, ckpt)
      assert(s1.latestOffset().json() == "1")
      // driver dies with batch (0, 1] pending — new instance, same checkpoint
      val s2 = new RestMicroBatchStream(opts, RestTableProvider.rawSchema, ckpt)
      val parts = s2.planInputPartitions(
        s2.deserializeOffset("0"), s2.deserializeOffset("1"))
      assert(parts.length == 1)
      assert(parts(0).asInstanceOf[RestPartition].docs.toSeq == Seq("""{"poll":1}"""))
      // the poll counter resumed past the replayed offset
      assert(s2.latestOffset().json() == "2")
      // committing prunes replay files but the watermark still guards
      // the counter: a third incarnation continues at 3
      s2.commit(s2.deserializeOffset("2"))
      val s3 = new RestMicroBatchStream(opts, RestTableProvider.rawSchema, ckpt)
      assert(s3.latestOffset().json() == "3")
    } finally RestTableProvider.transportOverride = None
  }

  test("micro-batch restart with a lost payload fails loudly, no silent empty batch") {
    RestTableProvider.transportOverride = Some(new Transport {
      override def get(url: String, params: Map[String, String]): RestResponse =
        RestResponse(200, """[{"v":1}]""")
    })
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rest-ckpt").toString
    val opts = Map("url" -> "http://x/stream")
    try {
      val s1 = new RestMicroBatchStream(opts, RestTableProvider.rawSchema, ckpt)
      s1.latestOffset()
      // the replay file vanishes out-of-band (the round-3 silent-loss hole)
      val lost = new java.io.File(s"$ckpt/graft-rest-bodies/poll-1.json")
      assert(lost.delete())
      val s2 = new RestMicroBatchStream(opts, RestTableProvider.rawSchema, ckpt)
      val e = intercept[IllegalStateException] {
        s2.planInputPartitions(s2.deserializeOffset("0"), s2.deserializeOffset("1"))
      }
      assert(e.getMessage.contains("poll 1"))
    } finally RestTableProvider.transportOverride = None
  }

  test("missing source option fails with a clear message") {
    val e = intercept[Exception] {
      spark.read.format("graft-rest").load().count()
    }
    assert(e.getMessage.contains("url"))
  }
}
