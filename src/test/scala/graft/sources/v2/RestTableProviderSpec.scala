package graft.sources.v2

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

  test("missing source option fails with a clear message") {
    val e = intercept[Exception] {
      spark.read.format("graft-rest").load().count()
    }
    assert(e.getMessage.contains("url"))
  }
}
