package graft.jobs

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sinks.LakeWriter
import graft.sources._

/** End-to-end fixture-replay of the full-load pipeline: scripted
  * transport (zero egress), injected failure in the middle step,
  * partitioned lake round-trip.
  */
class ExtractionJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private final class RouteTransport(routes: Map[String, RestResponse]) extends Transport {
    override def get(url: String, params: Map[String, String]): RestResponse =
      routes.getOrElse(url.split('?').head, RestResponse(500, ""))
  }

  private def mkJob(routes: Map[String, RestResponse], root: String): ExtractionJob = {
    val client = new RestClient(new RouteTransport(routes),
      RetryPolicy(maxRetries = 1, backoffMillis = 1), _ => ())
    new ExtractionJob(spark, client, new LakeWriter(root), "http://api.test")
  }

  private val specs = Seq(
    Endpoints.publicMatches,
    Endpoints.heroes,
    Endpoints.lobbyTypes)

  test("failing middle step is skipped, later steps still run, lake is partitioned") {
    val root = Files.createTempDirectory("lake").toString
    val job = mkJob(Map(
      "http://api.test/publicMatches" -> RestResponse(200, Fixtures.publicMatchesJson),
      // heroes endpoint down → step must fail WITHOUT killing the run
      "http://api.test/heroes" -> RestResponse(503, ""),
      "http://api.test/constants/lobby_type" -> RestResponse(200, Fixtures.lobbyTypesJson)),
      root)

    val results = job.run(specs, loadDate = "2026-08-01")
    assert(results.map(_.ok) == Seq(true, false, true))
    assert(results(0).rows.contains(3L))
    assert(results(2).rows.contains(3L))

    // lake round-trip: date is a real partition column
    val pm = spark.read.parquet(s"$root/public_matches")
    assert(pm.count() == 3)
    assert(pm.columns.contains("load_date"))
    assert(pm.columns.contains("radiant_hero_1")) // normalize ran before sink
    assert(new java.io.File(s"$root/public_matches/load_date=2026-08-01").isDirectory)
  }

  test("partition pruning reaches the scan when filtering on load_date") {
    val root = Files.createTempDirectory("lake").toString
    val job = mkJob(Map(
      "http://api.test/publicMatches" -> RestResponse(200, Fixtures.publicMatchesJson)), root)
    job.run(Seq(Endpoints.publicMatches), "2026-07-01")
    job.run(Seq(Endpoints.publicMatches), "2026-08-01")

    val pruned = spark.read.parquet(s"$root/public_matches")
      .filter(org.apache.spark.sql.functions.col("load_date") === "2026-08-01")
    assert(pruned.count() == 3) // not 6: only one snapshot read
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("load_date"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("dynamic partition overwrite re-runs replace only their own date") {
    val root = Files.createTempDirectory("lake").toString
    val job = mkJob(Map(
      "http://api.test/publicMatches" -> RestResponse(200, Fixtures.publicMatchesJson)), root)
    job.run(Seq(Endpoints.publicMatches), "2026-07-01")
    job.run(Seq(Endpoints.publicMatches), "2026-08-01")
    job.run(Seq(Endpoints.publicMatches), "2026-08-01") // re-run same month
    assert(spark.read.parquet(s"$root/public_matches").count() == 6) // both months, no dupes
  }
}
