package graft.analytics

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.{Endpoints, Fixtures, Normalize, RestSource}

/** The reference's README analytics contract, end-to-end: fixture REST
  * payloads → RestSource parse → Normalize → DotaQueries aggregate,
  * asserted against hand-computed expectations from the fixture
  * matches (8000000001: radiant [14,21,34,51,86] beats dire
  * [7,19,40,72,99], ranked, 2400 s, tier 54; 8000000002: dire
  * [6,8,9,10,11] beats radiant [1..5], normal, 1800 s, tier 33;
  * 8000000003: no team arrays, ranked, 3105 s, tier 61).
  */
class DotaQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val matches = RestSource.readJson(
    spark, Fixtures.publicMatchesJson, Some(Endpoints.publicMatchesSchema))

  private lazy val lobbyNames = Normalize.pivotConstantsMap(
    spark, Fixtures.lobbyTypesJson, "lobby_id")

  test("heroWinRate: every fixture hero has 1 game; winners carry their side's outcome") {
    val out = DotaQueries.heroWinRate(matches).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // 20 distinct heroes across the two matches with team arrays;
    // match 3 (no arrays) contributes nothing
    assert(out.size == 20)
    val winners = Set(14L, 21L, 34L, 51L, 86L) ++ Set(6L, 8L, 9L, 10L, 11L)
    winners.foreach(h => assert(out(h) == ((1L, 1L, 1.0)), s"hero $h should be 1/1"))
    val losers = Set(7L, 19L, 40L, 72L, 99L) ++ (1L to 5L)
    losers.foreach(h => assert(out(h) == ((1L, 0L, 0.0)), s"hero $h should be 0/1"))
  }

  test("avgDurationBy: lobby labels join through the pivoted constants map") {
    val out = DotaQueries.avgDurationBy(matches, lobbyNames).collect()
    // lobby 0: match 2 only (1800 s); lobby 7: matches 1+3 (2400, 3105)
    assert(out.toSeq == Seq(
      Row(0L, "Normal", 1L, 1800.0),
      Row(7L, "Ranked", 2L, (2400.0 + 3105.0) / 2)))
  }

  test("topItems: pooled counts from the string-typed scenario counters, ranked by games") {
    val timings = RestSource.readJson(
      spark, Fixtures.itemTimingsJson, Some(Endpoints.itemTimingsSchema))
    val out = DotaQueries.topItems(timings, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("blink", 9921L, 5210L), ("bfury", 4312L, 2457L)))
  }

  test("heroPairs: 10 in-row pairs per 5-hero team, outcomes follow the side") {
    val out = DotaQueries.heroPairs(matches).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // 4 teams × C(5,2) = 40 pair rows, all distinct pairs here
    assert(out.size == 40)
    assert(out((14L, 21L)) == ((1L, 1L)), "winning radiant pair")
    assert(out((7L, 99L)) == ((1L, 0L)), "losing dire pair")
    assert(out((6L, 11L)) == ((1L, 1L)), "winning dire pair")
    assert(out((1L, 5L)) == ((1L, 0L)), "losing radiant pair")
    assert(!out.contains((14L, 7L)), "cross-team pairs must not exist")
  }

  test("bracketPerf: rank tiers bucket by leading digit; armless match 3 still counts") {
    val out = DotaQueries.bracketPerf(matches).collect()
    assert(out.toSeq == Seq(
      Row(3L, 1L, 1800.0, 0L, 0.0),   // tier 33 → bracket 3, dire won
      Row(5L, 1L, 2400.0, 1L, 1.0),   // tier 54 → bracket 5, radiant won
      Row(6L, 1L, 3105.0, 1L, 1.0)))  // tier 61 → bracket 6, radiant won
  }
}
