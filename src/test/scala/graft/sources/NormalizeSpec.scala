package graft.sources

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("normalizeBody splits arrays, passes objects and scalars through") {
    assert(RestSource.normalizeBody("""[{"a":1},{"a":2}]""").size == 2)
    assert(RestSource.normalizeBody("""{"a":1}""") == Seq("""{"a":1}"""))
    assert(RestSource.normalizeBody("""  {"a":1} """) == Seq("""{"a":1}"""))
  }

  test("widenTeams flattens 5-hero arrays and keeps array-less rows with nulls") {
    val df = RestSource.readJson(spark, Fixtures.publicMatchesJson,
      Some(Endpoints.publicMatchesSchema))
    val wide = Normalize.widenTeams(df).orderBy("match_id")
    assert(!wide.columns.contains("radiant_team") && !wide.columns.contains("dire_team"))
    val rows = wide.select("match_id", "radiant_hero_1", "dire_hero_5").collect()
    assert(rows(0) == Row(8000000001L, 14L, 99L))
    assert(rows(1) == Row(8000000002L, 1L, 11L))
    assert(rows(2) == Row(8000000003L, null, null)) // existence-guard case
  }

  test("pivotConstantsMap unpivots {id: name} to long-form rows") {
    val rows = Normalize.pivotConstantsMap(spark, Fixtures.lobbyTypesJson, "lobby_id").collect()
    assert(rows.toSeq == Seq(
      Row("0", "Normal"), Row("1", "Practice"), Row("7", "Ranked")))
  }

  test("explicit schema keeps reads deterministic; corrupt rows quarantine") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("_corrupt_record", StringType)))
    val df = RestSource.readJson(spark, """[{"a":1},{"a":"not-a-number"}]""", Some(schema))
    val rows = df.collect()
    assert(rows.length == 2)
    assert(rows.count(_.getAs[String]("_corrupt_record") != null) == 1)
  }

  test("heroes fixture reads with array-typed roles") {
    val df = RestSource.readJson(spark, Fixtures.heroesJson, Some(Endpoints.heroesSchema))
    val axe = df.filter("id = 2").collect()(0)
    assert(axe.getAs[scala.collection.Seq[String]]("roles").toSeq == Seq("Initiator", "Durable"))
  }

  test("teams fixture loads typed with ragged null field") {
    val df = RestSource.readJson(spark, Fixtures.teamsJson, Some(Endpoints.teamsSchema))
    val rows = df.orderBy("team_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("logo_url") == "https://x/a.png")
    assert(rows(1).isNullAt(rows(1).fieldIndex("logo_url")))
  }

  test("scenario counters arrive as strings and normalize to longs") {
    val df = Endpoints.castScenarioCounts(
      RestSource.readJson(spark, Fixtures.itemTimingsJson, Some(Endpoints.itemTimingsSchema)))
    assert(df.schema("games").dataType.typeName == "long")
    val blink = df.filter("item = 'blink'").collect()(0)
    assert(blink.getAs[Long]("games") == 9921L && blink.getAs[Long]("wins") == 5210L)
  }

  test("schema drift across snapshots unions by name with nulls for missing fields") {
    val v1 = RestSource.readJson(spark, Fixtures.miscScenariosV1Json)
    val v2 = RestSource.readJson(spark, Fixtures.miscScenariosV2Json)
    val all = v1.unionByName(v2, allowMissingColumns = true)
    assert(all.count() == 2)
    assert(all.columns.contains("region") && all.columns.contains("patch"))
    assert(all.filter("patch IS NULL").count() == 1) // v1 row
    assert(all.filter("region IS NULL").count() == 1) // v2 row
  }

  test("nested match details explode to per-player rows") {
    val players = Normalize.explodePlayers(spark, Fixtures.matchDetailsJson)
      .orderBy("account_id").collect()
    assert(players.length == 2)
    assert(players(0).getAs[Long]("match_id") == 8000000001L)
    assert(players(0).getAs[Long]("gold_per_min") == 612L)
    // picks_bans / objectives project via dot paths on the same doc
    val doc = RestSource.readJson(spark, Fixtures.matchDetailsJson)
    import org.apache.spark.sql.functions.{col => c, explode => ex}
    val bans = doc.select(ex(c("picks_bans")).as("pb")).filter("pb.is_pick = false").count()
    assert(bans == 1)
  }

  test("typed entities: Dataset[PublicMatch] round-trips the fixture, modeStats aggregates") {
    val df = RestSource.readJson(spark, Fixtures.publicMatchesJson,
      Some(Endpoints.publicMatchesSchema))
    val ds = Entities.publicMatches(df)
    assert(ds.collect().map(_.match_id).sorted.toSeq ==
      Seq(8000000001L, 8000000002L, 8000000003L))
    val stats = Entities.modeStats(ds).collect().map(s => s.game_mode -> s).toMap
    // mode 22: matches 1 (2400, radiant win) and 3 (3105, radiant win)
    assert(stats(22L).n_matches == 2L)
    assert(stats(22L).avg_duration == (2400.0 + 3105.0) / 2)
    assert(stats(22L).radiant_win_rate == 1.0)
    assert(stats(1L).radiant_win_rate == 0.0)
  }

  test("epochToLocalDate renders the São Paulo calendar date (golden values)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 2024-07-01 01:30 UTC is still 2024-06-30 22:30 in São Paulo (UTC-3)
    val out = Seq(1719797400L, 1719847800L).toDF("epoch")
      .select(Normalize.epochToLocalDate(col("epoch")).as("d"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("2024-06-30", "2024-07-01"))
  }

  test("property: widenArrays preserves rows, adds 2n columns, round-trips values") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    val rowsGen = Gen.nonEmptyListOf(Gen.listOfN(5, Gen.chooseNum(1L, 150L)))
    val prop = forAll(rowsGen) { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "team")
      val wide = Normalize.widenArrays(df, Seq("team" -> "h"), 5)
      val back = wide.orderBy("id").collect().map(r => (1 to 5).map(i => r.getAs[Long](s"h_$i")).toList)
      wide.columns.length == 6 && back.toList == xs
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
