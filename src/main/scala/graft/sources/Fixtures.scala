package graft.sources

/** Canned REST payloads for fixture-replay — the connector's test
  * surface in a zero-egress build (SURVEY.md §5.5). Shapes mirror the
  * public OpenDota payloads the reference consumes: publicMatches
  * rows with 5-hero team arrays (`opendotaapi.py:95-123`, including a
  * row MISSING the arrays — the existence-guard case at `:106`), and
  * an `{id: name}` constants map (`opendotaapi.py:125-143`).
  */
object Fixtures {

  val publicMatchesJson: String =
    """[
      |{"match_id":8000000001,"match_seq_num":6700000001,"radiant_win":true,"start_time":1719700000,"duration":2400,"lobby_type":7,"game_mode":22,"avg_rank_tier":54,"num_rank_tier":10,"cluster":136,"radiant_team":[14,21,34,51,86],"dire_team":[7,19,40,72,99]},
      |{"match_id":8000000002,"match_seq_num":6700000002,"radiant_win":false,"start_time":1719703600,"duration":1800,"lobby_type":0,"game_mode":1,"avg_rank_tier":33,"num_rank_tier":4,"cluster":111,"radiant_team":[1,2,3,4,5],"dire_team":[6,8,9,10,11]},
      |{"match_id":8000000003,"match_seq_num":6700000003,"radiant_win":true,"start_time":1719707200,"duration":3105,"lobby_type":7,"game_mode":22,"avg_rank_tier":61,"num_rank_tier":9,"cluster":152}
      |]""".stripMargin

  val lobbyTypesJson: String =
    """{"0":"Normal","1":"Practice","7":"Ranked"}"""

  /** Media METADATA fixture (media_id, kind, width, height,
    * duration_ms, codec) — the single source of truth for the t64/t65
    * gate rows: the Spark frame AND the oracle's VALUES list are both
    * generated from this Seq, so they cannot drift. Payload bytes stay
    * null — the metadata plane is pure column math; decode is
    * spec-covered (media bytes can't ride a VALUES oracle). Edge rows:
    * a tall image narrower than the resize target (3), a video shorter
    * than one sampling stride (6), a zero-duration video (7 — excluded
    * from frame sampling), an audio row (8 — excluded from both).
    */
  val mediaMeta: Seq[(Long, String, Int, Int, Long, String)] = Seq(
    (1L, "image", 4096, 2160, 0L, "png"),
    (2L, "image", 640, 480, 0L, "jpeg"),
    (3L, "image", 120, 4000, 0L, "png"),
    (4L, "video", 1920, 1080, 9500L, "h264"),
    (5L, "video", 3840, 2160, 30000L, "av1"),
    (6L, "video", 640, 360, 1L, "vp9"),
    (7L, "video", 1280, 720, 0L, "h264"),
    (8L, "audio", 0, 0, 60000L, "opus"))

  def mediaFrame(spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.DataFrame =
    graft.multimodal.MediaOps.fromRows(spark, mediaMeta.map { case (id, kind, w, h, dur, codec) =>
      org.apache.spark.sql.Row(id, kind, null, w, h, dur, codec)
    })

  val heroesJson: String =
    """[
      |{"id":1,"name":"npc_dota_hero_antimage","localized_name":"Anti-Mage","primary_attr":"agi","attack_type":"Melee","roles":["Carry","Escape"],"legs":2},
      |{"id":2,"name":"npc_dota_hero_axe","localized_name":"Axe","primary_attr":"str","attack_type":"Melee","roles":["Initiator","Durable"],"legs":2}
      |]""".stripMargin

  /** teams payload incl. the ragged-row case (null logo_url). */
  val teamsJson: String =
    """[
      |{"team_id":101,"rating":1450.5,"wins":820,"losses":600,"last_match_time":1719700000,"name":"Team A","tag":"TA","logo_url":"https://x/a.png"},
      |{"team_id":102,"rating":1301.2,"wins":500,"losses":520,"last_match_time":1719600000,"name":"Team B","tag":"TB","logo_url":null}
      |]""".stripMargin

  val leaguesJson: String =
    """[
      |{"leagueid":15001,"ticket":null,"banner":null,"tier":"premium","name":"The Big One"},
      |{"leagueid":15002,"ticket":null,"banner":null,"tier":"amateur","name":"Open Qualifier"}
      |]""".stripMargin

  val proMatchesJson: String =
    """[
      |{"match_id":8000000001,"duration":2400,"start_time":1719700000,"radiant_team_id":101,"radiant_name":"Team A","dire_team_id":102,"dire_name":"Team B","leagueid":15001,"league_name":"The Big One","series_type":1,"radiant_score":35,"dire_score":22,"radiant_win":true}
      |]""".stripMargin

  /** scenarios payload with the reference API's numeric-as-string
    * quirk (`games`/`wins` arrive as strings).
    */
  val itemTimingsJson: String =
    """[
      |{"hero_id":1,"item":"bfury","time":900,"games":"4312","wins":"2457"},
      |{"hero_id":1,"item":"manta","time":1500,"games":"3107","wins":"1734"},
      |{"hero_id":2,"item":"blink","time":720,"games":"9921","wins":"5210"}
      |]""".stripMargin

  /** misc scenarios across two API snapshots with DRIFTED schemas —
    * the union-by-name case (second snapshot adds a field and drops
    * another).
    */
  val miscScenariosV1Json: String =
    """[
      |{"scenario":"first_blood","is_roshan":false,"region":"EU","games":"1200","wins":"700"}
      |]""".stripMargin
  val miscScenariosV2Json: String =
    """[
      |{"scenario":"first_blood","is_roshan":false,"games":"1300","wins":"760","patch":"7.36"}
      |]""".stripMargin

  /** Deeply nested match-details document (players / picks_bans /
    * objectives arrays of structs) — kept raw + projected, never
    * force-structified (SURVEY §7.4.3).
    */
  val matchDetailsJson: String =
    """{
      |"match_id":8000000001,"duration":2400,"radiant_win":true,
      |"players":[
      |  {"account_id":900001,"hero_id":14,"kills":9,"deaths":2,"assists":12,"gold_per_min":612,"xp_per_min":704},
      |  {"account_id":900002,"hero_id":7,"kills":3,"deaths":7,"assists":15,"gold_per_min":388,"xp_per_min":412}
      |],
      |"picks_bans":[
      |  {"is_pick":true,"hero_id":14,"team":0,"order":0},
      |  {"is_pick":false,"hero_id":99,"team":1,"order":1}
      |],
      |"objectives":[
      |  {"time":840,"type":"CHAT_MESSAGE_TOWER_KILL"},
      |  {"time":1460,"type":"CHAT_MESSAGE_ROSHAN_KILL"}
      |]}""".stripMargin
}
