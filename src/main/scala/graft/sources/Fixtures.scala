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

  val heroesJson: String =
    """[
      |{"id":1,"name":"npc_dota_hero_antimage","localized_name":"Anti-Mage","primary_attr":"agi","attack_type":"Melee","roles":["Carry","Escape"],"legs":2},
      |{"id":2,"name":"npc_dota_hero_axe","localized_name":"Axe","primary_attr":"str","attack_type":"Melee","roles":["Initiator","Durable"],"legs":2}
      |]""".stripMargin
}
