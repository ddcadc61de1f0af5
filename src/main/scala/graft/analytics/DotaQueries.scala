package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's DECLARED analytics surface as a named library —
  * `README.md:22-36` promises per-hero win rate, average match
  * duration, most popular items, most efficient hero pairs, and
  * performance across skill brackets; the engine had every capability
  * as generic operators (q03/q04 joins, q10 top-k, q17 pairs, q44
  * percentiles) but no functions a user of the reference could call
  * by name. These run over the CONNECTOR entities (the
  * `Endpoints.publicMatchesSchema` / `itemTimingsSchema` frames the
  * RestSource → Normalize path produces), end-to-end spec'd from
  * fixture payloads.
  *
  * Scale notes: every function is one explode (bounded ×5/×10 per
  * match — team size is a constant, not a data-dependent fan-out)
  * plus one partial-aggregating groupBy keyed on hero/pair/bracket —
  * key cardinality is the hero universe (~120) squared at worst, so
  * the post-shuffle frames are tiny at any corpus size. The lobby
  * lookup is a broadcast of a constants map. Matches missing the team
  * arrays (the reference's existence-guard case) drop out of the
  * explode naturally and are excluded from team-based stats — the
  * same rows the reference's flattening would emit as all-null.
  */
object DotaQueries {

  /** Side-tagged (match, hero, win) rows: both 5-hero arrays exploded,
    * win = (side == winner). The shared substrate of the hero stats.
    */
  private def heroOutcomes(publicMatches: DataFrame): DataFrame = {
    val sides = publicMatches.select(
      col("match_id"),
      explode(array(
        struct(col("radiant_team").as("team"), col("radiant_win").as("won")),
        struct(col("dire_team").as("team"), (!col("radiant_win")).as("won")))).as("s"))
    sides.select(
      col("match_id"),
      explode(col("s.team")).as("hero_id"),
      col("s.won"))
  }

  /** Per-hero games, wins, and win rate (README: "Taxa de vitória por
    * herói"). win_rate is one final IEEE division over exact counts.
    */
  def heroWinRate(publicMatches: DataFrame): DataFrame =
    heroOutcomes(publicMatches)
      .groupBy("hero_id")
      .agg(
        count(lit(1)).as("games"),
        sum(when(col("won"), 1L).otherwise(0L)).as("wins"))
      .withColumn("win_rate", col("wins").cast("double") / col("games"))
      .orderBy("hero_id")

  /** Average match duration by lobby type, labeled through the
    * pivoted constants map (README: "Tempo médio de partida"). The
    * constants frame is ~10 rows — broadcast, never shuffled.
    */
  def avgDurationBy(publicMatches: DataFrame, lobbyNames: DataFrame): DataFrame =
    publicMatches
      .groupBy(col("lobby_type"))
      .agg(count(lit(1)).as("n_matches"), avg(col("duration")).as("avg_duration_s"))
      .join(
        broadcast(lobbyNames.select(
          col("lobby_id").cast("long").as("lobby_type"), col("name").as("lobby_name"))),
        Seq("lobby_type"), "left")
      .select("lobby_type", "lobby_name", "n_matches", "avg_duration_s")
      .orderBy("lobby_type")

  /** Top-k items by total games across hero scenarios (README: "Itens
    * mais populares"), with pooled win rate. Input is the
    * `itemTimings` entity — counters arrive as strings (API quirk);
    * this accepts either and casts.
    */
  def topItems(itemTimings: DataFrame, k: Int = 10): DataFrame =
    itemTimings
      .select(col("item"),
        col("games").cast("long").as("g"), col("wins").cast("long").as("w"))
      .groupBy("item")
      .agg(sum("g").as("games"), sum("w").as("wins"))
      .withColumn("win_rate", col("wins").cast("double") / col("games"))
      .orderBy(col("games").desc, col("item"))
      .limit(k)

  /** Same-team hero pairs with joint games/wins/win rate (README:
    * "Combinações de heróis mais eficientes"). Pairs are generated
    * IN-ROW from each 5-hero array (flatten of per-index suffix
    * slices — pure column math, no self-join, no shuffle before the
    * aggregate), canonicalized hero_a < hero_b.
    */
  def heroPairs(publicMatches: DataFrame, minGames: Long = 1L): DataFrame = {
    val sides = publicMatches.select(
      explode(array(
        struct(col("radiant_team").as("team"), col("radiant_win").as("won")),
        struct(col("dire_team").as("team"), (!col("radiant_win")).as("won")))).as("s"))
      .select(col("s.team").as("team"), col("s.won").as("won"))
    val pairs = sides.select(
      explode(flatten(transform(col("team"), (x, i) =>
        transform(slice(col("team"), i + 2, size(col("team"))), y =>
          struct(least(x, y).as("a"), greatest(x, y).as("b")))))).as("p"),
      col("won"))
    pairs
      .groupBy(col("p.a").as("hero_a"), col("p.b").as("hero_b"))
      .agg(
        count(lit(1)).as("games"),
        sum(when(col("won"), 1L).otherwise(0L)).as("wins"))
      .filter(col("games") >= minGames)
      .withColumn("win_rate", col("wins").cast("double") / col("games"))
      .orderBy("hero_a", "hero_b")
  }

  /** Match stats per skill bracket — avg_rank_tier's leading digit
    * (Herald=1 … Immortal=8), the README's "Análise de performance em
    * diferentes níveis de habilidade". Matches without a rank tier
    * group under bracket NULL rather than disappearing.
    */
  def bracketPerf(publicMatches: DataFrame): DataFrame =
    publicMatches
      .withColumn("bracket", (col("avg_rank_tier") / 10).cast("long"))
      .groupBy("bracket")
      .agg(
        count(lit(1)).as("n_matches"),
        avg(col("duration")).as("avg_duration_s"),
        sum(when(col("radiant_win"), 1L).otherwise(0L)).as("radiant_wins"))
      .withColumn("radiant_win_rate", col("radiant_wins").cast("double") / col("n_matches"))
      .orderBy("bracket")
}
