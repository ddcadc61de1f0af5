package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Typed core entities: `Dataset[T]` views over the connector's
  * frames for the places compile-time safety pays — analytics code
  * that survives refactors, typed aggregators, mapGroups logic.
  * Dynamic/drifting payloads (the 22 passthrough endpoints) stay
  * DataFrames on purpose: forcing full structification of unstable
  * JSON is how schemas rot (SURVEY §7.4 hazard 3).
  */
object Entities {

  final case class PublicMatch(
      match_id: Long,
      match_seq_num: Option[Long],
      radiant_win: Option[Boolean],
      start_time: Option[Long],
      duration: Option[Long],
      lobby_type: Option[Long],
      game_mode: Option[Long],
      avg_rank_tier: Option[Long],
      num_rank_tier: Option[Long],
      cluster: Option[Long],
      radiant_team: Option[Seq[Long]],
      dire_team: Option[Seq[Long]])

  final case class Hero(
      id: Long,
      name: String,
      localized_name: String,
      primary_attr: String,
      attack_type: String,
      roles: Seq[String],
      legs: Option[Long])

  def publicMatches(df: DataFrame): Dataset[PublicMatch] =
    df.as(Encoders.product[PublicMatch])

  def heroes(df: DataFrame): Dataset[Hero] =
    df.as(Encoders.product[Hero])

  /** Typed example of the reference's headline analytic (win rate /
    * duration per mode) — groupByKey + typed reduction; the same
    * shape Catalyst compiles for the untyped twin, with the schema
    * enforced by the compiler instead of runtime column strings.
    */
  final case class ModeStats(game_mode: Long, n_matches: Long, avg_duration: Double, radiant_win_rate: Double)

  def modeStats(matches: Dataset[PublicMatch]): Dataset[ModeStats] = {
    implicit val enc = Encoders.product[ModeStats]
    implicit val tup = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    matches
      .filter(_.game_mode.isDefined)
      .groupByKey(_.game_mode.get)(Encoders.scalaLong)
      .mapValues(m => (1L, m.duration.getOrElse(0L), if (m.radiant_win.contains(true)) 1L else 0L, 0L))(tup)
      .reduceGroups((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, 0L))
      .map { case (mode, (n, dur, wins, _)) =>
        ModeStats(mode, n, dur.toDouble / n, wins.toDouble / n)
      }
  }
}
