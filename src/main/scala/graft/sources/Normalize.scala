package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** The reference's two signature shape transforms, as pure
  * projections (no UDFs, fully codegen'd, trivially distributed):
  *
  *  - array widening: the publicMatches payload carries two 5-element
  *    hero-id arrays per match that the reference eagerly flattens to
  *    scalar columns for SQL-friendliness (`opendotaapi.py:105-112`).
  *    We keep the array column AND offer the flatten.
  *  - constants map pivot: `{id: name}` JSON objects unpivoted to
  *    long-form rows (`opendotaapi.py:136,156,176`).
  */
object Normalize {

  /** Explode fixed-length array columns into indexed scalar columns:
    * `radiant_team` → `radiant_hero_1..5`. Null-safe: a row missing
    * the array (the reference's existence-guard case,
    * `opendotaapi.py:106`) gets nulls, the row is preserved.
    */
  def widenArrays(
      df: DataFrame,
      arrays: Seq[(String, String)],
      n: Int = 5,
      keepSource: Boolean = false): DataFrame = {
    val widened = arrays.foldLeft(df) { case (d, (src, prefix)) =>
      (1 to n).foldLeft(d)((dd, i) =>
        dd.withColumn(s"${prefix}_$i", element_at(col(src), i)))
    }
    if (keepSource) widened else widened.drop(arrays.map(_._1): _*)
  }

  /** The publicMatches widening specifically. */
  def widenTeams(df: DataFrame): DataFrame =
    widenArrays(df, Seq("radiant_team" -> "radiant_hero", "dire_team" -> "dire_hero"))

  /** Unpivot a JSON `{key: value}` map column into long-form rows
    * (keyName, valueName). Works on any map-shaped payload — lobby
    * types, game modes, clusters.
    */
  def pivotMapColumn(df: DataFrame, jsonCol: Column, keyName: String, valueName: String): DataFrame =
    df.select(explode(from_json(jsonCol, MapType(StringType, StringType))).as(Seq(keyName, valueName)))

  /** Per-player rows from a nested match-details document: the deep
    * payload stays one raw document (SURVEY §7.4.3 — don't force full
    * structification of drifting JSON); consumers project with
    * `explode` over the inferred array-of-struct columns. This is the
    * "per-player performance" capability of the reference's README.
    */
  def explodePlayers(spark: org.apache.spark.sql.SparkSession, body: String): DataFrame = {
    val doc = RestSource.readJson(spark, body)
    doc.select(col("match_id"), explode(col("players")).as("p"))
      .select(col("match_id"), col("p.*"))
  }

  /** Epoch seconds → local calendar date string in `tz` — the
    * reference derives its load-date partition from the first match's
    * start_time rendered in America/Sao_Paulo. The session stays UTC
    * (GraftSession); tz conversion is explicit per use, never ambient.
    */
  def epochToLocalDate(epochSeconds: Column, tz: String = "America/Sao_Paulo"): Column =
    date_format(from_utc_timestamp(timestamp_seconds(epochSeconds), tz), "yyyy-MM-dd")

  /** Whole-payload variant: one JSON object body → rows. */
  def pivotConstantsMap(
      spark: org.apache.spark.sql.SparkSession,
      body: String,
      keyName: String,
      valueName: String = "name"): DataFrame = {
    import spark.implicits._
    pivotMapColumn(Seq(body).toDF("payload"), col("payload"), keyName, valueName)
      .orderBy(keyName)
  }
}
