package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** The SQL-text front door BEYOND TPC-H: flagship operators of the
  * engine's own surface — sessionization, per-group top-k, exact
  * grouped median, gaps-and-islands, grouped mode, ROLLUP — submitted
  * as Spark-dialect SQL through `spark.sql`, gated against the SAME
  * DuckDB twins as their DataFrame bodies (gates q110–q115). Together
  * with [[TpchSql]] this proves the text path for every major query
  * shape a SQL user writes: windows with gap rules, ranking, histogram
  * rank math, boundary anti-joins, grouping sets.
  *
  * Scale notes mirror the library bodies: the median reads a value
  * HISTOGRAM (never a fact sort); the islands text uses the
  * boundary-row formulation, so its global windows run over |islands|
  * rows, not facts — the same shape `Relational.islands` plans.
  */
object GraftSql {

  private def mny(x: String): String =
    s"floor(CAST(sum(CAST(floor(($x)*10000.0D+0.5D) AS DECIMAL(18,0))) AS DOUBLE)/10000.0D*100.0D+0.5D)/100.0D"

  /** TPC-H views plus the normalized events table — the one-call
    * setup a SQL user runs once per session. */
  def registerViews(t: Tables): Unit = {
    TpchSql.registerViews(t)
    TpchSql.registerViews(t, Seq("events"))
  }

  /** The tables each query's text reads (view-registration cost is a
    * footer read + size probe per table — touch only what you scan). */
  private val needs: Map[String, Seq[String]] = Map(
    "sessionize" -> Seq("events"),
    "top3_brand" -> Seq("lineitem", "part"),
    "exact_median" -> Seq("lineitem"),
    "islands" -> Seq("orders"),
    "mode" -> Seq("lineitem"),
    "rollup" -> Seq("lineitem"),
    "range_frame" -> Seq("orders"),
    "ignore_nulls" -> Seq("orders"))

  def run(spark: SparkSession, t: Tables, name: String): DataFrame = {
    TpchSql.registerViews(t, needs(name))
    spark.sql(sql(name))
  }

  val sql: Map[String, String] = Map(
    "sessionize" ->
      """WITH e AS (SELECT user_id, event_id, unix_micros(ts) AS us FROM events),
        |g AS (SELECT user_id, event_id, us,
        |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
        |       OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |         > 1800000000L THEN 1L ELSE 0L END AS is_new
        |  FROM e),
        |s AS (SELECT user_id, event_id, us,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                    ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g),
        |sess AS (SELECT user_id, session_id, count(*) AS n_events,
        |  max(us) - min(us) AS dur_us FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        | floor(CAST(sum(n_events) AS DOUBLE)/count(*)*10000.0D+0.5D)/10000.0D
        |   AS avg_events,
        | max(dur_us) AS max_dur_us
        |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin,
    "top3_brand" ->
      s"""WITH rv AS (
         |  SELECT p_brand, p_partkey, ${mny("l_extendedprice*(1.0D-l_discount)")} AS revenue
         |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2)
         |SELECT p_brand, rnk, p_partkey, revenue FROM (
         |  SELECT p_brand, p_partkey, revenue,
         |    CAST(row_number() OVER (PARTITION BY p_brand
         |      ORDER BY revenue DESC, p_partkey) AS BIGINT) AS rnk
         |  FROM rv)
         |WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "exact_median" ->
      """WITH x AS (SELECT l_returnflag AS rf, CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem),
        |c AS (SELECT rf, q, count(*) AS c FROM x GROUP BY 1, 2),
        |cum AS (SELECT rf, q, sum(c) OVER (PARTITION BY rf ORDER BY q) AS cum,
        |        sum(c) OVER (PARTITION BY rf) AS n FROM c),
        |v1 AS (SELECT rf, min(q) AS v1 FROM cum WHERE cum >= (n+1) div 2 GROUP BY rf),
        |v2 AS (SELECT rf, min(q) AS v2 FROM cum WHERE cum >= (n+2) div 2 GROUP BY rf)
        |SELECT v1.rf, CAST(v1.v1 + v2.v2 AS DOUBLE) / 2.0D AS median_qty
        |FROM v1 JOIN v2 USING (rf) ORDER BY rf""".stripMargin,
    "islands" ->
      """WITH ids AS (SELECT DISTINCT CAST(o_orderkey AS BIGINT) AS id
        |  FROM orders WHERE o_orderkey % 13 <> 5),
        |st AS (SELECT id AS island_start,
        |    row_number() OVER (ORDER BY id) AS rk
        |  FROM ids a WHERE NOT EXISTS (SELECT 1 FROM ids b WHERE b.id = a.id - 1)),
        |en AS (SELECT id AS island_end,
        |    row_number() OVER (ORDER BY id) AS rk
        |  FROM ids a WHERE NOT EXISTS (SELECT 1 FROM ids b WHERE b.id = a.id + 1))
        |SELECT island_start, island_end,
        |  island_end - island_start + 1 AS span_len
        |FROM st JOIN en USING (rk) ORDER BY island_start""".stripMargin,
    "mode" ->
      """SELECT l_returnflag, l_quantity, n FROM (
        |  SELECT l_returnflag, l_quantity, count(*) AS n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY count(*) DESC, l_quantity) AS rn
        |  FROM lineitem GROUP BY 1, 2)
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         | ${mny("l_quantity")} AS sum_qty, count(*) AS n_lines
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "range_frame" ->
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |    CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')
        |      AS BIGINT) AS dn,
        |    CAST(floor(o_totalprice * 100.0D + 0.5D) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, dn,
        |  count(*) OVER w AS n_30d,
        |  CAST(sum(cents) OVER w AS BIGINT) AS cents_30d
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY dn
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, dn, o_orderkey""".stripMargin,
    "ignore_nulls" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN o_totalprice > 150000.0D THEN o_orderpriority END
        |      AS big_pri
        |  FROM orders WHERE o_custkey % 50 = 3)
        |SELECT o_custkey, o_orderkey,
        |  last_value(big_pri) IGNORE NULLS OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_big_pri,
        |  first_value(big_pri) IGNORE NULLS OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS first_big_pri
        |FROM r ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
