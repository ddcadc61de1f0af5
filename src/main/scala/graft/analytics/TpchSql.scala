package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/** The SQL-TEXT front door for the full TPC-H suite: every query of
  * [[TpchSuite]] (Q1–Q22, same synthetic-schema adaptations) rendered
  * as Spark-dialect ANSI SQL and submitted through `spark.sql` over
  * registered views — proving a user can drive this engine with query
  * TEXT, not just the DataFrame API, and get oracle-exact answers.
  *
  * Three-way equality contract: for every query, SQL-text ≡ DataFrame
  * path ≡ DuckDB oracle. The first leg is asserted by `TpchSqlSpec`
  * (row-for-row at sf0.001); the second and third are the per-round
  * driver gates (q88–q109 here, q64–q85 for the DataFrame bodies, both
  * families sharing the same DuckDB twin SQL verbatim).
  *
  * Dialect notes (the portability traps q87 pinned, applied suite-wide):
  *  - Bare decimal literals parse as DECIMAL in Spark SQL but DOUBLE in
  *    the DataFrame API — every fractional literal here is D-suffixed.
  *  - DuckDB `HUGEINT` → `DECIMAL(38,0)`; DuckDB `//` → `div` (both
  *    exact integral division; Spark's IntegralDivide takes integral
  *    and decimal operands and returns BIGINT).
  *  - `floor(double)` already returns BIGINT in Spark (DOUBLE in
  *    DuckDB) — the explicit casts are kept so the text reads the same.
  *  - Date filters compare the raw TIMESTAMP column (never CAST AS
  *    DATE — an intraday boundary timestamp would diverge; ADVICE r15).
  *
  * The `partsupp` view is the MATERIALIZED [[TpchSuite.partsupp]]
  * frame (one lineitem aggregate per session, persisted), so the SQL
  * path probes the same in-memory relation as the DataFrame path.
  */
object TpchSql {

  // Exact-discipline fragments (Exact.scala), Spark dialect: D-suffixed
  // literals, pure-IEEE floor quantization, exact integer-decimal sums.
  private def mny(x: String): String =
    s"floor(CAST(sum(CAST(floor(($x)*10000.0D+0.5D) AS DECIMAL(18,0))) AS DOUBLE)/10000.0D*100.0D+0.5D)/100.0D"
  private def mean(x: String): String =
    s"floor(CAST(sum(CAST(floor(($x)*1000000.0D+0.5D) AS DECIMAL(18,0))) AS DOUBLE)/1000000.0D/count(*)*10000.0D+0.5D)/10000.0D"
  private def meanL(x: String): String =
    s"floor(CAST(sum($x) AS DOUBLE)/count(*)*10000.0D+0.5D)/10000.0D"
  private val rev = "l_extendedprice*(1.0D-l_discount)"

  /** Register the full suite's views: the seven base tables under
    * their canonical names plus the materialized derived `partsupp` —
    * the one-call setup a SQL user runs once per session. Idempotent.
    */
  def registerViews(t: Tables): Unit =
    registerViews(t, Seq("lineitem", "orders", "customer", "supplier",
      "part", "nation", "region", "partsupp"))

  /** Register only the NAMED views. Creating a table handle is not
    * free (a parquet footer read + a size probe per table), so the
    * per-query gates register exactly what their text reads — the
    * same touch-only-what-you-scan rule the DataFrame bodies get from
    * `Tables`' lazy vals. */
  def registerViews(t: Tables, names: Seq[String]): Unit = names.foreach {
    case "lineitem" => t.lineitem.createOrReplaceTempView("lineitem")
    case "orders" => t.orders.createOrReplaceTempView("orders")
    case "customer" => t.customer.createOrReplaceTempView("customer")
    case "supplier" => t.supplier.createOrReplaceTempView("supplier")
    case "part" => t.part.createOrReplaceTempView("part")
    case "nation" => t.nation.createOrReplaceTempView("nation")
    case "region" => t.region.createOrReplaceTempView("region")
    case "partsupp" =>
      TpchSuite.partsupp(t).createOrReplaceTempView("partsupp")
    case "events" => t.events.createOrReplaceTempView("events")
    case "documents" => t.documents.createOrReplaceTempView("documents")
    case "embeddings" => t.embeddings.createOrReplaceTempView("embeddings")
    case other => throw new IllegalArgumentException(s"unknown view $other")
  }

  /** The tables each query's text reads — its view registration set. */
  private val needs: Map[Int, Seq[String]] = Map(
    1 -> Seq("lineitem"),
    2 -> Seq("partsupp", "supplier", "nation", "region", "part"),
    3 -> Seq("lineitem", "orders", "customer"),
    4 -> Seq("orders", "lineitem"),
    5 -> Seq("lineitem", "orders", "supplier", "customer", "nation", "region"),
    6 -> Seq("lineitem"),
    7 -> Seq("lineitem", "orders", "supplier", "customer", "nation"),
    8 -> Seq("lineitem", "part", "orders", "customer", "nation", "region", "supplier"),
    9 -> Seq("lineitem", "part", "partsupp", "supplier", "nation", "orders"),
    10 -> Seq("lineitem", "orders", "customer", "nation"),
    11 -> Seq("partsupp", "supplier", "nation"),
    12 -> Seq("lineitem", "orders"),
    13 -> Seq("customer", "orders"),
    14 -> Seq("lineitem", "part"),
    15 -> Seq("lineitem", "supplier"),
    16 -> Seq("partsupp", "part", "supplier"),
    17 -> Seq("lineitem", "part"),
    18 -> Seq("lineitem", "orders", "customer"),
    19 -> Seq("lineitem", "part"),
    20 -> Seq("lineitem", "part", "partsupp", "supplier", "nation"),
    21 -> Seq("orders", "lineitem", "supplier", "nation"),
    22 -> Seq("customer", "orders"))

  /** Run TPC-H query `i` (1..22) as SQL text through `spark.sql`. */
  def run(spark: SparkSession, t: Tables, i: Int): DataFrame = {
    registerViews(t, needs(i))
    spark.sql(sql(i))
  }

  /** The Spark-dialect SQL text, one entry per canonical query. */
  val sql: Map[Int, String] = Map(
    1 ->
      s"""SELECT l_returnflag, l_linestatus,
         | CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         | ${mny("l_extendedprice")} AS sum_base_price,
         | ${mny(rev)} AS sum_disc_price,
         | ${mny(rev + "*(1.0D+l_tax)")} AS sum_charge,
         | ${meanL("CAST(l_quantity AS BIGINT)")} AS avg_qty,
         | ${mean("l_extendedprice")} AS avg_price,
         | ${mean("l_discount")} AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    2 ->
      """WITH eur AS (SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |pse AS (SELECT ps.*, eur.s_name, eur.s_acctbal, eur.n_name
        |  FROM partsupp ps JOIN eur ON ps_suppkey = eur.s_suppkey),
        |mc AS (SELECT ps_partkey AS mc_partkey,
        |  min(ps_supplycost_cents) AS mc_cost FROM pse GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        |  ps_supplycost_cents
        |FROM part JOIN pse ON p_partkey = ps_partkey
        |JOIN mc ON ps_partkey = mc_partkey
        |  AND ps_supplycost_cents = mc_cost
        |WHERE p_size = 15 AND p_type = 'STANDARD'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    3 ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  ${mny(rev)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15'
         |  AND l_shipdate > TIMESTAMP '1998-03-15'
         |GROUP BY 1,2,3
         |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    4 ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
        |  AND o_orderdate < TIMESTAMP '1997-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    5 ->
      s"""SELECT n_name, ${mny(rev)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |  AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    6 ->
      s"""SELECT ${mny("l_extendedprice*l_discount")} AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_discount >= 0.05D AND l_discount <= 0.07D
         |  AND l_quantity < 24""".stripMargin,
    7 ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year, ${mny(rev)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY 1,2,3 ORDER BY 1,2,3""".stripMargin,
    8 ->
      """WITH r AS (
        | SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |   CAST(floor((l_extendedprice*(1.0D-l_discount))*10000.0D+0.5D)
        |     AS BIGINT) AS v,
        |   n2.n_name AS supp_nation
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON c_nationkey = n1.n_nationkey
        | JOIN region ON n1.n_regionkey = r_regionkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation n2 ON s_nationkey = n2.n_nationkey
        | WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |   AND o_orderdate >= TIMESTAMP '1996-01-01'
        |   AND o_orderdate < TIMESTAMP '1998-01-01'),
        |m AS (SELECT o_year,
        |   CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0L END)
        |     AS DECIMAL(38,0)) AS num,
        |   CAST(sum(v) AS DECIMAL(38,0)) AS den FROM r GROUP BY 1)
        |SELECT o_year,
        |  CAST(CASE WHEN den > 0 THEN (num * 1000000) div den END AS BIGINT)
        |    AS mkt_share_micro
        |FROM m ORDER BY o_year""".stripMargin,
    9 ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        | CAST(sum(CAST(floor((l_extendedprice*(1.0D-l_discount))*10000.0D+0.5D)
        |     AS BIGINT)
        |   - ps_supplycost_cents * 100L * CAST(l_quantity AS BIGINT))
        |   AS BIGINT) AS profit_tmil
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
        |GROUP BY 1,2 ORDER BY nation, o_year DESC""".stripMargin,
    10 ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, ${mny(rev)} AS revenue
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-10-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1,2,3,4 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    11 ->
      """WITH v AS (SELECT ps_partkey,
        |   CAST(sum(ps_supplycost_cents * ps_availqty) AS BIGINT)
        |     AS value_cents
        | FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        | WHERE n_name = 'NATION_5' GROUP BY 1),
        |g AS (SELECT CAST(sum(value_cents) AS BIGINT) AS global_cents FROM v)
        |SELECT ps_partkey, value_cents FROM v CROSS JOIN g
        |WHERE value_cents * 10000L > global_cents
        |ORDER BY value_cents DESC, ps_partkey""".stripMargin,
    12 ->
      """SELECT l_returnflag AS ship_mode,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 1L ELSE 0L END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |   THEN 0L ELSE 1L END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        |WHERE l_returnflag IN ('A','N')
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    13 ->
      """WITH co AS (SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS custdist
        |FROM co GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    14 ->
      """WITH r AS (SELECT
        |  CAST(floor((l_extendedprice*(1.0D-l_discount))*10000.0D+0.5D)
        |    AS BIGINT) AS v, p_type
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |   AND l_shipdate < TIMESTAMP '1997-10-01'),
        |m AS (SELECT
        |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN v ELSE 0L END)
        |    AS DECIMAL(38,0)) AS num,
        |  CAST(sum(v) AS DECIMAL(38,0)) AS den, count(*) AS n_lines FROM r)
        |SELECT CAST(CASE WHEN den > 0 THEN (num * 1000000) div den END
        |  AS BIGINT) AS promo_share_micro, n_lines FROM m""".stripMargin,
    15 ->
      """WITH rev AS (SELECT l_suppkey AS supplier_no,
        |  CAST(sum(CAST(floor((l_extendedprice*(1.0D-l_discount))*10000.0D+0.5D)
        |    AS BIGINT)) AS BIGINT) AS total_rev_tmil
        | FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |   AND l_shipdate < TIMESTAMP '1997-04-01'
        | GROUP BY 1),
        |m AS (SELECT max(total_rev_tmil) AS max_rev FROM rev)
        |SELECT s_suppkey, s_name, total_rev_tmil
        |FROM rev CROSS JOIN m JOIN supplier ON supplier_no = s_suppkey
        |WHERE total_rev_tmil = max_rev ORDER BY s_suppkey""".stripMargin,
    16 ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT ps_suppkey) AS supplier_cnt
        |FROM partsupp JOIN part ON ps_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1,4,9,16,25,36,49)
        |  AND ps_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1,2,3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    17 ->
      """WITH b AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
        |   CAST(floor(l_extendedprice*10000.0D+0.5D) AS BIGINT) AS pt
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_brand = 'Brand#7'),
        |a AS (SELECT l_partkey AS ap_key, CAST(sum(q) AS BIGINT) AS sum_q,
        |   count(*) AS n_q FROM b GROUP BY 1)
        |SELECT sum(pt) div 7 AS weekly_tmil,
        |  count(*) AS n_lines
        |FROM b JOIN a ON l_partkey = ap_key
        |WHERE q * 5L * n_q < sum_q""".stripMargin,
    18 ->
      """WITH big AS (SELECT l_orderkey AS big_okey,
        |  CAST(sum(l_quantity) AS BIGINT) AS total_qty
        | FROM lineitem GROUP BY 1
        | HAVING CAST(sum(l_quantity) AS BIGINT) > 320)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  total_qty
        |FROM orders JOIN big ON o_orderkey = big_okey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    19 ->
      s"""SELECT ${mny(rev)} AS revenue, count(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    20 ->
      """WITH sh AS (SELECT l_partkey AS sh_pkey, l_suppkey AS sh_skey,
        |  CAST(sum(l_quantity) AS BIGINT) AS sh_qty
        | FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |   AND l_shipdate < TIMESTAMP '1998-01-01'
        | GROUP BY 1,2),
        |ex AS (SELECT DISTINCT ps_suppkey FROM partsupp
        | JOIN sh ON ps_partkey = sh_pkey AND ps_suppkey = sh_skey
        | WHERE ps_partkey IN
        |     (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4')
        |   AND ps_availqty * 2L > sh_qty)
        |SELECT s_suppkey, s_name FROM supplier
        |WHERE s_nationkey IN
        |    (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_4')
        |  AND s_suppkey IN (SELECT ps_suppkey FROM ex)
        |ORDER BY s_suppkey""".stripMargin,
    21 ->
      """WITH ofo AS (SELECT o_orderkey, o_orderdate FROM orders
        |  WHERE o_orderstatus = 'F'),
        |ln AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
        |  FROM lineitem JOIN ofo ON l_orderkey = o_orderkey),
        |late AS (SELECT l_orderkey AS okey, l_suppkey AS skey FROM ln
        |  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
        |l1 AS (SELECT late.okey, late.skey, s_name
        |  FROM late JOIN supplier ON skey = s_suppkey
        |  WHERE s_nationkey IN
        |    (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_6'))
        |SELECT s_name, count(*) AS numwait FROM l1
        |WHERE EXISTS (SELECT 1 FROM ln
        |    WHERE ln.l_orderkey = l1.okey AND ln.l_suppkey <> l1.skey)
        |  AND NOT EXISTS (SELECT 1 FROM late la
        |    WHERE la.okey = l1.okey AND la.skey <> l1.skey)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    22 ->
      """WITH cust AS (SELECT c_custkey, c_acctbal,
        |   CAST(CAST(c_nationkey % 10 AS BIGINT) AS STRING) AS cntrycode
        | FROM customer WHERE c_nationkey % 10 IN (1,3,5,7,9)),
        |a AS (SELECT CAST(sum(CAST(floor(c_acctbal*100.0D+0.5D) AS BIGINT))
        |    AS BIGINT) AS sum_cents, count(*) AS n_pos
        |  FROM cust WHERE c_acctbal > 0.0D)
        |SELECT cntrycode, count(*) AS numcust,
        |  floor(CAST(sum(CAST(floor(c_acctbal*100.0D+0.5D) AS BIGINT))
        |    AS DOUBLE)/100.0D*100.0D+0.5D)/100.0D AS totacctbal
        |FROM cust CROSS JOIN a
        |WHERE CAST(floor(c_acctbal*100.0D+0.5D) AS BIGINT) * n_pos > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
