package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text query surface (`spark.sql`) over the fixture tables,
  * covering constructs the Column API queries don't: GROUPING SETS,
  * ntile/first/last/nth window functions, INTERSECT/EXCEPT ALL,
  * correlated scalar subqueries (Catalyst decorrelation), and pivot
  * expressed as conditional aggregation. Tables are addressed inline as
  * ``parquet.`path` `` so no temp-view state leaks between queries.
  *
  * Oracle note: every query is written in the dialect intersection of
  * Spark SQL and DuckDB (casts pinned on both sides).
  */
object SqlSurface {

  private def p(d: String, t: String) = s"parquet.`$d/$t.parquet`"

  /** GROUPING SETS with grouping_id — finer than rollup/cube (E3). */
  def q39GroupingSets(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT o_orderstatus, o_orderpriority,
         | CAST(grouping(o_orderstatus) AS INT) AS g_status,
         | CAST(grouping(o_orderpriority) AS INT) AS g_prio,
         | count(*) AS n_orders
         |FROM ${p(d, "orders")}
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)

  val q39Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(grouping(o_orderstatus) AS INT) AS g_status,
      | CAST(grouping(o_orderpriority) AS INT) AS g_prio,
      | count(*) AS n_orders
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** ntile / first_value / last_value / nth_value with explicit frames
    * (E6 beyond rank/lag/lead). Deterministic: full-partition frame and
    * a unique orderBy key.
    */
  def q40NtileFirstLast(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT o_orderkey, o_orderpriority,
         | CAST(ntile(4) OVER w AS INT) AS price_quartile,
         | first_value(o_orderkey) OVER w AS cheapest_key,
         | last_value(o_orderkey) OVER
         |   (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key,
         | nth_value(o_orderkey, 2) OVER
         |   (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
         |FROM ${p(d, "orders")}
         |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin)

  val q40Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      | CAST(ntile(4) OVER w AS INT) AS price_quartile,
      | first_value(o_orderkey) OVER w AS cheapest_key,
      | last_value(o_orderkey) OVER
      |   (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key,
      | nth_value(o_orderkey, 2) OVER
      |   (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** INTERSECT ALL / EXCEPT ALL — bag semantics set ops (E8's
    * multiplicity-preserving variants).
    */
  def q41BagSetOps(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT 'inter' AS op, o_orderstatus, o_orderpriority FROM (
         |  SELECT o_orderstatus, o_orderpriority FROM ${p(d, "orders")}
         |  WHERE o_totalprice > 100000
         |  INTERSECT ALL
         |  SELECT o_orderstatus, o_orderpriority FROM ${p(d, "orders")}
         |  WHERE o_orderstatus = 'O')
         |UNION ALL
         |SELECT 'except' AS op, o_orderstatus, o_orderpriority FROM (
         |  SELECT o_orderstatus, o_orderpriority FROM ${p(d, "orders")}
         |  WHERE o_totalprice > 100000
         |  EXCEPT ALL
         |  SELECT o_orderstatus, o_orderpriority FROM ${p(d, "orders")}
         |  WHERE o_orderstatus = 'O')""".stripMargin)

  val q41Sql: String =
    """SELECT 'inter' AS op, o_orderstatus, o_orderpriority FROM (
      |  SELECT o_orderstatus, o_orderpriority FROM orders
      |  WHERE o_totalprice > 100000
      |  INTERSECT ALL
      |  SELECT o_orderstatus, o_orderpriority FROM orders
      |  WHERE o_orderstatus = 'O')
      |UNION ALL
      |SELECT 'except' AS op, o_orderstatus, o_orderpriority FROM (
      |  SELECT o_orderstatus, o_orderpriority FROM orders
      |  WHERE o_totalprice > 100000
      |  EXCEPT ALL
      |  SELECT o_orderstatus, o_orderpriority FROM orders
      |  WHERE o_orderstatus = 'O')""".stripMargin

  /** Correlated scalar subquery — Catalyst decorrelates it into an
    * aggregate + join; customers whose best order is ≥ 1.9× their own
    * average order.
    */
  def q42CorrelatedSubquery(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM ${p(d, "orders")} o
         |WHERE o_totalprice >= 1.9 * (
         |  SELECT avg(o2.o_totalprice) FROM ${p(d, "orders")} o2
         |  WHERE o2.o_custkey = o.o_custkey)""".stripMargin)

  val q42Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders o
      |WHERE o_totalprice >= 1.9 * (
      |  SELECT avg(o2.o_totalprice) FROM orders o2
      |  WHERE o2.o_custkey = o.o_custkey)""".stripMargin

  /** Pivot as conditional aggregation (dialect-portable form of
    * `groupBy().pivot()`): order counts per priority × status.
    */
  def q43Pivot(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT o_orderpriority,
         | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
         | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
         | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending,
         | CAST(sum(CASE WHEN o_orderstatus = 'O'
         |   THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS DOUBLE) AS open_value
         |FROM ${p(d, "orders")}
         |GROUP BY o_orderpriority""".stripMargin)

  val q43Sql: String =
    """SELECT o_orderpriority,
      | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
      | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
      | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending,
      | CAST(sum(CASE WHEN o_orderstatus = 'O'
      |   THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS DOUBLE) AS open_value
      |FROM orders
      |GROUP BY o_orderpriority""".stripMargin

  /** UNPIVOT (melt): wide measure columns → long (key, metric, value)
    * rows via the native `Dataset.unpivot` operator — a projection +
    * generate, no shuffle, fully streamable at any scale. Oracle is the
    * dialect-portable UNION ALL formulation.
    */
  def q70Unpivot(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.parquet(s"$d/part.parquet")
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"),
        col("p_retailprice"))
      .unpivot(Array(col("p_partkey")), "metric", "value")
  }

  val q70Sql: String =
    """SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      |UNION ALL
      |SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part""".stripMargin

  /** Correlated EXISTS / NOT EXISTS predicates — Catalyst decorrelates
    * both into semi/anti joins (RewritePredicateSubquery), so the plan
    * is two hash joins, not a per-row subquery.
    */
  def q71Exists(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT c_custkey, c_name FROM ${p(d, "customer")} c
         |WHERE EXISTS (
         |  SELECT 1 FROM ${p(d, "orders")} o
         |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
         |AND NOT EXISTS (
         |  SELECT 1 FROM ${p(d, "orders")} o
         |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""".stripMargin)

  val q71Sql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
      |AND NOT EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""".stripMargin

  /** Recursive CTE (Spark 4's WITH RECURSIVE): a generated date spine
    * LEFT-joined against orders, so days with zero orders appear — the
    * classic gap-filling shape a plain GROUP BY cannot produce. The
    * recursion is driver-bounded (90 rows), the join fans out to the
    * cluster; dialect-identical in DuckDB.
    */
  def q74RecursiveCte(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""WITH RECURSIVE days(d) AS (
         |  SELECT DATE '1995-01-01'
         |  UNION ALL SELECT d + 1 FROM days WHERE d < DATE '1995-03-31')
         |SELECT d AS day, count(o_orderkey) AS n_orders
         |FROM days LEFT JOIN ${p(d, "orders")}
         |  ON CAST(o_orderdate AS DATE) = d
         |GROUP BY d""".stripMargin)

  val q74Sql: String =
    """WITH RECURSIVE days(d) AS (
      |  SELECT DATE '1995-01-01'
      |  UNION ALL SELECT d + 1 FROM days WHERE d < DATE '1995-03-31')
      |SELECT d AS day, count(o_orderkey) AS n_orders
      |FROM days LEFT JOIN orders
      |  ON CAST(o_orderdate AS DATE) = d
      |GROUP BY d""".stripMargin

  /** RANGE frame over a temporal order key: per-customer trailing
    * 30-day order count and spend — a VALUE-based window (all rows
    * within the interval), not a row-count frame; E6 coverage the ROWS
    * frames don't exercise.
    */
  def q78RangeFrame(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT o_custkey, o_orderkey,
         | CAST(count(*) OVER w AS BIGINT) AS n_30d,
         | CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) OVER w AS DOUBLE) AS spend_30d
         |FROM ${p(d, "orders")}
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
         |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)""".stripMargin)

  val q78Sql: String =
    """SELECT o_custkey, o_orderkey,
      | count(*) OVER w AS n_30d,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) OVER w AS DOUBLE) AS spend_30d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
      |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)""".stripMargin

  /** median / mode / exact percentile_cont aggregates per group (E1
    * additions beyond q47's moments).
    */
  def q79MedianMode(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT o_orderpriority,
         | CAST(median(CAST(o_totalprice AS DOUBLE)) AS DOUBLE) AS median_price,
         | mode(o_orderstatus) AS mode_status,
         | CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS p90_price
         |FROM ${p(d, "orders")}
         |GROUP BY o_orderpriority""".stripMargin)

  val q79Sql: String =
    """SELECT o_orderpriority,
      | CAST(median(CAST(o_totalprice AS DOUBLE)) AS DOUBLE) AS median_price,
      | mode(o_orderstatus) AS mode_status,
      | CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS p90_price
      |FROM orders
      |GROUP BY o_orderpriority""".stripMargin

  /** LATERAL correlated subquery in FROM — per-nation top-2 customers
    * by balance: the "top-N per outer row" idiom that predates window
    * functions and still reads best for small N. Catalyst plans the
    * decorrelated LATERAL as the same partitioned-rank shape a window
    * would give (DomainJoin → rank), so the construct is free at
    * scale; both engines run genuinely LATERAL SQL (Spark ≥ 3.2,
    * DuckDB native).
    */
  def q272Lateral(spark: SparkSession, d: String): DataFrame =
    spark.sql(
      s"""SELECT n.n_name, t.c_name, t.c_acctbal
         |FROM ${p(d, "nation")} n,
         |LATERAL (
         |  SELECT c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
         |  FROM ${p(d, "customer")} c
         |  WHERE c.c_nationkey = n.n_nationkey
         |  ORDER BY c_acctbal DESC, c_name
         |  LIMIT 2) t""".stripMargin)

  val q272Sql: String =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n,
      |LATERAL (
      |  SELECT c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
      |  FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c_acctbal DESC, c_name
      |  LIMIT 2) t""".stripMargin
}
