package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Relational query surface (SURVEY.md §2.E rows E1–E11) over the fixture
  * star schema. Every query here is declared in [[graft.SparkEntry]] with a
  * DuckDB oracle, so semantics must match ANSI SQL exactly.
  *
  * Scale notes (the design target is ~100 TB fact tables on a 1000-executor
  * cluster; sf fixtures only verify correctness):
  *   - Money aggregates go through exact DECIMAL arithmetic and are cast to
  *     DOUBLE at the end: double summation order differs run-to-run across
  *     partitions, and at 1e9-scale sums the wobble exceeds the oracle's
  *     1e-6 rounding. Decimal sums are associative, hence partition-order
  *     independent — this also makes results stable across cluster sizes.
  *   - `nation`/`region` (fixed cardinality) are always broadcast;
  *     fact⋈fact joins shuffle on their join key and rely on AQE for skew.
  *   - Self range-joins are bucketized (equi-join on a time bucket plus
  *     filter) instead of a quadratic theta-join — see [[rangeJoinPairs]].
  */
object Relational {

  /** Exact money/quantity representation: values < 1e8 with 4 decimals. */
  private def decM(c: Column): Column = c.cast(DecimalType(12, 4))
  /** Exact fraction representation (discount/tax ∈ [0,1]). */
  private def decF(c: Column): Column = c.cast(DecimalType(8, 6))
  private val oneF: Column = lit(1).cast(DecimalType(8, 6))

  // ---------------------------------------------------------------- E1: agg

  /** TPC-H Q1 shape: pricing summary over lineitem (scan→partial agg→final
    * agg; one shuffle on the 6-value group key).
    */
  def q01PricingSummary(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .where(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(decM(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        sum(decM(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
        sum(decM(col("l_extendedprice")) * (oneF - decF(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        sum(decM(col("l_extendedprice")) * (oneF - decF(col("l_discount")))
          * (oneF + decF(col("l_tax")))).cast(DoubleType).as("sum_charge"),
        avg(decM(col("l_quantity"))).cast(DoubleType).as("avg_qty"),
        avg(decM(col("l_extendedprice"))).cast(DoubleType).as("avg_price"),
        avg(decF(col("l_discount"))).cast(DoubleType).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE) AS sum_disc_price,
      | CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6))) AS DECIMAL(22,10)) * (CAST(1 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6)))) AS DOUBLE) AS sum_charge,
      | CAST(avg(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS avg_qty,
      | CAST(avg(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS avg_price,
      | CAST(avg(CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE) AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** min/max/avg/count over orders, grouped by priority. */
  def q02OrdersAgg(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sum(decM(col("o_totalprice"))).cast(DoubleType).as("sum_price"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date"))

  val q02Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price,
      | min(o_orderdate) AS first_date, max(o_orderdate) AS last_date
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // --------------------------------------------- E2: distinct / count(distinct)

  def q03CountDistinct(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderstatus"), col("o_orderpriority")).as("n_status_prio"),
        count(lit(1)).as("n_orders"))

  val q03Sql: String =
    """SELECT count(DISTINCT o_custkey) AS n_cust,
      | count(DISTINCT (o_orderstatus, o_orderpriority)) AS n_status_prio,
      | count(*) AS n_orders
      |FROM orders""".stripMargin

  def q04DistinctRows(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .distinct()

  val q04Sql: String =
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"

  /** approx_count_distinct (HLL++) gated against the exact count: the
    * declared result carries the exact cardinality (oracle-checkable)
    * plus a boolean asserting the sketch landed within its documented
    * error envelope (HLL++ default rsd = 5%; the gate allows 3σ). A
    * drifting/broken sketch flips the boolean → driver-visible red.
    */
  def q05ApproxDistinct(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .agg(
        countDistinct(col("o_custkey")).as("n_exact"),
        approx_count_distinct(col("o_custkey")).as("__approx"))
      .select(col("n_exact"),
        (abs(col("__approx") - col("n_exact")).cast(DoubleType) /
          col("n_exact") <= 0.15).as("approx_within_band"))

  val q05Sql: String =
    "SELECT count(DISTINCT o_custkey) AS n_exact, true AS approx_within_band FROM orders"

  /** Exact percentiles (oracle-checked against DuckDB's quantile_cont —
    * same (n−1)·p linear interpolation) plus an error gate on the
    * approx_percentile sketch, mirroring q05's treatment of HLL: the
    * sketch must land within 2% of the exact answer or the boolean
    * flips driver-visible red.
    */
  def q51QuantileGate(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .agg(
        percentile(col("o_totalprice"), lit(0.5)).as("p50"),
        percentile(col("o_totalprice"), lit(0.9)).as("p90"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("__a50"))
      .select(col("p50"), col("p90"),
        (abs(col("__a50") - col("p50")) / col("p50") <= 0.02)
          .as("approx_within_2pct"))

  val q51Sql: String =
    """SELECT quantile_cont(o_totalprice, 0.5) AS p50,
      | quantile_cont(o_totalprice, 0.9) AS p90,
      | true AS approx_within_2pct
      |FROM orders""".stripMargin

  // ------------------------------------------------- E3: rollup / cube / sets

  def q06Rollup(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(decM(col("o_totalprice"))).cast(DoubleType).as("sum_price"))

  val q06Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin

  def q07Cube(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))

  val q07Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // ------------------------------------------------------------- E4: joins

  /** TPC-H Q5 shape: fact⋈fact shuffle joins + broadcast dimension joins.
    * lineitem⋈orders and orders⋈customer shuffle on their keys (at 100 TB
    * both sides are large); nation/region are broadcast (fixed cardinality).
    */
  def q08RevenueByNation(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(decM(col("l_extendedprice")) * (oneF - decF(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q08Sql: String =
    """SELECT r_name, n_name,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))) AS DOUBLE) AS revenue,
      | count(*) AS n_lines
      |FROM lineitem
      | JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  /** LEFT OUTER join preserving customers with zero orders. */
  def q09LeftJoinOrders(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        sum(decM(col("o_totalprice"))).cast(DoubleType).as("sum_price"))
  }

  val q09Sql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
      | CAST(sum(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey""".stripMargin

  /** LEFT SEMI join (EXISTS): customers holding at least one open order. */
  def q10SemiJoin(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d).where(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin

  /** LEFT ANTI join (NOT EXISTS): customers with no orders at all. */
  def q11AntiJoin(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  val q11Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** FULL OUTER join of two pre-aggregated sides (per-nation customer and
    * supplier counts); aggregating before the join keeps the shuffle small.
    */
  def q12FullOuter(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, d)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select(col("nationkey"), col("n_cust"), col("n_supp"))
  }

  val q12Sql: String =
    """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey, n_cust, n_supp
      |FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust
      |      FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp
      |      FROM supplier GROUP BY 1) s
      |ON c.nationkey = s.nationkey""".stripMargin

  // -------------------------------------------------- E5: range / theta join

  /** Time-proximity self-join on events: pairs of events by the same user
    * within 10 minutes of each other, counted per event-type pair.
    *
    * Scale path: a raw theta-join on `abs(ts_a - ts_b) <= δ` is quadratic
    * (BNLJ). We equi-join on (user_id, time_bucket) with the probe side
    * exploded into its 3 adjacent δ-width buckets — each qualifying pair
    * lands in exactly one bucket equality, so no dedup is needed, and the
    * join is a plain shuffle-hash join that scales linearly.
    */
  def q13RangeJoin(spark: SparkSession, d: String): DataFrame = {
    val deltaUs = 600L * 1000000L // 10 minutes in microseconds
    val ev = Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val bucketOf = floor(col("ts_us") / deltaUs).cast(LongType)
    val a = ev.select(
      col("user_id"),
      col("event_id").as("id_a"), col("event_type").as("type_a"),
      col("ts_us").as("us_a"),
      explode(array(bucketOf - 1, bucketOf, bucketOf + 1)).as("bucket"))
    val b = ev.select(
      col("user_id"),
      col("event_id").as("id_b"), col("event_type").as("type_b"),
      col("ts_us").as("us_b"),
      bucketOf.as("bucket"))
    a.join(b, Seq("user_id", "bucket"))
      .where(col("id_a") < col("id_b")
        && abs(col("us_b") - col("us_a")) <= deltaUs)
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  val q13Sql: String =
    """SELECT a.event_type AS type_a, b.event_type AS type_b,
      | count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      | AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= 600000000
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------- E6: window functions

  /** Top-3 orders per customer by totalprice (row_number window). */
  def q14Top3PerCustomer(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, d)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  val q14Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      | SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(row_number() OVER (PARTITION BY o_custkey
      |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      | FROM orders) t WHERE rn <= 3""".stripMargin

  /** Running sum + lag/lead per user over the event stream (explicit ROWS
    * frame; (ts, event_id) is a deterministic total order).
    */
  def q15WindowRunning(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        sum(decM(col("value"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"))
  }

  val q15Sql: String =
    """SELECT event_id, user_id, ts, value,
      | CAST(sum(CAST(value AS DECIMAL(12,4))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
      | lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
      | lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
      |FROM events""".stripMargin

  /** rank / dense_rank / percent_rank by totalprice within priority (rank
    * values depend only on the sort key, so ties are deterministic).
    */
  def q16Ranks(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc)
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        rank().over(w).as("price_rank"),
        dense_rank().over(w).as("price_dense_rank"),
        percent_rank().over(w).as("price_pct_rank"))
      .where(col("price_rank") <= 5)
  }

  val q16Sql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice, price_rank,
      | price_dense_rank, price_pct_rank FROM (
      | SELECT o_orderkey, o_orderpriority, o_totalprice,
      |  CAST(rank() OVER w AS INT) AS price_rank,
      |  CAST(dense_rank() OVER w AS INT) AS price_dense_rank,
      |  percent_rank() OVER w AS price_pct_rank
      | FROM orders
      | WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
      |) t WHERE price_rank <= 5""".stripMargin

  // --------------------------------------------------- E7: sort / limit / topk

  /** Global top-10 — TakeOrderedAndProject, no full sort at scale. */
  def q17TopK(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  val q17Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ------------------------------------------------------------ E8: set ops

  /** INTERSECT / EXCEPT / UNION ALL branches tagged into one relation. */
  def q18SetOps(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val rich = c.where(col("c_acctbal") > 5000).select(col("c_custkey"))
    val building = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    rich.intersect(building).select(lit("both").as("op"), col("c_custkey"))
      .union(rich.except(building).select(lit("rich_only").as("op"), col("c_custkey")))
      .union(rich.union(building).distinct()
        .select(lit("either").as("op"), col("c_custkey")))
  }

  val q18Sql: String =
    """SELECT 'both' AS op, c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |  INTERSECT
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |UNION ALL
      |SELECT 'rich_only' AS op, c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |  EXCEPT
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |UNION ALL
      |SELECT 'either' AS op, c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |  UNION
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin

  // ----------------------------------------------------- E9: scalar functions

  /** String function battery over part (all codegen'd builtins). */
  def q19StringFuncs(spark: SparkSession, d: String): DataFrame =
    Tables.part(spark, d).select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      substring(col("p_name"), 1, 4).as("name_pre"),
      concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
      length(col("p_name")).as("name_len"),
      col("p_name").like("%red%").as("is_red"),
      regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
      replace(col("p_type"), lit("ECONOMY"), lit("ECON")).as("type_short"))

  val q19Sql: String =
    """SELECT p_partkey, upper(p_name) AS name_upper,
      | substring(p_name, 1, 4) AS name_pre,
      | concat_ws('/', p_brand, p_type) AS brand_type,
      | CAST(length(p_name) AS INT) AS name_len,
      | p_name LIKE '%red%' AS is_red,
      | regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
      | replace(p_type, 'ECONOMY', 'ECON') AS type_short
      |FROM part""".stripMargin

  /** Date/time function battery over orders. */
  def q20DateFuncs(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("order_year"),
      month(col("o_orderdate")).as("order_month"),
      dayofmonth(col("o_orderdate")).as("order_day"),
      quarter(col("o_orderdate")).as("order_quarter"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(to_date(lit("2002-01-01")), col("o_orderdate")).as("days_to_2002"))

  val q20Sql: String =
    """SELECT o_orderkey,
      | CAST(year(o_orderdate) AS INT) AS order_year,
      | CAST(month(o_orderdate) AS INT) AS order_month,
      | CAST(day(o_orderdate) AS INT) AS order_day,
      | CAST(quarter(o_orderdate) AS INT) AS order_quarter,
      | CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      | CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002
      |FROM orders""".stripMargin

  /** Math + conditional battery over lineitem. */
  def q21MathConditional(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d).select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice"), 1).as("price_round"),
      ceil(col("l_quantity")).as("qty_ceil"),
      floor(col("l_quantity")).as("qty_floor"),
      abs(col("l_discount") - 0.05).as("disc_dev"),
      when(col("l_returnflag") === "R", lit("returned"))
        .when(col("l_linestatus") === "O", lit("open"))
        .otherwise(lit("closed")).as("status_label"),
      coalesce(nullif(col("l_returnflag"), lit("N")), lit("none")).as("flag_or_none"),
      greatest(col("l_tax"), col("l_discount")).as("max_rate"))

  val q21Sql: String =
    """SELECT l_orderkey, l_linenumber,
      | round(l_extendedprice, 1) AS price_round,
      | CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
      | CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
      | abs(l_discount - 0.05) AS disc_dev,
      | CASE WHEN l_returnflag = 'R' THEN 'returned'
      |      WHEN l_linestatus = 'O' THEN 'open'
      |      ELSE 'closed' END AS status_label,
      | coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
      | greatest(l_tax, l_discount) AS max_rate
      |FROM lineitem""".stripMargin

  // ------------------------------------------------------- E10: JSON in string

  /** JSON extraction from `events.props` + aggregate over the parsed value. */
  def q22JsonExtract(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("event_type"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_k"),
        sum(col("k").cast(LongType)).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  val q22Sql: String =
    """SELECT event_type, count(k) AS n_k, CAST(sum(k) AS BIGINT) AS sum_k,
      | min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT event_type,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events) t
      |GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------- E11: array ops

  /** Higher-order array functions over embeddings (dot products and norms
    * in deterministic sequential fold order → bit-identical to the oracle).
    */
  def q23ArrayOps(spark: SparkSession, d: String): DataFrame =
    Tables.embeddings(spark, d).select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      element_at(col("embedding"), 1).cast(DoubleType).as("first_val"),
      expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")
        .as("sq_norm"),
      expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) / size(embedding)")
        .as("mean_val"))

  val q23Sql: String =
    """SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
      | CAST(embedding[1] AS DOUBLE) AS first_val,
      | list_aggr(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS sq_norm,
      | list_aggr(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum') / len(embedding) AS mean_val
      |FROM embeddings""".stripMargin

  /** MAP-typed column operations (the E11 family beyond arrays):
    * aggregate a per-group (status → count) MAP via `map_from_entries`
    * over collected entry structs, then read it back with keyed
    * lookups, `map_keys`, and size — the "typed property bag" shape
    * config/metrics pipelines carry. The map itself never leaves the
    * plan (the harness's canonicalizer can't sort map columns —
    * documented); every projected readout is key-addressed or sorted,
    * so the relation is deterministic even though `collect_list`'s
    * entry ORDER is not.
    */
  def q273MapOps(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("o_orderpriority"))
      .agg(map_from_entries(collect_list(
        struct(col("o_orderstatus"), col("__n")))).as("__m"))
      .select(col("o_orderpriority"),
        size(col("__m")).as("n_statuses"),
        array_join(array_sort(map_keys(col("__m"))), ",").as("statuses_csv"),
        coalesce(element_at(col("__m"), "F"), lit(0L)).as("n_f"),
        coalesce(element_at(col("__m"), "O"), lit(0L)).as("n_o"),
        coalesce(element_at(col("__m"), "P"), lit(0L)).as("n_p"))

  val q273Sql: String =
    """SELECT o_orderpriority,
      | CAST(count(DISTINCT o_orderstatus) AS INT) AS n_statuses,
      | string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
      |   AS statuses_csv,
      | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY 1""".stripMargin

  // ------------------------------------------ E16 (batch form): event-time windows

  /** Tumbling 1-hour event-time windows per event type — the batch analog
    * of the streaming aggregation (the stream side reuses this exact
    * expression; see graft.streaming). `window()` is a plain projection +
    * hash aggregate: one shuffle on (window, event_type).
    */
  def q33EventWindows(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(decM(col("value"))).cast(DoubleType).as("sum_value"),
        avg(decM(col("value"))).cast(DoubleType).as("avg_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"), col("avg_value"))

  val q33Sql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
      | count(*) AS n_events,
      | CAST(sum(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value,
      | CAST(avg(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS avg_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ------------------------------------------- E1 (extended): statistical aggs

  /** Statistical aggregate battery: sample stddev/variance, correlation,
    * covariance, exact median/quantiles — all single-pass distributed
    * aggregates (percentile keeps a per-group buffer; at 100 TB scale
    * the approx_percentile sketch is the right variant, exercised in
    * q05's rows-only sibling).
    */
  def q47StatsAggs(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(
        stddev_samp(col("l_extendedprice")).as("sd_price"),
        var_samp(col("l_quantity")).as("var_qty"),
        corr(col("l_extendedprice"), col("l_quantity")).as("corr_price_qty"),
        covar_samp(col("l_extendedprice"), col("l_quantity")).as("cov_price_qty"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(100000)).as("median_ish"),
        expr("percentile(l_extendedprice, 0.5)").as("median_exact"))
      .drop("median_ish") // sketch value is engine-specific; keep exact for oracle

  val q47Sql: String =
    """SELECT l_returnflag,
      | stddev_samp(l_extendedprice) AS sd_price,
      | var_samp(l_quantity) AS var_qty,
      | corr(l_extendedprice, l_quantity) AS corr_price_qty,
      | covar_samp(l_extendedprice, l_quantity) AS cov_price_qty,
      | quantile_cont(l_extendedprice, 0.5) AS median_exact
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Chi-squared contingency analysis of two categorical columns — the
    * "are these associated" screen (A/B segment checks, feature/label
    * dependence, corpus source×language audits). Output is the full
    * contingency relation: per cell the observed count, the
    * independence-expected count (row·col/N), the cell's χ² contribution,
    * and the table-wide χ² statistic with its degrees of freedom.
    *
    * Scale shape: the raw table collapses to the cells×1 aggregate in
    * ONE shuffle; row totals, column totals, N, the χ² sum, and the
    * distinct-level counts behind dof are windows over that tiny
    * aggregate — nothing but the first groupBy ever touches raw rows.
    */
  def chiSquared(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("obs"))
    val all = Window.partitionBy()
    val byA = Window.partitionBy(col("a"))
    val byB = Window.partitionBy(col("b"))
    cells
      .withColumn("exp",
        sum(col("obs")).over(byA).cast(DoubleType) *
          sum(col("obs")).over(byB).cast(DoubleType) /
          sum(col("obs")).over(all).cast(DoubleType))
      .withColumn("contrib",
        (col("obs") - col("exp")) * (col("obs") - col("exp")) / col("exp"))
      .withColumn("chi2", sum(col("contrib")).over(all))
      .withColumn("dof",
        ((size(collect_set(col("a")).over(all)) - 1) *
          (size(collect_set(col("b")).over(all)) - 1)).cast(LongType))
  }

  /** Declared q111: nation × market-segment independence over customers
    * (observed cells are all 25×5 pairs on this data, so the dense
    * contingency relation is the interesting output, not its holes).
    */
  def q111ChiSquared(spark: SparkSession, d: String): DataFrame =
    chiSquared(Tables.customer(spark, d), "c_nationkey", "c_mktsegment")
      .select(col("a").as("nation"), col("b").as("segment"), col("obs"),
        col("exp"), col("contrib"), col("chi2"), col("dof"))

  /** 2-D skyline (pareto frontier) per group — "best tradeoff" queries
    * (cheapest-and-freshest supplier, highest-balance-earliest
    * customer). A row is on the frontier iff no other row in its group
    * is at least as good on both axes and better on one.
    *
    * The textbook formulation is a quadratic NOT EXISTS self-join (the
    * oracle replays exactly that); the engine instead sorts each group
    * once by (maximize DESC, minimize ASC) and keeps a row iff the
    * running minimum of the minimize-axis over its PREDECESSORS is
    * above its own value — every dominator precedes the victim in that
    * order, so one window pass is the whole operator. Rows coincident
    * on BOTH axes collapse to one representative (the frontier is a
    * set of points, not of rows). Scale shape: one shuffle on the
    * group key, a within-partition sort, no join at all.
    */
  def skyline2D(df: DataFrame, groupCol: String, maxCol: String,
      minCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(maxCol).desc, col(minCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(groupCol), col(maxCol), col(minCol))
      .withColumn("__floor", min(col(minCol)).over(w))
      .where(col("__floor").isNull || col("__floor") > col(minCol))
      .drop("__floor")
  }

  /** Declared q112: per-nation customer frontier — maximize account
    * balance, minimize customer key (a stable proxy for tenure).
    */
  def q112Skyline(spark: SparkSession, d: String): DataFrame =
    skyline2D(Tables.customer(spark, d), "c_nationkey", "c_acctbal", "c_custkey")

  val q112Sql: String =
    """SELECT c_nationkey, c_acctbal, c_custkey
      |FROM customer a
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM customer b
      |  WHERE b.c_nationkey = a.c_nationkey
      |    AND b.c_acctbal >= a.c_acctbal
      |    AND b.c_custkey <= a.c_custkey
      |    AND (b.c_acctbal > a.c_acctbal OR b.c_custkey < a.c_custkey))""".stripMargin

  /** Distributed inclusive prefix sums over an ordered support relation —
    * the shared scaffold behind [[ksStatistic]], [[mannWhitneyU]],
    * [[decileReport]] and [[weightedQuantiles]] (each collapses its raw
    * table to a (value → measures) support bounded by DISTINCT values,
    * then needs globally-ordered running sums over it).
    *
    * For each `(name, measure)` in `cums`, appends column `name` = the
    * global running sum of `measure` in `orderCol` order (inclusive of
    * the current row) and `s"${name}_total"` = the grand total repeated
    * on every row (so callers never need a driver-side scalar).
    *
    * Scale shape: range-partition by the order column, per-partition
    * totals to the driver (ONE row per partition), exclusive offsets
    * broadcast back as a literal map, windows partitioned per range —
    * no single-partition window at any size. When the materialized
    * support fits one window partition (`smallSupportRows`), the range
    * sampling pass and the offsets round-trip are pure overhead for a
    * kilobyte-scale relation, so we run the one-partition window
    * directly — halves the fixed job count at test scale without
    * touching the 100 TB path.
    *
    * Measures are summed as doubles: integral measures stay exact below
    * 2⁵³, which covers every caller (counts and integer-valued weights),
    * and keeps offset bookkeeping uniform.
    */
  private[operators] def orderedPrefixSums(supportIn: DataFrame,
      orderCol: String, cums: Seq[(String, Column)],
      smallSupportRows: Long = 1L << 22): DataFrame =
    orderedPrefixSumsBy(supportIn, Seq(col(orderCol)), cums, smallSupportRows)

  /** [[orderedPrefixSums]] with a COMPOSITE sort key — callers whose
    * order column can tie (e.g. equal revenue totals in
    * [[abcClassification]]) pass a deterministic tiebreak column so the
    * running sum is identical run-to-run and across engines.
    */
  private[operators] def orderedPrefixSumsBy(supportIn: DataFrame,
      orderCols: Seq[Column], cums: Seq[(String, Column)],
      smallSupportRows: Long = 1L << 22): DataFrame = {
    // localCheckpoint: the support feeds two jobs (size probe / totals,
    // then the windowed pass) — O(1) lineage, computed once
    val support = supportIn.localCheckpoint()
    val measures = cums.zipWithIndex.map { case ((_, m), i) =>
      s"__m$i" -> m.cast(DoubleType)
    }
    val measured = measures.foldLeft(support) { case (df, (n, m)) =>
      df.withColumn(n, m)
    }
    val out =
      if (support.count() <= smallSupportRows) {
        val w = Window.orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val all = Window.orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        cums.zipWithIndex.foldLeft(measured) { case (df, ((name, _), i)) =>
          df.withColumn(name, sum(col(s"__m$i")).over(w))
            .withColumn(s"${name}_total", sum(col(s"__m$i")).over(all))
        }
      } else {
        val parts = support.sparkSession.sparkContext.defaultParallelism
        val ranged = measured
          .repartitionByRange(parts, orderCols: _*)
          .withColumn("__pid", spark_partition_id())
          .localCheckpoint()
        val aggs = cums.indices.map(i => sum(col(s"__m$i")).as(s"t$i"))
        val perPart = ranged.groupBy(col("__pid"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map(r => (r.getInt(0),
            cums.indices.map(i => if (r.isNullAt(i + 1)) 0.0 else r.getDouble(i + 1))))
          .sortBy(_._1)
        val accs = Array.fill(cums.size)(0.0)
        val offsets: Seq[Map[Int, Double]] = cums.indices.map { i =>
          perPart.map { case (pid, ts) =>
            val o = pid -> accs(i); accs(i) += ts(i); o
          }.toMap
        }
        val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cums.zipWithIndex.foldLeft(ranged) { case (df, ((name, _), i)) =>
          df.withColumn(name,
              element_at(typedLit(offsets(i)), col("__pid")) +
                sum(col(s"__m$i")).over(w))
            .withColumn(s"${name}_total", lit(accs(i)))
        }.drop("__pid")
      }
    out.drop(measures.map(_._1): _*)
  }

  /** Two-sample Kolmogorov–Smirnov statistic — distribution drift
    * between two cohorts of one numeric column (price drift between
    * return flags, score drift between corpus snapshots). KS =
    * max |CDF_a − CDF_b| over the merged support.
    *
    * Scale shape: the raw table collapses to (value → per-cohort
    * counts) in ONE shuffle — the support relation, bounded by the
    * number of DISTINCT values, not rows. The CDFs are
    * [[orderedPrefixSums]] over that support; the KS answer is then a
    * 1-row aggregate.
    */
  def ksStatistic(df: DataFrame, valueCol: String, cohortCol: String,
      cohortA: String, cohortB: String): DataFrame = {
    val support = df
      .where(col(cohortCol) === cohortA || col(cohortCol) === cohortB)
      .groupBy(col(valueCol).as("v"))
      .agg(
        sum(when(col(cohortCol) === cohortA, 1L).otherwise(0L)).as("na"),
        sum(when(col(cohortCol) === cohortB, 1L).otherwise(0L)).as("nb"))
    orderedPrefixSums(support, "v",
      Seq("__ca" -> col("na"), "__cb" -> col("nb")))
      .agg(
        max(abs(col("__ca") / col("__ca_total") -
          col("__cb") / col("__cb_total"))).as("ks"),
        max(col("__ca_total")).cast(LongType).as("n_a"),
        max(col("__cb_total")).cast(LongType).as("n_b"))
  }

  /** Declared q114: price-distribution drift between returned ('R') and
    * delivered-in-full ('N') lineitems.
    */
  def q114KsTest(spark: SparkSession, d: String): DataFrame =
    ksStatistic(Tables.lineitem(spark, d), "l_extendedprice",
      "l_returnflag", "R", "N")

  val q114Sql: String =
    """WITH s AS (
      |  SELECT l_extendedprice AS v,
      |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS na,
      |    sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS nb
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
      |c AS (
      |  SELECT
      |    sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |      / CAST((SELECT sum(na) FROM s) AS DOUBLE) AS cdfa,
      |    sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |      / CAST((SELECT sum(nb) FROM s) AS DOUBLE) AS cdfb
      |  FROM s)
      |SELECT max(abs(cdfa - cdfb)) AS ks,
      |  CAST((SELECT sum(na) FROM s) AS BIGINT) AS n_a,
      |  CAST((SELECT sum(nb) FROM s) AS BIGINT) AS n_b
      |FROM c""".stripMargin

  /** Per-group simple linear regression (OLS closed form) — slope,
    * intercept, and r² of y on x from the five classic sufficient
    * statistics (n, Σx, Σy, Σxy, Σx², Σy²). Trend-per-entity queries
    * (price-vs-quantity slope per supplier, quality-vs-length drift
    * per source) at any scale: the sufficient statistics are plain
    * map-side-combined sums, so the whole operator is ONE hash
    * aggregate over the group key; the closed-form algebra runs on the
    * groups×1 aggregate. The oracle replays the identical formulas (not
    * DuckDB's `regr_*`) so both sides share one floating-point story.
    */
  def olsRegression(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("double").as("n"), sum(x).as("sx"),
        sum(y).as("sy"), sum(x * y).as("sxy"), sum(x * x).as("sxx"),
        sum(y * y).as("syy"))
      .where(col("n") * col("sxx") - col("sx") * col("sx") =!= 0.0)
      .select(col(groupCol), col("n").cast("long").as("n_obs"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
        col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"), col("n"))
      .select(col(groupCol), col("n_obs"), col("slope"),
        ((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"),
        (((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy")))).as("r2"))
  }

  /** Declared q117: extended-price-vs-quantity trend per supplier. */
  def q117Regression(spark: SparkSession, d: String): DataFrame =
    olsRegression(Tables.lineitem(spark, d), "l_suppkey",
      "l_quantity", "l_extendedprice")

  val q117Sql: String =
    """WITH s AS (
      |  SELECT l_suppkey,
      |    CAST(count(*) AS DOUBLE) AS n,
      |    sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
      |    sum(l_quantity * l_extendedprice) AS sxy,
      |    sum(l_quantity * l_quantity) AS sxx,
      |    sum(l_extendedprice * l_extendedprice) AS syy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_suppkey, CAST(n AS BIGINT) AS n_obs,
      |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
      |  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
      |    AS intercept,
      |  ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
      |    ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
      |FROM s WHERE n * sxx - sx * sx <> 0""".stripMargin

  /** Two-sample Mann–Whitney U — the rank-based drift test that, unlike
    * [[ksStatistic]]'s max-gap, weighs the WHOLE distribution shift
    * (and unlike a t-test assumes nothing about normality). Midranks
    * handle ties exactly.
    *
    * Scale shape: identical to the KS plan — rows collapse to a
    * (value → per-cohort counts) support relation in one shuffle, and
    * the global midranks need only [[orderedPrefixSums]] over that
    * relation.
    */
  def mannWhitneyU(df: DataFrame, valueCol: String, cohortCol: String,
      cohortA: String, cohortB: String): DataFrame = {
    val support = df
      .where(col(cohortCol) === cohortA || col(cohortCol) === cohortB)
      .groupBy(col(valueCol).as("v"))
      .agg(
        sum(when(col(cohortCol) === cohortA, 1L).otherwise(0L)).as("na"),
        sum(when(col(cohortCol) === cohortB, 1L).otherwise(0L)).as("nb"))
    // rank block for value v: [before+1, before+cnt]; midrank is the
    // block average — classic tie handling, exact in doubles since the
    // numerator stays integral
    val cnt = col("na") + col("nb")
    val ranked = orderedPrefixSums(support, "v", Seq("__cum" -> cnt))
      .withColumn("__mid",
        (col("__cum") - cnt.cast("double")) + (cnt.cast("double") + 1.0) / 2.0)
    ranked
      .agg(sum(col("__mid") * col("na")).as("ra"),
        sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"))
      .select(
        (col("ra") - col("n_a").cast("double") *
          (col("n_a").cast("double") + 1.0) / 2.0).as("u_a"),
        (col("n_a").cast("double") * col("n_b").cast("double") -
          (col("ra") - col("n_a").cast("double") *
            (col("n_a").cast("double") + 1.0) / 2.0)).as("u_b"),
        col("n_a"), col("n_b"))
  }

  /** Declared q123: rank-based price drift, returned vs delivered. */
  def q123MannWhitney(spark: SparkSession, d: String): DataFrame =
    mannWhitneyU(Tables.lineitem(spark, d), "l_extendedprice",
      "l_returnflag", "R", "N")

  val q123Sql: String =
    """WITH s AS (
      |  SELECT l_extendedprice AS v,
      |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS na,
      |    sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS nb
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY 1),
      |r AS (
      |  SELECT na, nb,
      |    CAST(sum(na + nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
      |      - (na + nb) AS DOUBLE) + (CAST(na + nb AS DOUBLE) + 1.0) / 2.0
      |      AS mid
      |  FROM s),
      |t AS (SELECT sum(mid * na) AS ra, sum(na) AS n_a, sum(nb) AS n_b FROM r)
      |SELECT
      |  ra - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) / 2.0 AS u_a,
      |  CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) -
      |    (ra - CAST(n_a AS DOUBLE) * (CAST(n_a AS DOUBLE) + 1.0) / 2.0) AS u_b,
      |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b
      |FROM t""".stripMargin

  /** Two-proportion z-test — the A/B-test significance primitive:
    * compare conversion rates between two user cohorts under the
    * pooled-variance normal approximation. Everything reduces to two
    * hash aggregates over (user → converted) — metadata-scale algebra
    * after one shuffle on the user key.
    */
  def twoProportionZ(users: DataFrame, variantCol: String,
      convCol: String): DataFrame = {
    val cells = users
      .select(col(variantCol).as("variant"), col(convCol).as("conv"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
    val w = Window.partitionBy(lit(1)).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    // two variant rows → one output row; the window is over a 2-row
    // aggregate, metadata-scale by construction
    cells
      .withColumn("__ntot", sum(col("n")).over(w))
      .withColumn("__ktot", sum(col("k")).over(w))
      .where(col("variant") === 0L)
      .select(
        (col("k").cast("double") / col("n")).as("p_a"),
        ((col("__ktot") - col("k")).cast("double") /
          (col("__ntot") - col("n"))).as("p_b"),
        col("n").as("n_a"), (col("__ntot") - col("n")).as("n_b"),
        ((col("k").cast("double") / col("n") -
          (col("__ktot") - col("k")).cast("double") / (col("__ntot") - col("n"))) /
          sqrt((col("__ktot").cast("double") / col("__ntot")) *
            (lit(1.0) - col("__ktot").cast("double") / col("__ntot")) *
            (lit(1.0) / col("n") + lit(1.0) / (col("__ntot") - col("n")))))
          .as("z"))
  }

  /** Declared q124: heavy-purchaser rate (≥ 14 purchase events) between
    * the even/odd user-id split of the events fixture — a deterministic
    * synthetic A/B assignment with a conversion definition that
    * actually splits the fixture's users (every user has ≥ 1 purchase,
    * so "any purchase" would degenerate to p=1 on both arms).
    */
  def q124AbTest(spark: SparkSession, d: String): DataFrame = {
    val users = Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .select(pmod(col("user_id"), lit(2L)).as("variant"),
        when(col("np") >= 14L, 1L).otherwise(0L).as("conv"))
    twoProportionZ(users, "variant", "conv")
  }

  val q124Sql: String =
    """WITH pc AS (
      |  SELECT user_id,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
      |  FROM events GROUP BY user_id),
      |u AS (
      |  SELECT user_id % 2 AS variant,
      |    CASE WHEN np >= 14 THEN 1 ELSE 0 END AS conv
      |  FROM pc),
      |c AS (SELECT variant, count(*) AS n, sum(conv) AS k FROM u GROUP BY 1),
      |t AS (
      |  SELECT
      |    (SELECT CAST(k AS DOUBLE) FROM c WHERE variant = 0) AS ka,
      |    (SELECT CAST(n AS DOUBLE) FROM c WHERE variant = 0) AS na,
      |    (SELECT CAST(k AS DOUBLE) FROM c WHERE variant = 1) AS kb,
      |    (SELECT CAST(n AS DOUBLE) FROM c WHERE variant = 1) AS nb)
      |SELECT ka / na AS p_a, kb / nb AS p_b,
      |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  (ka / na - kb / nb) /
      |    sqrt(((ka + kb) / (na + nb)) * (1.0 - (ka + kb) / (na + nb)) *
      |      (1.0 / na + 1.0 / nb)) AS z
      |FROM t""".stripMargin

  val q111Sql: String =
    """WITH cells AS (
      |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
      |    count(*) AS obs
      |  FROM customer GROUP BY 1, 2),
      |e AS (
      |  SELECT nation, segment, obs,
      |    CAST(sum(obs) OVER (PARTITION BY nation) AS DOUBLE) *
      |    CAST(sum(obs) OVER (PARTITION BY segment) AS DOUBLE) /
      |    CAST(sum(obs) OVER () AS DOUBLE) AS exp
      |  FROM cells),
      |c AS (
      |  SELECT nation, segment, obs, exp,
      |    (obs - exp) * (obs - exp) / exp AS contrib
      |  FROM e)
      |SELECT nation, segment, CAST(obs AS BIGINT) AS obs, exp, contrib,
      |  sum(contrib) OVER () AS chi2,
      |  CAST((count(DISTINCT nation) OVER () - 1) *
      |       (count(DISTINCT segment) OVER () - 1) AS BIGINT) AS dof
      |FROM c""".stripMargin

  /** Value-tied decile (k-tile) report — per-bucket count, bounds, and
    * mean of one numeric column, the distribution summary behind score
    * calibration tables and price-band dashboards. Buckets are assigned
    * by each DISTINCT value's exclusive cumulative count (`1 + floor(k
    * · rank_before / n)`), so tied rows land in one bucket together —
    * deterministic across engines, unlike `ntile`'s arbitrary tie
    * splitting.
    *
    * Scale shape: [[ksStatistic]]'s machinery — the raw table collapses
    * to the (value → count) support in ONE shuffle, the cumulative
    * count is [[orderedPrefixSums]], and the report is a k-row
    * aggregate OVER THE SUPPORT: bucket count, bounds, and mean all
    * derive from (v, c), so raw rows are never revisited.
    */
  def decileReport(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val support = df
      .select(col(valueCol).cast(DoubleType).as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    orderedPrefixSums(support, "v", Seq("__cum" -> col("c")))
      .withColumn("__cb", col("__cum") - col("c"))
      .withColumn("bucket",
        (lit(1L) + floor(lit(k.toDouble) * col("__cb") / col("__cum_total")))
          .cast(LongType))
      .groupBy(col("bucket"))
      .agg(sum(col("c")).as("n_rows"), min(col("v")).as("lo"),
        max(col("v")).as("hi"),
        (sum(col("v") * col("c")) / sum(col("c"))).as("avg_v"))
  }

  /** Declared q131: extended-price deciles over lineitem. */
  def q131Deciles(spark: SparkSession, d: String): DataFrame =
    decileReport(Tables.lineitem(spark, d), "l_extendedprice", k = 10)

  val q131Sql: String =
    """WITH s AS (
      |  SELECT CAST(l_extendedprice AS DOUBLE) AS v, count(*) AS c
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
      |r AS (
      |  SELECT v, c,
      |    CAST(coalesce(sum(c) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS DOUBLE) AS cb,
      |    CAST((SELECT sum(c) FROM s) AS DOUBLE) AS n
      |  FROM s)
      |SELECT CAST(1 + floor(10.0 * cb / n) AS BIGINT) AS bucket,
      |  CAST(sum(c) AS BIGINT) AS n_rows, min(v) AS lo, max(v) AS hi,
      |  sum(v * c) / sum(c) AS avg_v
      |FROM r GROUP BY 1""".stripMargin

  /** Weighted quantiles — the smallest value whose CUMULATIVE WEIGHT
    * reaches q·W (weighted-median price where weight = units sold,
    * token-budget percentiles where weight = token count). Spark's
    * `percentile` takes a frequency argument but only integer counts;
    * this is the general weighted form on [[decileReport]]'s support +
    * distributed-prefix-sum scaffolding, finishing with one aggregate
    * over the support (`min(value WHERE cum ≥ q·W)` per quantile).
    * With integer-valued weights every sum is exact below 2⁵³, so the
    * threshold comparisons are bit-deterministic on both engines.
    */
  def weightedQuantiles(df: DataFrame, valueCol: String, weightCol: String,
      qs: Seq[Double]): DataFrame = {
    val support = df
      .select(col(valueCol).cast(DoubleType).as("v"),
        col(weightCol).cast(DoubleType).as("wt"))
      .where(col("v").isNotNull && col("wt").isNotNull)
      .groupBy(col("v")).agg(sum(col("wt")).as("c"))
    val aggs = qs.map(q =>
      min(when(col("__cum") >= lit(q) * col("__cum_total"), col("v")))
        .as(s"wq${(q * 100).round}")) :+
      max(col("__cum")).as("total_w")
    orderedPrefixSums(support, "v", Seq("__cum" -> col("c")))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Declared q134: unit-weighted price quartiles over lineitem. */
  def q134WeightedQuantiles(spark: SparkSession, d: String): DataFrame =
    weightedQuantiles(Tables.lineitem(spark, d), "l_extendedprice",
      "l_quantity", Seq(0.25, 0.5, 0.75))

  val q134Sql: String =
    """WITH s AS (
      |  SELECT CAST(l_extendedprice AS DOUBLE) AS v,
      |    sum(CAST(l_quantity AS DOUBLE)) AS c
      |  FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
      |  GROUP BY 1),
      |r AS (
      |  SELECT v,
      |    sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
      |    CAST((SELECT sum(c) FROM s) AS DOUBLE) AS tw
      |  FROM s)
      |SELECT min(CASE WHEN cum >= 0.25 * tw THEN v END) AS wq25,
      |  min(CASE WHEN cum >= 0.5 * tw THEN v END) AS wq50,
      |  min(CASE WHEN cum >= 0.75 * tw THEN v END) AS wq75,
      |  max(cum) AS total_w
      |FROM r""".stripMargin

  // ---------------------------------- reference ops replayed on fixtures (§2.A)

  /** A3: SQL-string IN-list filter (reference `titanic_example_delta.py:28`). */
  def q24FilterIn(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .where("l_orderkey IN (1, 5, 7, 11, 13)")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"))

  val q24Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem WHERE l_orderkey IN (1, 5, 7, 11, 13)""".stripMargin

  /** A4+A5+A6+A7: compound OR filter, withColumn-replace with a literal,
    * local rows, positional UNION ALL (reference `:28-35,59`).
    */
  def q25UnionWithColumn(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val base = Tables.customer(spark, d)
      .where(col("c_custkey") < 3 || col("c_custkey") > 9996)
      .withColumn("c_acctbal", lit(0.0))
    val extra = Seq(
      (900001L, "Customer#900001", 1, 10.5, "BUILDING"),
      (900002L, "Customer#900002", 2, 20.5, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    base.union(extra)
  }

  val q25Sql: String =
    """SELECT c_custkey, c_name, c_nationkey, CAST(0.0 AS DOUBLE) AS c_acctbal,
      | c_mktsegment
      |FROM customer WHERE c_custkey < 3 OR c_custkey > 9996
      |UNION ALL SELECT * FROM (VALUES
      | (CAST(900001 AS BIGINT), 'Customer#900001', 1, 10.5, 'BUILDING'),
      | (CAST(900002 AS BIGINT), 'Customer#900002', 2, 20.5, 'MACHINERY'))
      | t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)""".stripMargin

  /** Quantile normalization of a numeric column across cohorts — map
    * every cohort's distribution onto the GLOBAL one (each value goes
    * to the global value at its within-cohort rank fraction), the
    * batch-effect correction a feature pipeline applies before
    * cross-cohort comparison (microarray-style normalization, score
    * calibration across annotator pools).
    *
    * Formulation chosen for scale: the rank-fraction lookup is made an
    * INTEGER EQUI-JOIN, not a range/as-of join — the global support
    * explodes to a dense (rank → value) relation (exactly n rows
    * total, linear), each cohort support row computes its target rank
    * ⌈midrank/n_g · n⌉, and one hash join on the rank resolves the
    * quantile step function. Both supports ride the usual machinery:
    * the global one through [[orderedPrefixSums]] (range-partitioned
    * above the cutoff), the cohort one through a cohort-partitioned
    * window.
    *
    * @return per (cohort, value): cohort, value, n, normalized
    */
  def quantileNormalize(df: DataFrame, cohortCol: String,
      valueCol: String): DataFrame = {
    val pts = df.select(col(cohortCol).as("__g"),
      col(valueCol).cast("double").as("__v"))
      // feeds the global and the cohort support — one data pass
      .localCheckpoint()
    val gsup = pts.groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val gk = orderedPrefixSums(gsup, "__v", Seq("__k" -> col("__c")))
    val lookup = gk.select(
      explode(sequence((col("__k") - col("__c") + 1).cast("long"),
        col("__k").cast("long"))).as("__r"),
      col("__v").as("__nv"))
    // N = total point count, a 1-row scalar off the CHECKPOINTED pts
    // (house-allowed bounded collect). The former broadcast-scalar
    // branch (`gk.agg(max(__k_total))` + crossJoin) re-ran the whole
    // global prefix-sum window a second time just to read its total —
    // one entire extra job at every scale.
    val nGlobal = pts.count().toDouble
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))
    val wk = wg.orderBy(col("__v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val csup = pts.groupBy(col("__g"), col("__v"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__kk", sum(col("__c")).over(wk).cast("double"))
      .withColumn("__ng", sum(col("__c")).over(wg).cast("double"))
    // the global count rides the TARGET side as a literal so the rank
    // lookup stays a pure equi-join (a key mixing sides would demote
    // it to a nested-loop product)
    val target = csup
      .select(col("__g"), col("__v"), col("__c"),
        ceil((col("__kk") - col("__c") + (col("__c") + 1) / 2.0) /
          col("__ng") * lit(nGlobal)).cast("long").as("__r"))
    target.join(lookup, Seq("__r"))
      .select(col("__g").as("cohort"), col("__v").as("value"),
        col("__c").as("n"), col("__nv").as("normalized"))
  }

  /** Declared q164: extended prices per return flag, normalized onto
    * the global price distribution.
    */
  def q164QuantileNormalize(spark: SparkSession, d: String): DataFrame =
    quantileNormalize(graft.core.Tables.lineitem(spark, d),
      "l_returnflag", "l_extendedprice")

  val q164Sql: String =
    """WITH pts AS MATERIALIZED (
      |  SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS v
      |  FROM lineitem),
      |gs AS MATERIALIZED (SELECT v, count(*) AS c FROM pts GROUP BY 1),
      |gk AS MATERIALIZED (
      |  SELECT v, c, CAST(sum(c) OVER (ORDER BY v) AS DOUBLE) AS kk,
      |    CAST((SELECT count(*) FROM pts) AS DOUBLE) AS n
      |  FROM gs),
      |lookup AS MATERIALIZED (
      |  SELECT CAST(unnest(range(CAST(kk - c + 1 AS BIGINT),
      |      CAST(kk + 1 AS BIGINT))) AS BIGINT) AS r,
      |    v AS nv
      |  FROM gk),
      |cs AS MATERIALIZED (SELECT g, v, count(*) AS c FROM pts GROUP BY 1, 2),
      |ck AS MATERIALIZED (
      |  SELECT g, v, c,
      |    CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS DOUBLE) AS kk,
      |    CAST(sum(c) OVER (PARTITION BY g) AS DOUBLE) AS ng
      |  FROM cs),
      |t AS MATERIALIZED (
      |  SELECT g, v, c,
      |    CAST(ceil((kk - c + (c + 1) / 2.0) / ng
      |      * (SELECT max(n) FROM gk)) AS BIGINT) AS r
      |  FROM ck)
      |SELECT t.g AS cohort, t.v AS value, CAST(t.c AS BIGINT) AS n,
      |  l.nv AS normalized
      |FROM t JOIN lookup l ON l.r = t.r""".stripMargin

  /** Mutual information (in nats) between two categorical columns —
    * the dependence measure feature selection uses where [[chiSquared]]
    * gives a significance test: MI = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))).
    * One hash aggregate to the contingency cells (domain-bounded);
    * marginals and the total re-aggregate from it; also reports the
    * normalized variant MI/min(H(x), H(y)).
    */
  def mutualInformation(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val ma = cells.groupBy(col("__a")).agg(sum(col("__c")).as("__ca"))
    val mb = cells.groupBy(col("__b")).agg(sum(col("__c")).as("__cb"))
    val tot = cells.agg(sum(col("__c")).as("__n"))
    val joined = cells.join(broadcast(ma), Seq("__a"))
      .join(broadcast(mb), Seq("__b"))
      .crossJoin(broadcast(tot))
    val pxy = col("__c").cast("double") / col("__n")
    val px = col("__ca").cast("double") / col("__n")
    val py = col("__cb").cast("double") / col("__n")
    val mi = joined.agg(
      max(col("__n")).as("__nn"),
      sum(pxy * log(pxy / (px * py))).as("mi"))
    // entropies from the marginals (broadcast-sized)
    val ha = ma.crossJoin(broadcast(tot))
      .agg((-sum((col("__ca") / col("__n")) *
        log(col("__ca") / col("__n")))).as("h_a"))
    val hb = mb.crossJoin(broadcast(tot))
      .agg((-sum((col("__cb") / col("__n")) *
        log(col("__cb") / col("__n")))).as("h_b"))
    mi.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(col("__nn").cast("long").as("n"), col("mi"),
        col("h_a"), col("h_b"),
        (col("mi") / least(col("h_a"), col("h_b"))).as("nmi"))
  }

  /** Declared q165: how much does day-of-week know about event type. */
  def q165MutualInformation(spark: SparkSession, d: String): DataFrame =
    mutualInformation(
      graft.core.Tables.events(spark, d).select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000) % 7").as("dow")),
      "event_type", "dow")

  val q165Sql: String =
    """WITH e AS (
      |  SELECT event_type AS a, (epoch_us(ts) // 86400000000) % 7 AS b
      |  FROM events),
      |cells AS (SELECT a, b, count(*) AS c FROM e GROUP BY 1, 2),
      |ma AS (SELECT a, sum(c) AS ca FROM cells GROUP BY 1),
      |mb AS (SELECT b, sum(c) AS cb FROM cells GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cells),
      |mi AS (
      |  SELECT sum((c / n.n) * ln((c / n.n) / ((ca / n.n) * (cb / n.n))))
      |    AS mi
      |  FROM cells JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN n),
      |ha AS (
      |  SELECT -sum((ca / n.n) * ln(ca / n.n)) AS h_a
      |  FROM ma CROSS JOIN n),
      |hb AS (
      |  SELECT -sum((cb / n.n) * ln(cb / n.n)) AS h_b
      |  FROM mb CROSS JOIN n)
      |SELECT CAST((SELECT CAST(n AS BIGINT) FROM n) AS BIGINT) AS n,
      |  mi.mi AS mi, ha.h_a AS h_a, hb.h_b AS h_b,
      |  mi.mi / least(ha.h_a, hb.h_b) AS nmi
      |FROM mi CROSS JOIN ha CROSS JOIN hb""".stripMargin

  /** Cumulative gains / lift curve at score deciles — the model-eval
    * companion to [[Profiling.rocAuc]]: rank the population by score
    * descending, cut into 10 value-tied deciles, and report how much
    * of the positive class the top d deciles capture (gain) and at
    * what rate multiple over baseline (lift) — the "call the top 20%"
    * targeting readout.
    *
    * Scale shape: the (score → count, positives) support in one hash
    * aggregate; descending ranks via [[orderedPrefixSums]] on the
    * negated score; the decile roll-up and its cumulative walk happen
    * on a 10-row relation.
    */
  def liftCurve(df: DataFrame, scoreCol: String,
      label: Column): DataFrame = {
    val sup = df
      .groupBy(col(scoreCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"),
        sum(when(label, 1L).otherwise(0L)).as("__p"))
      .withColumn("__negv", -col("__v"))
    val k = orderedPrefixSums(sup, "__negv",
      Seq("__k" -> col("__c"), "__kp" -> col("__p")))
    val perDecile = k
      .select(ceil(col("__k") * 10 / col("__k_total")).cast("int")
          .as("decile"),
        col("__c"), col("__p"), col("__k_total"), col("__kp_total"))
      .groupBy(col("decile"))
      .agg(sum(col("__c")).as("n"), sum(col("__p")).as("n_pos"),
        max(col("__k_total")).as("__n"), max(col("__kp_total")).as("__np"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDecile
      .withColumn("__cn", sum(col("n")).over(w))
      .withColumn("__cp", sum(col("n_pos")).over(w))
      .select(col("decile"), col("n"), col("n_pos"),
        (col("__cp") / col("__np")).as("gain"),
        ((col("__cp") / col("__cn")) / (col("__np") / col("__n")))
          .as("lift"))
  }

  /** Declared q174: does event value target purchases. */
  def q174LiftCurve(spark: SparkSession, d: String): DataFrame =
    liftCurve(
      graft.core.Tables.events(spark, d).where(col("value").isNotNull),
      "value", col("event_type") === "purchase")

  val q174Sql: String =
    """WITH e AS (
      |  SELECT CAST(value AS DOUBLE) AS v,
      |    event_type = 'purchase' AS lab
      |  FROM events WHERE value IS NOT NULL),
      |sup AS (
      |  SELECT v, count(*) AS c,
      |    sum(CASE WHEN lab THEN 1 ELSE 0 END) AS p
      |  FROM e GROUP BY 1),
      |k AS (
      |  SELECT c, p,
      |    CAST(sum(c) OVER (ORDER BY -v) AS DOUBLE) AS kk,
      |    CAST((SELECT sum(c) FROM sup) AS DOUBLE) AS n,
      |    CAST((SELECT sum(p) FROM sup) AS DOUBLE) AS np
      |  FROM sup),
      |d AS (
      |  SELECT CAST(ceil(kk * 10 / n) AS INT) AS decile,
      |    sum(c) AS nd, sum(p) AS npd, max(n) AS n, max(np) AS np
      |  FROM k GROUP BY 1)
      |SELECT decile, CAST(nd AS BIGINT) AS n, CAST(npd AS BIGINT) AS n_pos,
      |  sum(npd) OVER (ORDER BY decile) / np AS gain,
      |  (sum(npd) OVER (ORDER BY decile)
      |     / sum(nd) OVER (ORDER BY decile)) / (np / n) AS lift
      |FROM d""".stripMargin

  /** Φ(x), the standard normal CDF, via the Abramowitz–Stegun 7.1.26
    * erf polynomial (|error| < 1.5e-7) — Spark exposes no erf, so the
    * SAME closed-form polynomial runs on both engines (the oracle
    * embeds the identical constants), keeping p-values bit-comparable
    * instead of riding two libraries' erf implementations.
    */
  private[operators] def normCdf(x: Column): Column = {
    val z = abs(x) / math.sqrt(2.0)
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * z)
    val poly = t * (lit(0.254829592) +
      t * (lit(-0.284496736) +
        t * (lit(1.421413741) +
          t * (lit(-1.453152027) + t * lit(1.061405429)))))
    val erf = lit(1.0) - poly * exp(-z * z)
    when(x >= 0, (lit(1.0) + erf) / 2).otherwise((lit(1.0) - erf) / 2)
  }

  /** The identical polynomial as SQL text, for oracles. */
  private[operators] def normCdfSql(x: String): String =
    s"""CASE WHEN $x >= 0
       |  THEN (1.0 + (1.0 - (1.0 / (1.0 + 0.3275911 * (abs($x) / sqrt(2.0))))
       |    * (0.254829592 + (1.0 / (1.0 + 0.3275911 * (abs($x) / sqrt(2.0))))
       |    * (-0.284496736 + (1.0 / (1.0 + 0.3275911 * (abs($x) / sqrt(2.0))))
       |    * (1.421413741 + (1.0 / (1.0 + 0.3275911 * (abs($x) / sqrt(2.0))))
       |    * (-1.453152027 + (1.0 / (1.0 + 0.3275911 * (abs($x) / sqrt(2.0))))
       |    * 1.061405429))))
       |    * exp(-(abs($x) / sqrt(2.0)) * (abs($x) / sqrt(2.0))))) / 2
       |  ELSE (1.0 - (1.0 - (1.0 / (1.0 + 0.3275911 * (abs($x) / sqrt(2.0))))
       |    * (0.254829592 + (1.0 / (1.0 + 0.3275911 * (abs($x) / sqrt(2.0))))
       |    * (-0.284496736 + (1.0 / (1.0 + 0.3275911 * (abs($x) / sqrt(2.0))))
       |    * (1.421413741 + (1.0 / (1.0 + 0.3275911 * (abs($x) / sqrt(2.0))))
       |    * (-1.453152027 + (1.0 / (1.0 + 0.3275911 * (abs($x) / sqrt(2.0))))
       |    * 1.061405429))))
       |    * exp(-(abs($x) / sqrt(2.0)) * (abs($x) / sqrt(2.0))))) / 2
       |  END""".stripMargin.replace("\n", " ")

  /** Benjamini–Hochberg FDR control over a battery of per-group Welch
    * z-tests — the multiple-comparisons discipline a metrics platform
    * needs the moment it tests MANY segments at once: per group, a
    * first-half vs second-half drift z on the measure; p-values from
    * [[normCdf]]; BH rejects the largest prefix of ascending p with
    * p₍ᵢ₎ ≤ (i/m)·α.
    *
    * Scale shape: one map-combined aggregate per (group, half) — the
    * only pass over the data — then the battery relation is
    * group-domain-bounded: the BH sort/rank runs over m rows.
    *
    * Groups need n ≥ 2 in BOTH halves to enter the battery: a 1-row
    * half has `var_samp = null` → null p-value, and null ordering
    * differs between engines (Spark sorts nulls first ascending,
    * DuckDB last), silently corrupting every p_rank below it. The
    * inner join already drops groups missing a half entirely.
    *
    * @return per group: z, p_value, p_rank, bh_threshold, rejected
    */
  def bhFdr(df: DataFrame, groupCol: String, halfCol: Column,
      valueCol: String, alpha: Double = 0.05): DataFrame = {
    val halves = df
      .groupBy(col(groupCol), halfCol.as("__h"))
      .agg(count(lit(1)).as("__n"), avg(col(valueCol)).as("__mean"),
        var_samp(col(valueCol)).as("__var"))
      .where(col("__n") >= 2)
    val a = halves.where(col("__h"))
      .select(col(groupCol), col("__n").as("__n1"),
        col("__mean").as("__m1"), col("__var").as("__v1"))
    val b = halves.where(!col("__h"))
      .select(col(groupCol), col("__n").as("__n2"),
        col("__mean").as("__m2"), col("__var").as("__v2"))
    val z = (col("__m1") - col("__m2")) /
      sqrt(col("__v1") / col("__n1") + col("__v2") / col("__n2"))
    val scored = a.join(b, Seq(groupCol))
      .withColumn("__z", z)
      .withColumn("__p", lit(2.0) * (lit(1.0) - normCdf(abs(col("__z")))))
    val m = Window.partitionBy()
    val byP = Window.orderBy(col("__p"), col(groupCol))
    val ranked = scored
      .withColumn("__rk", row_number().over(byP))
      .withColumn("__m", count(lit(1)).over(m))
      .withColumn("__thr", col("__rk") / col("__m") * alpha)
    // BH: reject everything at or below the LARGEST rank passing its
    // threshold (a running max over the battery-sized relation)
    val cutoff = ranked.agg(
      max(when(col("__p") <= col("__thr"), col("__rk"))).as("__cut"))
    ranked.crossJoin(broadcast(cutoff))
      .select(col(groupCol), col("__z").as("z"), col("__p").as("p_value"),
        col("__rk").as("p_rank"), col("__thr").as("bh_threshold"),
        (col("__rk") <= coalesce(col("__cut"), lit(0L))).as("rejected"))
  }

  /** Declared q179: did any event type's value distribution drift
    * between the first and second half of the observation window,
    * with FDR control across the type battery.
    */
  def q179BhFdr(spark: SparkSession, d: String): DataFrame = {
    val e = graft.core.Tables.events(spark, d)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value"),
        unix_micros(col("ts")).as("__us"))
    val mid = e.agg(((min(col("__us")) + max(col("__us"))) / 2)
      .as("__mid"))
    val withHalf = e.crossJoin(broadcast(mid))
    bhFdr(withHalf, "event_type", col("__us") < col("__mid"), "value")
  }

  val q179Sql: String = {
    val phi = normCdfSql("abs(z)")
    s"""WITH e AS (
       |  SELECT event_type, value, epoch_us(ts) AS us
       |  FROM events WHERE value IS NOT NULL),
       |mid AS (SELECT (min(us) + max(us)) / 2 AS mid FROM e),
       |h AS (
       |  SELECT event_type, us < mid.mid AS h, count(*) AS n,
       |    avg(value) AS m, var_samp(value) AS v
       |  FROM e CROSS JOIN mid GROUP BY 1, 2),
       |sc AS (
       |  SELECT a.event_type,
       |    (a.m - b.m) / sqrt(a.v / a.n + b.v / b.n) AS z
       |  FROM (SELECT * FROM h WHERE h AND n >= 2) a
       |  JOIN (SELECT * FROM h WHERE NOT h AND n >= 2) b USING (event_type)),
       |p AS (
       |  SELECT event_type, z, 2.0 * (1.0 - ($phi)) AS p_value
       |  FROM sc),
       |r AS (
       |  SELECT event_type, z, p_value,
       |    CAST(row_number() OVER (ORDER BY p_value, event_type)
       |      AS BIGINT) AS p_rank,
       |    CAST(count(*) OVER () AS BIGINT) AS m
       |  FROM p),
       |cut AS (
       |  SELECT max(CASE WHEN p_value <= p_rank / CAST(m AS DOUBLE) * 0.05
       |    THEN p_rank END) AS cut FROM r)
       |SELECT event_type, z, p_value, p_rank,
       |  p_rank / CAST(m AS DOUBLE) * 0.05 AS bh_threshold,
       |  p_rank <= coalesce(cut.cut, 0) AS rejected
       |FROM r CROSS JOIN cut""".stripMargin
  }

  /** ABC contribution classification — rank items by a measure
    * descending and class them by cumulative share (A ≤ 80%, B ≤ 95%,
    * C the tail): the inventory/revenue concentration workhorse
    * ("which 20% of parts are 80% of revenue"), per-item where
    * [[Profiling.giniCoefficient]] is the one-number summary.
    *
    * Scale shape: one hash aggregate to per-item totals, descending
    * cumulative shares via [[orderedPrefixSumsBy]] on (negated
    * measure, item) — the item tiebreak makes the prefix sum
    * deterministic when totals tie (a ROWS frame ordered by the
    * measure alone assigns tied items arbitrary cum_share values that
    * can differ run-to-run and across engines), one projection.
    *
    * @return per item: item, total, cum_share, abc_class
    */
  def abcClassification(df: DataFrame, itemCol: String,
      measure: Column): DataFrame = {
    val sup = df.groupBy(col(itemCol))
      .agg(sum(measure).cast("double").as("__v"))
      .withColumn("__negv", -col("__v"))
    orderedPrefixSumsBy(sup, Seq(col("__negv"), col(itemCol)),
      Seq("__cum" -> col("__v")))
      .select(col(itemCol), col("__v").as("total"),
        (col("__cum") / col("__cum_total")).as("cum_share"),
        when(col("__cum") / col("__cum_total") <= 0.80, "A")
          .when(col("__cum") / col("__cum_total") <= 0.95, "B")
          .otherwise("C").as("abc_class"))
  }

  /** Declared q183: parts classed by revenue contribution. */
  def q183AbcParts(spark: SparkSession, d: String): DataFrame =
    abcClassification(
      graft.core.Tables.lineitem(spark, d), "l_partkey",
      col("l_extendedprice") * (lit(1.0) - col("l_discount")))

  val q183Sql: String =
    """WITH sup AS (
      |  SELECT l_partkey,
      |    CAST(sum(l_extendedprice * (1.0 - l_discount)) AS DOUBLE) AS v
      |  FROM lineitem GROUP BY 1),
      |k AS (
      |  SELECT l_partkey, v,
      |    sum(v) OVER (ORDER BY -v, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    (SELECT sum(v) FROM sup) AS tot
      |  FROM sup)
      |SELECT l_partkey, v AS total, cum / tot AS cum_share,
      |  CASE WHEN cum / tot <= 0.80 THEN 'A'
      |       WHEN cum / tot <= 0.95 THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM k""".stripMargin

  /** Leave-one-out target encoding — the leakage-free categorical
    * featurization: each row's category is encoded as the mean target
    * of all OTHER rows in that category, (Σy_c − y_i)/(n_c − 1), so a
    * row never sees its own label (the naive mean-encode trap that
    * inflates offline metrics). Singleton categories fall back to the
    * global LOO mean.
    *
    * Scale shape: one map-combined aggregate to per-category (Σ, n),
    * one broadcast-able join back, one projection — the encode is two
    * passes total and never shuffles rows by anything but the
    * category key.
    */
  def targetEncodeLoo(df: DataFrame, catCol: String, targetCol: String,
      idCol: String): DataFrame = {
    val y = col(targetCol).cast("double")
    val perCat = df.groupBy(col(catCol))
      .agg(sum(y).as("__s"), count(lit(1)).as("__n"))
    val glob = df.agg(sum(y).as("__gs"), count(lit(1)).as("__gn"))
    df.select(col(idCol), col(catCol), y.as("__y"))
      .join(perCat, Seq(catCol))
      .crossJoin(broadcast(glob))
      .select(col(idCol), col(catCol),
        when(col("__n") > 1, (col("__s") - col("__y")) / (col("__n") - 1))
          .otherwise((col("__gs") - col("__y")) / (col("__gn") - 1))
          .as("te_loo"))
  }

  /** Declared q184: events' value LOO-encoded by event type. */
  def q184TargetEncode(spark: SparkSession, d: String): DataFrame =
    targetEncodeLoo(
      graft.core.Tables.events(spark, d).where(col("value").isNotNull),
      "event_type", "value", "event_id")

  val q184Sql: String =
    """WITH e AS (
      |  SELECT event_id, event_type, CAST(value AS DOUBLE) AS y
      |  FROM events WHERE value IS NOT NULL),
      |c AS (
      |  SELECT event_type, sum(y) AS s, count(*) AS n
      |  FROM e GROUP BY 1),
      |g AS (SELECT sum(y) AS gs, count(*) AS gn FROM e)
      |SELECT e.event_id, e.event_type,
      |  CASE WHEN c.n > 1 THEN (c.s - e.y) / (c.n - 1)
      |       ELSE (g.gs - e.y) / (g.gn - 1) END AS te_loo
      |FROM e JOIN c USING (event_type) CROSS JOIN g""".stripMargin

  /** RFM customer segmentation (Hughes 1994) — the classic
    * recency/frequency/monetary quintile scoring, the workhorse
    * customer-value readout beside q102's cohort retention. Per
    * customer: recency = days since last order (anchored at the corpus
    * max date — no wall clock), frequency = order count, monetary =
    * cents-rounded spend; each scored 1–5 against the EXACT
    * interpolated quintile boundaries of its distribution, then rolled
    * into named segments.
    *
    * Determinism pins (both engines replay them):
    *  - monetary is rounded to cents BEFORE boundary computation and
    *    scoring, absorbing cross-engine double-summation-order ULP
    *    noise at its source (a per-customer sum of ≤ dozens of
    *    doubles carries ~1e-11 relative error — far inside the cent);
    *  - scores count boundaries STRICTLY below the value
    *    (`score = 1 + Σ (v > bᵢ)`; recency inverts to `5 − Σ`), so a
    *    value landing exactly on a boundary buckets low on both
    *    engines;
    *  - Spark's `percentile` and DuckDB's `quantile_cont` compute the
    *    same type-7 linear interpolation from now-identical inputs.
    *
    * Scale shape: one customer-keyed aggregate over orders (map-side
    * combined), ONE 1-row exact-percentile aggregate over the
    * customer relation broadcast back (the boundary relation is 12
    * doubles — no row-scale ordered window anywhere), one codegen
    * scoring projection, one bounded (≤125-segment-cell) aggregate.
    */
  def rfmSegmentation(orders: DataFrame, custCol: String,
      dateCol: String, amountCol: String): DataFrame = {
    val perCust = orders.groupBy(col(custCol))
      .agg(max(to_date(col(dateCol))).as("__last"),
        count(lit(1)).as("__f"),
        round(sum(col(amountCol)), 2).as("__m"))
    val anchor = perCust.agg(max(col("__last")).as("__anchor"))
    val rfm = perCust.crossJoin(broadcast(anchor))
      .select(col(custCol),
        datediff(col("__anchor"), col("__last")).cast("double").as("__r"),
        col("__f").cast("double"), col("__m"))
    val qs = typedLit(Seq(0.2, 0.4, 0.6, 0.8))
    val bounds = rfm.agg(
      percentile(col("__r"), qs).as("__rb"),
      percentile(col("__f"), qs).as("__fb"),
      percentile(col("__m"), qs).as("__mb"))
    def scoreUp(v: Column, b: Column): Column =
      (lit(1) + (0 to 3).map(i => when(v > b.getItem(i), 1).otherwise(0))
        .reduce(_ + _)).cast("int")
    val scored = rfm.crossJoin(broadcast(bounds))
      .select(col(custCol), col("__m"),
        (lit(6) - scoreUp(col("__r"), col("__rb"))).cast("int").as("r_score"),
        scoreUp(col("__f"), col("__fb")).as("f_score"),
        scoreUp(col("__m"), col("__mb")).as("m_score"))
    val segment = when(col("r_score") >= 4 && col("f_score") >= 4, "champions")
      .when(col("f_score") >= 4, "loyal")
      .when(col("r_score") >= 4 && col("f_score") <= 2, "recent")
      .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
      .otherwise("regular")
    scored.withColumn("segment", segment)
      .groupBy(col("segment"), col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("__m")), 2).as("total_monetary"))
  }

  /** Declared q198: RFM over the orders fixture. */
  def q198Rfm(spark: SparkSession, d: String): DataFrame =
    rfmSegmentation(Tables.orders(spark, d),
      "o_custkey", "o_orderdate", "o_totalprice")

  val q198Sql: String =
    """WITH pc AS (
      |  SELECT o_custkey,
      |    max(CAST(o_orderdate AS DATE)) AS last_d,
      |    count(*) AS f,
      |    round(sum(o_totalprice), 2) AS m
      |  FROM orders GROUP BY o_custkey),
      |an AS (SELECT max(last_d) AS anchor FROM pc),
      |rfm AS (
      |  SELECT o_custkey,
      |    CAST(date_diff('day', last_d, an.anchor) AS DOUBLE) AS r,
      |    CAST(f AS DOUBLE) AS f, m
      |  FROM pc CROSS JOIN an),
      |b AS (
      |  SELECT quantile_cont(r, [0.2, 0.4, 0.6, 0.8]) AS rb,
      |    quantile_cont(f, [0.2, 0.4, 0.6, 0.8]) AS fb,
      |    quantile_cont(m, [0.2, 0.4, 0.6, 0.8]) AS mb
      |  FROM rfm),
      |sc AS (
      |  SELECT o_custkey, m,
      |    6 - (1 + CASE WHEN r > rb[1] THEN 1 ELSE 0 END
      |           + CASE WHEN r > rb[2] THEN 1 ELSE 0 END
      |           + CASE WHEN r > rb[3] THEN 1 ELSE 0 END
      |           + CASE WHEN r > rb[4] THEN 1 ELSE 0 END) AS r_score,
      |    1 + CASE WHEN f > fb[1] THEN 1 ELSE 0 END
      |      + CASE WHEN f > fb[2] THEN 1 ELSE 0 END
      |      + CASE WHEN f > fb[3] THEN 1 ELSE 0 END
      |      + CASE WHEN f > fb[4] THEN 1 ELSE 0 END AS f_score,
      |    1 + CASE WHEN m > mb[1] THEN 1 ELSE 0 END
      |      + CASE WHEN m > mb[2] THEN 1 ELSE 0 END
      |      + CASE WHEN m > mb[3] THEN 1 ELSE 0 END
      |      + CASE WHEN m > mb[4] THEN 1 ELSE 0 END AS m_score
      |  FROM rfm CROSS JOIN b)
      |SELECT CASE
      |    WHEN r_score >= 4 AND f_score >= 4 THEN 'champions'
      |    WHEN f_score >= 4 THEN 'loyal'
      |    WHEN r_score >= 4 AND f_score <= 2 THEN 'recent'
      |    WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
      |    ELSE 'regular' END AS segment,
      |  CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
      |  CAST(m_score AS INT) AS m_score,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  round(sum(m), 2) AS total_monetary
      |FROM sc GROUP BY 1, 2, 3, 4""".stripMargin

  /** CUPED variance reduction for A/B readouts (Deng et al., WSDM'13):
    * adjust each unit's experiment-period metric Y by its PRE-period
    * covariate X, Y' = Y − θ(X − E[X]) with θ = cov(X,Y)/var(X), so
    * the readout variance drops by the squared X–Y correlation without
    * biasing the treatment contrast. The per-arm variance columns are
    * the point: var_cuped/var_raw is the sensitivity win a metrics
    * platform buys from one extra covariate join.
    *
    * Scale shape: one unit-keyed aggregate builds (X, Y) per unit —
    * the only pass over events — then θ/E[X] is a single global
    * scalar aggregate broadcast back, and the per-arm readout is a
    * second metadata-scale aggregate over units. No window over the
    * unit relation anywhere.
    *
    * @param units (unitCol, variantCol, xCol, yCol) one row per unit
    * @return one row per variant: n, mean_raw, mean_cuped, var_raw,
    *         var_cuped (6 dp — double accumulation-order insurance)
    */
  def cuped(units: DataFrame, variantCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    val theta = units.agg(
      (covar_samp(x, y) / var_samp(x)).as("__theta"),
      avg(x).as("__mx"))
    units.crossJoin(broadcast(theta))
      .select(col(variantCol).as("variant"), y.as("__y"),
        (y - col("__theta") * (x - col("__mx"))).as("__yc"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("__y")), 6).as("mean_raw"),
        round(avg(col("__yc")), 6).as("mean_cuped"),
        round(var_samp(col("__y")), 6).as("var_raw"),
        round(var_samp(col("__yc")), 6).as("var_cuped"))
  }

  /** Declared q204: CUPED over the events fixture — per user, the
    * pre-period (first half of the observation window by global
    * midpoint, the q179 split) total event value predicts the
    * experiment-period total; arms are the q124 even/odd user split.
    * Users carry 0 for a half they have no events in (absence IS the
    * metric, not a missing covariate).
    */
  def q204Cuped(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
      .where(col("value").isNotNull)
      .select(col("user_id"), col("value"),
        unix_micros(col("ts")).as("__us"))
    val mid = e.agg(((min(col("__us")) + max(col("__us"))) / 2).as("__mid"))
    val units = e.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(sum(when(col("__us") < col("__mid"), col("value"))
          .otherwise(lit(0.0))).as("x"),
        sum(when(col("__us") >= col("__mid"), col("value"))
          .otherwise(lit(0.0))).as("y"))
      .select(pmod(col("user_id"), lit(2L)).as("variant"),
        col("x"), col("y"))
    cuped(units, "variant", "x", "y")
  }

  val q204Sql: String =
    """WITH e AS (
      |  SELECT user_id, value, epoch_us(ts) AS us
      |  FROM events WHERE value IS NOT NULL),
      |mid AS (SELECT (min(us) + max(us)) / 2 AS mid FROM e),
      |u AS (
      |  SELECT user_id % 2 AS variant,
      |    sum(CASE WHEN us < mid.mid THEN value ELSE 0 END) AS x,
      |    sum(CASE WHEN us >= mid.mid THEN value ELSE 0 END) AS y
      |  FROM e CROSS JOIN mid GROUP BY user_id),
      |th AS (
      |  SELECT covar_samp(x, y) / var_samp(x) AS theta, avg(x) AS mx
      |  FROM u)
      |SELECT variant, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(y), 6) AS mean_raw,
      |  round(avg(y - th.theta * (x - th.mx)), 6) AS mean_cuped,
      |  round(var_samp(y), 6) AS var_raw,
      |  round(var_samp(y - th.theta * (x - th.mx)), 6) AS var_cuped
      |FROM u CROSS JOIN th GROUP BY variant, th.theta, th.mx""".stripMargin

  /** Univariate logistic regression by IRLS with a PINNED iteration
    * budget — [[olsRegression]]'s classification sibling, and the
    * fitting loop under every calibrated quality-filter threshold
    * (q91 buckets calibration; this fits the curve). Each iteration
    * is one weighted-least-squares solve whose 2×2 normal equations
    * close over FIVE scalar sums:
    *
    *   β ← (XᵀWX)⁻¹ XᵀWz,  w = p(1−p),  z = η + (y−p)/w
    *
    * so an iteration is ONE map-side-combined aggregate over the
    * rows and a driver-free broadcast of the 1-row β relation —
    * nothing driver-side, nothing quadratic, iterations=2 from β=0
    * (pinned: run-to-convergence is neither oracle-expressible nor
    * stage-count-deterministic).
    *
    * @param rows (xCol, yCol): y ∈ {0,1}
    * @return one row: b0, b1, n, mean log-likelihood (6 dp)
    */
  def logisticIrls(rows: DataFrame, xCol: String, yCol: String,
      iterations: Int = 2): DataFrame = {
    require(iterations >= 1)
    val base = rows.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).localCheckpoint()
    var beta = base.sparkSession.range(1)
      .select(lit(0.0).as("b0"), lit(0.0).as("b1"))
    for (_ <- 1 to iterations) {
      val eta = col("b0") + col("b1") * col("x")
      val p = lit(1.0) / (lit(1.0) + exp(-eta))
      val w = p * (lit(1.0) - p)
      val z = eta + (col("y") - p) / w
      val sums = base.crossJoin(broadcast(beta))
        .select(w.as("w"), (w * col("x")).as("wx"),
          (w * col("x") * col("x")).as("wxx"),
          (w * z).as("wz"), (w * col("x") * z).as("wxz"))
        .agg(sum(col("w")).as("sw"), sum(col("wx")).as("swx"),
          sum(col("wxx")).as("swxx"), sum(col("wz")).as("swz"),
          sum(col("wxz")).as("swxz"))
      val det = col("sw") * col("swxx") - col("swx") * col("swx")
      beta = sums.select(
        ((col("swxx") * col("swz") - col("swx") * col("swxz")) / det)
          .as("b0"),
        ((col("sw") * col("swxz") - col("swx") * col("swz")) / det)
          .as("b1"))
    }
    val eta = col("b0") + col("b1") * col("x")
    base.crossJoin(broadcast(beta))
      .select(col("b0"), col("b1"),
        (col("y") * eta - log(lit(1.0) + exp(eta))).as("__ll"))
      .groupBy(col("b0"), col("b1"))
      .agg(count(lit(1)).as("n"), round(avg(col("__ll")), 6).as("mean_loglik"))
      .select(round(col("b0"), 6).as("b0"), round(col("b1"), 6).as("b1"),
        col("n"), col("mean_loglik"))
  }

  /** The q217 feature build: one row per user with the volume feature,
    * the q124 conversion label, and the user id (so downstream evals
    * can split deterministically). Shared by q217/q225/q227.
    */
  private[operators] def logisticUsers(spark: SparkSession,
      d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("ne"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"))
      .select(col("user_id"), log(lit(1.0) + col("ne")).as("x"),
        when(col("np") >= 14L, 1.0).otherwise(0.0).as("y"))

  /** q217's fitted model applied back to every user: (user_id, x, y,
    * p). The fit is the 2-iteration pinned IRLS over ALL users, and
    * scoring uses the PUBLISHED (6 dp-rounded) coefficients — the
    * q225/q227 oracles round identically, so downstream order
    * statistics never ride on sub-rounding β noise.
    */
  private[operators] def logisticScoredUsers(spark: SparkSession,
      d: String): DataFrame = {
    val users = logisticUsers(spark, d).localCheckpoint()
    val beta = logisticIrls(users, "x", "y", iterations = 2)
      .select(col("b0"), col("b1"))
    users.crossJoin(broadcast(beta))
      .select(col("user_id"), col("x"), col("y"),
        (lit(1.0) / (lit(1.0) + exp(-(col("b0") + col("b1") * col("x")))))
          .as("p"))
  }

  /** Declared q217: does event volume predict heavy purchasing —
    * x = ln(1 + user's event count), y = the q124 conversion flag.
    */
  def q217Logistic(spark: SparkSession, d: String): DataFrame =
    logisticIrls(logisticUsers(spark, d), "x", "y", iterations = 2)

  /** The q217 users + 2-step IRLS fit as reusable SQL CTEs (u through
    * b2); q217/q225/q227 compose their final selects over these.
    */
  private val logisticFitCte: String =
    """u AS (
      |  SELECT user_id, ln(1.0 + count(*)) AS x,
      |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
      |                       ELSE 0 END) >= 14
      |         THEN 1.0 ELSE 0.0 END AS y
      |  FROM events GROUP BY user_id),
      |s1 AS (
      |  SELECT sum(0.25) AS sw, sum(0.25 * x) AS swx,
      |    sum(0.25 * x * x) AS swxx,
      |    sum(0.25 * ((y - 0.5) / 0.25)) AS swz,
      |    sum(0.25 * x * ((y - 0.5) / 0.25)) AS swxz
      |  FROM u),
      |b1 AS (
      |  SELECT (swxx * swz - swx * swxz) / (sw * swxx - swx * swx) AS b0,
      |    (sw * swxz - swx * swz) / (sw * swxx - swx * swx) AS b1
      |  FROM s1),
      |s2 AS (
      |  SELECT
      |    sum(p * (1 - p)) AS sw,
      |    sum(p * (1 - p) * x) AS swx,
      |    sum(p * (1 - p) * x * x) AS swxx,
      |    sum(p * (1 - p) * (eta + (y - p) / (p * (1 - p)))) AS swz,
      |    sum(p * (1 - p) * x * (eta + (y - p) / (p * (1 - p)))) AS swxz
      |  FROM (
      |    SELECT x, y, b.b0 + b.b1 * x AS eta,
      |      1.0 / (1.0 + exp(-(b.b0 + b.b1 * x))) AS p
      |    FROM u CROSS JOIN b1 b)),
      |b2 AS (
      |  SELECT (swxx * swz - swx * swxz) / (sw * swxx - swx * swx) AS b0,
      |    (sw * swxz - swx * swz) / (sw * swxx - swx * swx) AS b1
      |  FROM s2)""".stripMargin

  val q217Sql: String =
    s"""WITH $logisticFitCte
       |SELECT round(b2.b0, 6) AS b0, round(b2.b1, 6) AS b1,
       |  CAST(count(*) AS BIGINT) AS n,
       |  round(avg(u.y * (b2.b0 + b2.b1 * u.x)
       |    - ln(1.0 + exp(b2.b0 + b2.b1 * u.x))), 6) AS mean_loglik
       |FROM u CROSS JOIN b2 GROUP BY b2.b0, b2.b1""".stripMargin

  /** Split-conformal prediction interval calibration (Vovk et al.;
    * the modern distribution-free coverage recipe): with the q217
    * model scoring every user, the CALIBRATION half (even user ids)
    * yields nonconformity scores s = |y − p|, q̂ is the
    * ⌈(n+1)(1−α)⌉-th smallest calibration score, and the TEST half
    * (odd ids) reports empirical coverage of {s ≤ q̂} — which the
    * conformal guarantee says is ≥ 1−α in expectation. Honest scope
    * note: the coefficients are fit on ALL users (the pinned q217
    * fit); the exchangeability split here covers calibration vs test
    * only, and the protocol is pinned, not asymptotically tuned.
    *
    * Scale shape: score projection is map-only over the broadcast β;
    * the order statistic is one rank window over the calibration
    * HALF's score relation (user-domain-bounded — at 100 TB of events
    * this relation is |users|, already collapsed by the q217
    * aggregate); coverage is one more scalar aggregate.
    */
  def q225Conformal(spark: SparkSession, d: String): DataFrame =
    conformalCoverage(
      logisticScoredUsers(spark, d)
        .select(col("user_id"), abs(col("y") - col("p")).as("s")),
      alpha = 0.1)

  /** The split/quantile/coverage half of [[q225Conformal]], reusable
    * for any (user_id, s) nonconformity relation: even ids calibrate,
    * odd ids report coverage.
    */
  def conformalCoverage(scoredIn: DataFrame, alpha: Double): DataFrame = {
    val scored = scoredIn.select(col("user_id"), col("s"))
      .localCheckpoint() // calibration and test halves both read it
    val cal = scored.where(pmod(col("user_id"), lit(2L)) === 0)
    val test = scored.where(pmod(col("user_id"), lit(2L)) === 1)
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    val k = ceil((col("n_cal") + 1) * (1.0 - alpha)).cast("long")
    val qhat = cal
      .withColumn("__rk",
        row_number().over(Window.orderBy(col("s"), col("user_id"))))
      .crossJoin(broadcast(nCal))
      .where(col("__rk") === least(k, col("n_cal")))
      .select(col("n_cal"), round(col("s"), 6).as("qhat"))
    test.crossJoin(broadcast(qhat))
      .groupBy(col("n_cal"), col("qhat"))
      .agg(count(lit(1)).as("n_test"),
        round(avg(when(round(col("s"), 6) <= col("qhat"), 1.0)
          .otherwise(0.0)), 6).as("coverage"))
      .select(col("n_cal"), col("n_test"), col("qhat"), col("coverage"))
  }

  val q225Sql: String =
    s"""WITH $logisticFitCte,
       |scored AS (
       |  SELECT u.user_id,
       |    abs(u.y - 1.0 / (1.0 + exp(-(round(b2.b0, 6)
       |      + round(b2.b1, 6) * u.x)))) AS s
       |  FROM u CROSS JOIN b2),
       |cal AS (SELECT * FROM scored WHERE user_id % 2 = 0),
       |nc AS (SELECT count(*) AS n_cal FROM cal),
       |qh AS (
       |  SELECT nc.n_cal, round(c.s, 6) AS qhat
       |  FROM (SELECT s, row_number() OVER (ORDER BY s, user_id) AS rk
       |        FROM cal) c CROSS JOIN nc
       |  WHERE c.rk = least(CAST(ceil((nc.n_cal + 1) * 0.9) AS BIGINT),
       |                     nc.n_cal))
       |SELECT qh.n_cal, CAST(count(*) AS BIGINT) AS n_test, qh.qhat,
       |  round(avg(CASE WHEN round(t.s, 6) <= qh.qhat
       |    THEN 1.0 ELSE 0.0 END), 6) AS coverage
       |FROM scored t CROSS JOIN qh
       |WHERE t.user_id % 2 = 1
       |GROUP BY qh.n_cal, qh.qhat""".stripMargin

  /** Population stability index per series — the scorecard-industry
    * drift metric (what model-monitoring dashboards alarm on):
    * decile-bin the REFERENCE window (first half by global event-time
    * midpoint, the q179 split), re-bin the CURRENT window with the
    * reference cuts, and report Σ (q−p)·ln(q/p) over the 10 bins with
    * proportions floored at 1e-6 (the standard empty-bin convention;
    * pinned). Rule of thumb the output encodes: < 0.1 stable,
    * 0.1–0.25 investigate, > 0.25 shifted.
    *
    * Scale shape: one pass builds both halves; the reference cuts are
    * an exact-`percentile` aggregate per series (oracle-matched to
    * quantile_cont, the q51 pin) broadcast back; binning is nine
    * codegen'd comparisons per row into a (series, bin) hash
    * aggregate; the PSI sum runs over the series×10 relation.
    */
  def q226Psi(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value").as("v"),
        unix_micros(col("ts")).as("__us"))
    val mid = e.agg(((min(col("__us")) + max(col("__us"))) / 2).as("__mid"))
    psiBySeries(e.crossJoin(broadcast(mid))
      .select(col("event_type"), col("v"),
        (col("__us") < col("__mid")).as("__ref")))
  }

  /** The decile-bin/floor/sum half of [[q226Psi]], reusable for any
    * (event_type, v, __ref) relation.
    */
  def psiBySeries(halvesIn: DataFrame): DataFrame = {
    val halves = halvesIn
      .select(col("event_type"), col("v"), col("__ref"))
      .localCheckpoint() // cuts, both bin passes, and the spine read it
    val cuts = halves.where(col("__ref"))
      .groupBy(col("event_type"))
      .agg(percentile(col("v"),
        array((1 to 9).map(i => lit(i / 10.0)): _*)).as("__cuts"))
    val bin = (1 to 9).map(i =>
      when(col("v") > element_at(col("__cuts"), i), 1).otherwise(0))
      .reduce(_ + _) + 1
    val binned = halves.join(broadcast(cuts), Seq("event_type"))
      .select(col("event_type"), col("__ref"), bin.cast("long").as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(when(col("__ref"), 1)).as("__nr"),
        count(when(!col("__ref"), 1)).as("__nc"))
    // full 10-bin spine per series: a bin empty on one side must still
    // contribute its floored proportion, not silently vanish
    val spine = halves.select(col("event_type")).distinct()
      .select(col("event_type"), explode(sequence(lit(1L), lit(10L))).as("bin"))
    val tot = halves.groupBy(col("event_type"))
      .agg(count(when(col("__ref"), 1)).as("n_ref"),
        count(when(!col("__ref"), 1)).as("n_cur"))
    val p = greatest(coalesce(col("__nr"), lit(0L)).cast("double") /
      col("n_ref"), lit(1e-6))
    val q = greatest(coalesce(col("__nc"), lit(0L)).cast("double") /
      col("n_cur"), lit(1e-6))
    spine.join(binned, Seq("event_type", "bin"), "left")
      .join(tot, Seq("event_type"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        ((q - p) * log(q / p)).as("__t"))
      .groupBy(col("event_type"), col("n_ref"), col("n_cur"))
      .agg(round(sum(col("__t")), 6).as("psi"))
  }

  val q226Sql: String =
    """WITH e AS (
      |  SELECT event_type, value AS v, epoch_us(ts) AS us
      |  FROM events WHERE value IS NOT NULL),
      |mid AS (SELECT (min(us) + max(us)) / 2 AS mid FROM e),
      |h AS (
      |  SELECT event_type, v, us < mid.mid AS ref
      |  FROM e CROSS JOIN mid),
      |cuts AS (
      |  SELECT event_type,
      |    quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
      |      AS c
      |  FROM h WHERE ref GROUP BY 1),
      |binned AS (
      |  SELECT h.event_type, h.ref,
      |    1 + CASE WHEN h.v > c[1] THEN 1 ELSE 0 END
      |      + CASE WHEN h.v > c[2] THEN 1 ELSE 0 END
      |      + CASE WHEN h.v > c[3] THEN 1 ELSE 0 END
      |      + CASE WHEN h.v > c[4] THEN 1 ELSE 0 END
      |      + CASE WHEN h.v > c[5] THEN 1 ELSE 0 END
      |      + CASE WHEN h.v > c[6] THEN 1 ELSE 0 END
      |      + CASE WHEN h.v > c[7] THEN 1 ELSE 0 END
      |      + CASE WHEN h.v > c[8] THEN 1 ELSE 0 END
      |      + CASE WHEN h.v > c[9] THEN 1 ELSE 0 END AS bin
      |  FROM h JOIN cuts USING (event_type)),
      |bc AS (
      |  SELECT event_type, bin,
      |    count(CASE WHEN ref THEN 1 END) AS nr,
      |    count(CASE WHEN NOT ref THEN 1 END) AS nc
      |  FROM binned GROUP BY 1, 2),
      |spine AS (
      |  SELECT DISTINCT event_type, b.range AS bin
      |  FROM h CROSS JOIN range(1, 11) b),
      |tot AS (
      |  SELECT event_type,
      |    count(CASE WHEN ref THEN 1 END) AS n_ref,
      |    count(CASE WHEN NOT ref THEN 1 END) AS n_cur
      |  FROM h GROUP BY 1)
      |SELECT s.event_type, CAST(tot.n_ref AS BIGINT) AS n_ref,
      |  CAST(tot.n_cur AS BIGINT) AS n_cur,
      |  round(sum(
      |    (greatest(coalesce(bc.nc, 0) / CAST(tot.n_cur AS DOUBLE), 1e-6)
      |     - greatest(coalesce(bc.nr, 0) / CAST(tot.n_ref AS DOUBLE), 1e-6))
      |    * ln(greatest(coalesce(bc.nc, 0) / CAST(tot.n_cur AS DOUBLE), 1e-6)
      |       / greatest(coalesce(bc.nr, 0) / CAST(tot.n_ref AS DOUBLE), 1e-6))
      |  ), 6) AS psi
      |FROM spine s
      |LEFT JOIN bc ON bc.event_type = s.event_type AND bc.bin = s.bin
      |JOIN tot ON tot.event_type = s.event_type
      |GROUP BY 1, 2, 3""".stripMargin

  /** Difference-in-differences on the 2×2 (arm × period) design — the
    * workhorse quasi-experimental estimator: with Y the per-user
    * period total (absence = 0, the q204 convention), the effect is
    *
    *   ATT = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)
    *
    * with the four-cell pooled standard error √Σ s²_i/n_i. Arms are
    * the q124 parity split, periods the q179 midpoint split — both
    * pinned, engine-replayable assignments.
    *
    * Scale shape: one user×period aggregate (the only full pass), a
    * four-row cell aggregate, and a closed-form projection — the DiD
    * algebra itself is metadata-scale.
    */
  def q228Did(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
      .where(col("value").isNotNull)
      .select(col("user_id"), col("value"),
        unix_micros(col("ts")).as("__us"))
    val mid = e.agg(((min(col("__us")) + max(col("__us"))) / 2).as("__mid"))
    didFromUserPeriods(e.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(sum(when(col("__us") < col("__mid"), col("value"))
          .otherwise(lit(0.0))).as("pre"),
        sum(when(col("__us") >= col("__mid"), col("value"))
          .otherwise(lit(0.0))).as("post"))
      .select(pmod(col("user_id"), lit(2L)).as("treated"),
        col("pre"), col("post")))
  }

  /** The 2×2 cell algebra of [[q228Did]], reusable for any
    * (treated, pre, post) unit relation.
    */
  def didFromUserPeriods(userPeriod: DataFrame): DataFrame = {
    val cells = userPeriod
      .select(col("treated"), explode(array(
        struct(lit(0).as("period"), col("pre").as("y")),
        struct(lit(1).as("period"), col("post").as("y")))).as("c"))
      .groupBy(col("treated"), col("c.period").as("period"))
      .agg(count(lit(1)).as("n"), avg(col("c.y")).as("m"),
        var_samp(col("c.y")).as("v"))
    // 4 rows → 1: a conditional-sum projection over the cell relation
    def cell(t: Int, p: Int, c: Column): Column =
      max(when(col("treated") === t && col("period") === p, c))
    cells.agg(
        cell(1, 1, col("m")).as("mt1"), cell(1, 0, col("m")).as("mt0"),
        cell(0, 1, col("m")).as("mc1"), cell(0, 0, col("m")).as("mc0"),
        sum(col("v") / col("n")).as("__varsum"))
      .select(
        round(col("mt0"), 6).as("treated_pre"),
        round(col("mt1"), 6).as("treated_post"),
        round(col("mc0"), 6).as("control_pre"),
        round(col("mc1"), 6).as("control_post"),
        round((col("mt1") - col("mt0")) - (col("mc1") - col("mc0")), 6)
          .as("att"),
        round(sqrt(col("__varsum")), 6).as("se"),
        round(((col("mt1") - col("mt0")) - (col("mc1") - col("mc0"))) /
          sqrt(col("__varsum")), 6).as("t_stat"))
  }

  val q228Sql: String =
    """WITH e AS (
      |  SELECT user_id, value, epoch_us(ts) AS us
      |  FROM events WHERE value IS NOT NULL),
      |mid AS (SELECT (min(us) + max(us)) / 2 AS mid FROM e),
      |up AS (
      |  SELECT user_id % 2 AS treated,
      |    sum(CASE WHEN us < mid.mid THEN value ELSE 0 END) AS pre,
      |    sum(CASE WHEN us >= mid.mid THEN value ELSE 0 END) AS post
      |  FROM e CROSS JOIN mid GROUP BY user_id),
      |cells AS (
      |  SELECT treated, period, count(*) AS n, avg(y) AS m,
      |    var_samp(y) AS v
      |  FROM (
      |    SELECT treated, 0 AS period, pre AS y FROM up
      |    UNION ALL
      |    SELECT treated, 1, post FROM up)
      |  GROUP BY 1, 2),
      |w AS (
      |  SELECT
      |    max(CASE WHEN treated = 1 AND period = 1 THEN m END) AS mt1,
      |    max(CASE WHEN treated = 1 AND period = 0 THEN m END) AS mt0,
      |    max(CASE WHEN treated = 0 AND period = 1 THEN m END) AS mc1,
      |    max(CASE WHEN treated = 0 AND period = 0 THEN m END) AS mc0,
      |    sum(v / n) AS varsum
      |  FROM cells)
      |SELECT round(mt0, 6) AS treated_pre, round(mt1, 6) AS treated_post,
      |  round(mc0, 6) AS control_pre, round(mc1, 6) AS control_post,
      |  round((mt1 - mt0) - (mc1 - mc0), 6) AS att,
      |  round(sqrt(varsum), 6) AS se,
      |  round(((mt1 - mt0) - (mc1 - mc0)) / sqrt(varsum), 6) AS t_stat
      |FROM w""".stripMargin

  /** Qini-style uplift deciles — the targeting readout for "whom does
    * the treatment actually move": users ranked by the q217 model
    * score (desc, id tiebreak), split into 10 equal-occupancy bins,
    * and per bin the treated-vs-control conversion-rate gap plus the
    * running Qini statistic
    *
    *   Q(k) = cumΣ conv_T − cumΣ conv_C · (n_T,≤k / n_C,≤k)
    *
    * (arms = the q124 parity split; conversion = the q124 flag). A
    * model that ranks persuadables first shows front-loaded uplift.
    *
    * Scale shape: the score projection is map-only; the decile
    * assignment is the q131 rank-free bucket arithmetic over a rank
    * window on the USER relation; everything after is a 10-row
    * ordered window.
    */
  def q229Qini(spark: SparkSession, d: String): DataFrame =
    qiniDeciles(logisticScoredUsers(spark, d)
      .select(col("user_id"), col("y"), col("p"),
        pmod(col("user_id"), lit(2L)).as("treated")))

  /** The decile/cumulative-Qini half of [[q229Qini]], reusable for any
    * (user_id, y, p, treated) scored relation.
    */
  def qiniDeciles(scored: DataFrame): DataFrame = {
    val byScore = Window.orderBy(col("p").desc, col("user_id"))
    val n = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // user-relation global window: bounded — |users|, already collapsed
    val deciles = scored
      .withColumn("__rk", row_number().over(byScore))
      .withColumn("__n", count(lit(1)).over(n))
      .select(col("treated"), col("y"),
        // floor division (Spark's / on integers yields DOUBLE):
        // exact for any realistic user count, matches DuckDB's //
        (lit(1L) + floor(lit(10.0) * (col("__rk") - 1) / col("__n"))
          .cast("long")).as("decile"))
      .groupBy(col("decile"))
      .agg(count(when(col("treated") === 1, 1)).as("n_t"),
        count(when(col("treated") === 0, 1)).as("n_c"),
        sum(when(col("treated") === 1, col("y")).otherwise(lit(0.0)))
          .cast("long").as("conv_t"),
        sum(when(col("treated") === 0, col("y")).otherwise(lit(0.0)))
          .cast("long").as("conv_c"))
    val cum = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciles
      .withColumn("uplift",
        round(col("conv_t").cast("double") / col("n_t") -
          col("conv_c").cast("double") / col("n_c"), 6))
      .withColumn("qini",
        round(sum(col("conv_t")).over(cum) -
          sum(col("conv_c")).over(cum).cast("double") *
            sum(col("n_t")).over(cum) / sum(col("n_c")).over(cum), 6))
  }

  val q229Sql: String =
    s"""WITH $logisticFitCte,
       |scored AS (
       |  SELECT u.user_id, u.y, u.user_id % 2 AS treated,
       |    1.0 / (1.0 + exp(-(round(b2.b0, 6) + round(b2.b1, 6) * u.x)))
       |      AS p
       |  FROM u CROSS JOIN b2),
       |rk AS (
       |  SELECT treated, y,
       |    CAST(1 + (10 * (row_number() OVER (ORDER BY p DESC, user_id)
       |      - 1)) // (SELECT count(*) FROM scored) AS BIGINT) AS decile
       |  FROM scored),
       |d AS (
       |  SELECT decile,
       |    count(CASE WHEN treated = 1 THEN 1 END) AS n_t,
       |    count(CASE WHEN treated = 0 THEN 1 END) AS n_c,
       |    CAST(sum(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT)
       |      AS conv_t,
       |    CAST(sum(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT)
       |      AS conv_c
       |  FROM rk GROUP BY 1)
       |SELECT decile, CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
       |  conv_t, conv_c,
       |  round(CAST(conv_t AS DOUBLE) / n_t
       |    - CAST(conv_c AS DOUBLE) / n_c, 6) AS uplift,
       |  round(sum(conv_t) OVER (ORDER BY decile
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    - CAST(sum(conv_c) OVER (ORDER BY decile
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |      * sum(n_t) OVER (ORDER BY decile
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      / sum(n_c) OVER (ORDER BY decile
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
       |    AS qini
       |FROM d""".stripMargin

  /** Order-to-delivery SLA percentiles per order month — the ops
    * latency report: for every lineitem, days from order placement to
    * shipment, summarized as exact p50/p90 (the q51 percentile ≡
    * quantile_cont pin) plus the max straggler. The month axis makes
    * SLA drift visible; the p90/max gap separates a fat tail from a
    * single outlier.
    *
    * Scale shape: one fact⋈fact equi-join on the order key (the only
    * shuffle), one month-keyed aggregate with exact-percentile
    * buffers bounded by per-month row counts.
    */
  def q232DeliverySla(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_shipdate"))
    val sup = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select(date_trunc("month", col("o_orderdate")).cast("date")
        .as("order_month"),
        datediff(col("l_shipdate"), col("o_orderdate"))
          .cast("double").as("__v"))
      .groupBy(col("order_month"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    quantileContFromSupport(sup, Seq("order_month"),
      Seq("p50_days" -> 0.5, "p90_days" -> 0.9))
      .select(col("order_month"), col("n_items"),
        round(col("p50_days"), 6).as("p50_days"),
        round(col("p90_days"), 6).as("p90_days"),
        col("max_v").cast("long").as("max_days"))
  }

  /** Exact per-group `quantile_cont` computed from a (group, value,
    * count) SUPPORT relation instead of the builtin `percentile`
    * aggregate. The builtin is a TypedImperativeAggregate: its buffer
    * holds EVERY group value (a month of a 100 TB fact table does not
    * fit an aggregation buffer) and, being an ObjectHashAggregate, its
    * partial step de-codegens the whole upstream stage — the q218
    * lesson. The support form is one codegen hash aggregate (bounded
    * by the value domain, e.g. integer day lags), a support-keyed
    * window for cumulative counts, and conditional mins; it reproduces
    * `quantile_cont`'s interpolation at p·(n−1) exactly.
    *
    * @param sup (groupCols..., __v, __c)
    * @return per group: n_items, max_v, one column per requested
    *         percentile (unrounded — callers pin their own dp)
    */
  private[operators] def quantileContFromSupport(sup: DataFrame,
      groupCols: Seq[String], ps: Seq[(String, Double)]): DataFrame = {
    val grp = groupCols.map(col)
    val wOrd = Window.partitionBy(grp: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(grp: _*)
    val ranked = sup
      .withColumn("__cum", sum(col("__c")).over(wOrd))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val qCols = ps.map { case (name, p) =>
      // per-row form inside the aggregates (every row carries __n),
      // aggregated form for the outer interpolation arithmetic
      val tRow = lit(p) * (col("__n") - 1).cast("double")
      val vLo = min(when(col("__cum") >= floor(tRow) + 1, col("__v")))
      val vHi = min(when(col("__cum") >= ceil(tRow) + 1, col("__v")))
      val tAgg = lit(p) * (max(col("__n")) - 1).cast("double")
      (vLo + (tAgg - floor(tAgg)) * (vHi - vLo)).as(name)
    }
    ranked.groupBy(grp: _*)
      .agg(sum(col("__c")).as("n_items"),
        (max(col("__v")).as("max_v") +: qCols): _*)
  }

  val q232Sql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  round(quantile_cont(CAST(date_diff('day',
      |    CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
      |    AS DOUBLE), 0.5), 6) AS p50_days,
      |  round(quantile_cont(CAST(date_diff('day',
      |    CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
      |    AS DOUBLE), 0.9), 6) AS p90_days,
      |  CAST(max(date_diff('day', CAST(o_orderdate AS DATE),
      |    CAST(l_shipdate AS DATE))) AS BIGINT) AS max_days
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  /** Expected calibration error of the q217 model — the reliability
    * diagram's summary number (Guo et al., ICML'17): 10 equal-width
    * confidence bins, per bin the |accuracy − mean confidence| gap,
    * ECE the row-count-weighted sum. A probe with low log-loss but
    * high ECE is CONFIDENTLY wrong — this is the monitoring readout
    * that catches it.
    *
    * Scale shape: one map-only score projection, one 10-key hash
    * aggregate, one metadata-scale window for the weighted sum.
    */
  def q227Ece(spark: SparkSession, d: String): DataFrame =
    expectedCalibrationError(logisticScoredUsers(spark, d))

  /** The 10-bin reliability aggregation of [[q227Ece]], reusable for
    * any (y, p) prediction relation.
    */
  def expectedCalibrationError(scored: DataFrame): DataFrame = {
    val bins = scored
      .select(col("y"), col("p"),
        least(floor(col("p") * 10).cast("long"), lit(9L)).as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("p")), 6).as("mean_conf"),
        round(avg(col("y")), 6).as("accuracy"))
      .withColumn("abs_gap",
        round(abs(col("accuracy") - col("mean_conf")), 6))
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // ≤ 10 rows: the global window is metadata-scale by construction
    bins.withColumn("ece",
      round(sum(col("abs_gap") * col("n")).over(all) /
        sum(col("n")).over(all), 6))
  }

  /** Permutation test for a two-group difference in means —
    * distribution-free significance without normality assumptions,
    * the "is this lift real" answer when t-test assumptions are
    * suspect. B deterministic md5-derived reassignments of UNITS (not
    * rows) to pseudo-groups rebuild the null distribution of the
    * mean difference; p = (1 + #{|Δᵦ| ≥ |Δ|}) / (B + 1), the standard
    * add-one Monte-Carlo estimator (Phipson & Smyth 2010).
    *
    * Determinism discipline: the "random" reassignment of unit i in
    * replicate b is the parity of md5(i ‖ ':' ‖ b) — a pure function,
    * so any engine rebuilds the identical permutation set — and both
    * Δ and every Δᵦ round to 6 dp BEFORE the ≥ comparison, so a
    * floating-point tail can never flip the extreme-count across
    * engines.
    *
    * Scale shape: the fact table collapses to per-unit sufficient
    * statistics FIRST (caller's one aggregate); the B-fold expansion
    * is units×B — bounded by the randomization-unit count, not the
    * event count — and one hash aggregate per side ends it.
    *
    * @param units one row per randomization unit:
    *              (unitCol, groupCol: Boolean, sumCol, cntCol)
    * @return one row: obs_diff, b, n_extreme, p_value
    */
  def permutationTest(units: DataFrame, unitCol: String,
      groupCol: String, sumCol: String, cntCol: String,
      b: Int = 64): DataFrame = {
    require(b >= 1)
    val u = units.select(col(unitCol).cast("string").as("__u"),
      col(groupCol).as("__g"), col(sumCol).cast("double").as("__s"),
      col(cntCol).cast("long").as("__c"))
      .localCheckpoint()
    // ANSI mode raises on /0 where DuckDB yields NULL: a replicate
    // that reassigns EVERY unit to one side has no defined diff —
    // emit NULL (never counted extreme), exactly the oracle's result
    def sideDiff(g: Column): Column = {
      val c1 = sum(when(g, col("__c")).otherwise(0L))
      val c0 = sum(when(!g, col("__c")).otherwise(0L))
      round(when(c1 > 0 && c0 > 0,
        sum(when(g, col("__s")).otherwise(0.0)) / c1 -
          sum(when(!g, col("__s")).otherwise(0.0)) / c0), 6)
    }
    val obs = u.agg(sideDiff(col("__g")).as("__d"))
    val reps = u.select(col("__u"), col("__s"), col("__c"),
      explode(expr(s"sequence(0, ${b - 1})")).as("__b"))
    val pg = pmod(graft.functions.GraftFunctions.hexLong(
      substring(md5(concat(col("__u"), lit(":"),
        col("__b").cast("string"))), 1, 15)), lit(2L)) === 1L
    val perm = reps
      .groupBy(col("__b"))
      .agg({
        val c1 = sum(when(pg, col("__c")).otherwise(0L))
        val c0 = sum(when(!pg, col("__c")).otherwise(0L))
        round(when(c1 > 0 && c0 > 0,
          sum(when(pg, col("__s")).otherwise(0.0)) / c1 -
            sum(when(!pg, col("__s")).otherwise(0.0)) / c0), 6).as("__db")
      })
    perm.crossJoin(broadcast(obs))
      .agg(max(col("__d")).as("obs_diff"),
        count(lit(1)).as("b"),
        sum(when(abs(col("__db")) >= abs(col("__d")), 1L).otherwise(0L))
          .as("n_extreme"))
      .select(col("obs_diff"), col("b"), col("n_extreme"),
        round((col("n_extreme") + 1).cast("double") /
          (col("b") + 1).cast("double"), 6).as("p_value"))
  }

  /** Declared q245: is odd-user mean event value different from
    * even-user — permutation test at the user level, B = 64.
    */
  def q245PermutationTest(spark: SparkSession, d: String): DataFrame = {
    val units = graft.core.Tables.events(spark, d)
      .where(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg((pmod(col("user_id"), lit(2L)) === 1L).as("grp"),
        sum(col("value")).as("s"), count(lit(1)).as("c"))
    permutationTest(units, "user_id", "grp", "s", "c", b = 64)
  }

  val q245Sql: String =
    """WITH units AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u,
      |    user_id % 2 = 1 AS g, sum(value) AS s, count(*) AS c
      |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
      |obs AS (
      |  SELECT round(
      |    sum(CASE WHEN g THEN s ELSE 0 END)
      |      / sum(CASE WHEN g THEN c ELSE 0 END)
      |    - sum(CASE WHEN NOT g THEN s ELSE 0 END)
      |      / sum(CASE WHEN NOT g THEN c ELSE 0 END), 6) AS d
      |  FROM units),
      |reps AS (
      |  SELECT u, s, c, CAST(range AS INT) AS b
      |  FROM units CROSS JOIN range(0, 64)),
      |perm AS (
      |  SELECT b, round(
      |    sum(CASE WHEN pg THEN s ELSE 0 END)
      |      / sum(CASE WHEN pg THEN c ELSE 0 END)
      |    - sum(CASE WHEN NOT pg THEN s ELSE 0 END)
      |      / sum(CASE WHEN NOT pg THEN c ELSE 0 END), 6) AS db
      |  FROM (
      |    SELECT b, s, c,
      |      ('0x' || substring(md5(u || ':' || CAST(b AS VARCHAR)), 1, 15))
      |        ::BIGINT % 2 = 1 AS pg
      |    FROM reps)
      |  GROUP BY b)
      |SELECT max(obs.d) AS obs_diff, CAST(count(*) AS BIGINT) AS b,
      |  CAST(sum(CASE WHEN abs(db) >= abs(obs.d) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_extreme,
      |  round((sum(CASE WHEN abs(db) >= abs(obs.d) THEN 1 ELSE 0 END)
      |    + 1.0) / (count(*) + 1.0), 6) AS p_value
      |FROM perm CROSS JOIN obs""".stripMargin

  /** Cochran–Mantel–Haenszel test — the stratified 2×2 association
    * test: "does exposure move the outcome CONSISTENTLY across
    * strata", controlling for the stratum confounder (month,
    * geography, cohort …) instead of pooling into one Simpson-prone
    * table. Per stratum k with exposed n₁ₖ, unexposed n₀ₖ, outcomes
    * m₁ₖ and exposed-outcomes aₖ:
    *
    *   E[aₖ] = n₁ₖm₁ₖ/nₖ
    *   V[aₖ] = n₁ₖn₀ₖm₁ₖ(nₖ−m₁ₖ) / (nₖ²(nₖ−1))
    *   χ²_CMH = (Σaₖ − ΣE[aₖ])² / ΣV[aₖ]   ~ χ²(1)
    *
    * (No continuity correction — the cross-engine-exact convention.)
    * Strata with nₖ ≤ 1 contribute nothing (variance undefined).
    *
    * Scale shape: ONE hash aggregate to the stratum-level integer
    * counts; the test is stratum-domain algebra after that.
    */
  def cmhTest(rows: DataFrame, stratumCol: String, exposedCol: String,
      outcomeCol: String): DataFrame = {
    val sup = rows.groupBy(col(stratumCol).as("__k")).agg(
      sum(when(col(exposedCol), 1L).otherwise(0L)).as("__n1"),
      sum(when(!col(exposedCol), 1L).otherwise(0L)).as("__n0"),
      sum(when(col(outcomeCol), 1L).otherwise(0L)).as("__m1"),
      sum(when(col(exposedCol) && col(outcomeCol), 1L).otherwise(0L))
        .as("__a"),
      count(lit(1)).as("__n"))
      .where(col("__n") > 1)
    sup.agg(
      count(lit(1)).as("n_strata"),
      sum(col("__a")).as("sum_a"),
      round(sum(col("__n1") * col("__m1")
        / col("__n").cast("double")), 6).as("sum_e"),
      round(sum(col("__n1").cast("double") * col("__n0") * col("__m1")
        * (col("__n") - col("__m1")) /
        (col("__n").cast("double") * col("__n") * (col("__n") - 1))), 6)
        .as("variance"),
      round(pow(sum(col("__a")).cast("double") -
        sum(col("__n1") * col("__m1") / col("__n").cast("double")), 2.0) /
        sum(col("__n1").cast("double") * col("__n0") * col("__m1")
          * (col("__n") - col("__m1")) /
          (col("__n").cast("double") * col("__n") * (col("__n") - 1))), 6)
        .as("cmh_chi2"))
  }

  /** Declared q248: does user parity associate with purchasing,
    * stratified by calendar day (the fixture spans one month, so
    * day is the stratum with real multiplicity).
    */
  def q248Cmh(spark: SparkSession, d: String): DataFrame =
    cmhTest(graft.core.Tables.events(spark, d)
      .select(to_date(col("ts")).as("day"),
        (pmod(col("user_id"), lit(2L)) === 1L).as("exposed"),
        (col("event_type") === "purchase").as("outcome")),
      "day", "exposed", "outcome")

  val q248Sql: String =
    """WITH sup AS (
      |  SELECT CAST(ts AS DATE) AS k,
      |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1,
      |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS m1,
      |    sum(CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
      |             THEN 1 ELSE 0 END) AS a,
      |    count(*) AS n
      |  FROM events GROUP BY 1 HAVING count(*) > 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_strata,
      |  CAST(sum(a) AS BIGINT) AS sum_a,
      |  round(sum(n1 * m1 / CAST(n AS DOUBLE)), 6) AS sum_e,
      |  round(sum(CAST(n1 AS DOUBLE) * n0 * m1 * (n - m1)
      |    / (CAST(n AS DOUBLE) * n * (n - 1))), 6) AS variance,
      |  round(pow(CAST(sum(a) AS DOUBLE)
      |      - sum(n1 * m1 / CAST(n AS DOUBLE)), 2)
      |    / sum(CAST(n1 AS DOUBLE) * n0 * m1 * (n - m1)
      |      / (CAST(n AS DOUBLE) * n * (n - 1))), 6) AS cmh_chi2
      |FROM sup""".stripMargin

  /** Murphy (1973) decomposition of the Brier score — the
    * probabilistic-forecast quality readout that SPLITS the raw
    * squared error into its named parts: reliability (calibration
    * gap, want 0), resolution (how much the forecast separates
    * outcomes, want large), and uncertainty (the outcome base rate's
    * intrinsic variance, forecast-independent):
    *
    *   REL = Σₖ nₖ(p̄ₖ − ȳₖ)²/n    RES = Σₖ nₖ(ȳₖ − ȳ)²/n
    *   UNC = ȳ(1 − ȳ)             Brier = (1/n)Σ(pᵢ − yᵢ)²
    *
    * Binned over the same 10 equal-width bins as
    * [[expectedCalibrationError]]; the REL−RES+UNC identity holds
    * exactly only when forecasts are constant within bins, so the raw
    * Brier is reported alongside rather than reconstructed.
    *
    * Scale shape: one pass computes the raw Brier and the bin
    * aggregate; the decomposition is 10-row algebra broadcast-joined
    * to the global base rate. No window, no second scan of the data
    * (the bin relation re-aggregates for the global terms).
    */
  def brierDecomposition(scored: DataFrame): DataFrame = {
    val binned = scored
      .select(col("y"), col("p"),
        least(floor(col("p") * 10).cast("long"), lit(9L)).as("__bin"))
      .groupBy(col("__bin"))
      .agg(count(lit(1)).as("__nk"),
        sum(col("p")).as("__sp"), sum(col("y")).as("__sy"),
        sum((col("p") - col("y")) * (col("p") - col("y"))).as("__sq"))
      .localCheckpoint()
    val glob = binned.agg(
      sum(col("__nk")).as("__n"), sum(col("__sy")).as("__ty"),
      sum(col("__sq")).as("__tsq"))
    binned.crossJoin(broadcast(glob))
      .select(col("__nk"), col("__n"), col("__tsq"),
        (col("__sp") / col("__nk")).as("__pk"),
        (col("__sy") / col("__nk")).as("__yk"),
        (col("__ty") / col("__n")).as("__ybar"))
      .agg(
        max(col("__n")).cast("long").as("n"),
        round(max(col("__tsq") / col("__n")), 6).as("brier"),
        round(sum(col("__nk") * (col("__pk") - col("__yk"))
          * (col("__pk") - col("__yk"))) / max(col("__n")), 6)
          .as("reliability"),
        round(sum(col("__nk") * (col("__yk") - col("__ybar"))
          * (col("__yk") - col("__ybar"))) / max(col("__n")), 6)
          .as("resolution"),
        round(max(col("__ybar") * (lit(1.0) - col("__ybar"))), 6)
          .as("uncertainty"))
  }

  /** Declared q241: Brier decomposition of the q217 logistic fit. */
  def q241Brier(spark: SparkSession, d: String): DataFrame =
    brierDecomposition(logisticScoredUsers(spark, d))

  val q241Sql: String =
    s"""WITH $logisticFitCte,
       |scored AS (
       |  SELECT u.y, 1.0 / (1.0 + exp(-(round(b2.b0, 6)
       |    + round(b2.b1, 6) * u.x))) AS p
       |  FROM u CROSS JOIN b2),
       |bins AS (
       |  SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
       |    count(*) AS nk, sum(p) AS sp, sum(y) AS sy,
       |    sum((p - y) * (p - y)) AS sq
       |  FROM scored GROUP BY 1),
       |g AS (
       |  SELECT sum(nk) AS n, sum(sy) AS ty, sum(sq) AS tsq FROM bins)
       |SELECT CAST(max(n) AS BIGINT) AS n,
       |  round(max(tsq / n), 6) AS brier,
       |  round(sum(nk * (sp / nk - sy / nk) * (sp / nk - sy / nk))
       |    / max(n), 6) AS reliability,
       |  round(sum(nk * (sy / nk - ty / n) * (sy / nk - ty / n))
       |    / max(n), 6) AS resolution,
       |  round(max((ty / n) * (1.0 - ty / n)), 6) AS uncertainty
       |FROM bins CROSS JOIN g""".stripMargin

  val q227Sql: String =
    s"""WITH $logisticFitCte,
       |scored AS (
       |  SELECT u.y, 1.0 / (1.0 + exp(-(round(b2.b0, 6)
       |    + round(b2.b1, 6) * u.x))) AS p
       |  FROM u CROSS JOIN b2),
       |bins AS (
       |  SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin,
       |    count(*) AS n, round(avg(p), 6) AS mean_conf,
       |    round(avg(y), 6) AS accuracy
       |  FROM scored GROUP BY 1)
       |SELECT bin, n, mean_conf, accuracy,
       |  round(abs(accuracy - mean_conf), 6) AS abs_gap,
       |  round(sum(round(abs(accuracy - mean_conf), 6) * n) OVER ()
       |    / sum(n) OVER (), 6) AS ece
       |FROM bins""".stripMargin
}
