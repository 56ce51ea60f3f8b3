package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.Tables

/** Multi-group hypothesis tests — the k-sample generalizations of the
  * two-sample battery already in [[Relational]] ([[Relational.ksStatistic]],
  * [[Relational.mannWhitneyU]], [[Relational.twoProportionZ]]): one-way
  * ANOVA (parametric mean shift), Kruskal–Wallis (rank-based, the k-group
  * Mann–Whitney), and Brown–Forsythe (variance homogeneity — the test you
  * run BEFORE trusting ANOVA's pooled variance). The pipeline use is
  * per-source / per-variant drift screens where "cohort" has more than
  * two levels.
  *
  * Scale shapes: every test reduces the fact table to per-group sufficient
  * statistics in one map-combined hash aggregate (ANOVA), or to a
  * value-support relation ([[Relational.orderedPrefixSums]] — never a
  * global single-partition window) for the rank test; the final formulas
  * are metadata-scale algebra over k rows. No test here ever holds a
  * group's raw values in an aggregation buffer.
  */
object HypothesisTests {

  /** One-way ANOVA F — k-group mean-shift test. Per-group (n, Σx, Σx²)
    * from one hash aggregate; SSB/SSW in the textbook computational
    * form (Σ s_g²/n_g − S²/N and Σ q_g − Σ s_g²/n_g); eta² = SSB/SST
    * is the effect size the F alone hides.
    *
    * @return one row: k_groups, n_obs, df_between, df_within,
    *         f_stat, eta_sq (both 6 dp)
    */
  def oneWayAnova(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast(DoubleType)
    val g = df.where(x.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast(DoubleType).as("__n"),
        sum(x).as("__s"), sum(x * x).as("__q"))
    val tot = g.agg(
      count(lit(1)).as("k"),
      sum(col("__n")).as("__nn"),
      sum(col("__s")).as("__ss"),
      sum(col("__q")).as("__qq"),
      sum(col("__s") * col("__s") / col("__n")).as("__b"))
    val ssb = col("__b") - col("__ss") * col("__ss") / col("__nn")
    val ssw = col("__qq") - col("__b")
    val sst = col("__qq") - col("__ss") * col("__ss") / col("__nn")
    tot.select(
      col("k").as("k_groups"),
      col("__nn").cast("long").as("n_obs"),
      (col("k") - 1).as("df_between"),
      (col("__nn") - col("k")).cast("long").as("df_within"),
      round((ssb / (col("k") - 1).cast(DoubleType)) /
        (ssw / (col("__nn") - col("k").cast(DoubleType))), 6).as("f_stat"),
      round(ssb / sst, 6).as("eta_sq"))
  }

  /** Declared q250: does mean event value differ across event types? */
  def q250Anova(spark: SparkSession, d: String): DataFrame =
    oneWayAnova(Tables.events(spark, d), "event_type", "value")

  val q250Sql: String =
    """WITH g AS (
      |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
      |    sum(value) AS s, sum(value * value) AS q
      |  FROM events WHERE value IS NOT NULL GROUP BY 1),
      |t AS (
      |  SELECT count(*) AS k, sum(n) AS nn, sum(s) AS ss, sum(q) AS qq,
      |    sum(s * s / n) AS b
      |  FROM g)
      |SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_obs,
      |  CAST(k - 1 AS BIGINT) AS df_between,
      |  CAST(nn - k AS BIGINT) AS df_within,
      |  round(((b - ss * ss / nn) / (k - 1)) / ((qq - b) / (nn - k)), 6)
      |    AS f_stat,
      |  round((b - ss * ss / nn) / (qq - ss * ss / nn), 6) AS eta_sq
      |FROM t""".stripMargin

  /** Kruskal–Wallis H — rank-based k-group test with exact midrank tie
    * handling and the Σ(t³−t) tie correction. The value column
    * collapses to a support relation (value → count) whose global
    * cumulative counts come from [[Relational.orderedPrefixSums]];
    * midranks then join back to the (value, group) cells on the value
    * key. Integral rank arithmetic keeps both engines bit-identical
    * until the final scale-free ratios.
    *
    * @return one row: k_groups, n_obs, h_stat, tie_correction, h_adj
    */
  def kruskalWallis(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast(DoubleType)
    val rows = df.where(x.isNotNull)
    // the group DOMAIN is bounded (cohort labels), so collect it and
    // pivot per-group counts INTO the value support — one aggregate,
    // one prefix-sum pass, and no support⋈cells join afterwards
    // (the join was 30% of wall-clock on the 600k-value fixture)
    val groups = rows.select(col(groupCol).cast("string").as("g"))
      .distinct().orderBy(col("g")).collect().map(_.getString(0))
    val support = rows
      .groupBy(x.as("__v"))
      .agg(count(lit(1)).as("__t"),
        groups.zipWithIndex.map { case (g, i) =>
          sum(when(col(groupCol).cast("string") === g, 1L).otherwise(0L))
            .as(s"__n$i")
        }.toIndexedSeq: _*)
    val mids = Relational.orderedPrefixSums(support, "__v",
        Seq("__cum" -> col("__t")))
      .withColumn("__mid",
        col("__cum") - col("__t").cast(DoubleType) +
          (col("__t").cast(DoubleType) + 1.0) / 2.0)
    val aggs = groups.indices.flatMap(i => Seq(
      sum(col(s"__n$i")).cast(DoubleType).as(s"__gn$i"),
      sum(col("__mid") * col(s"__n$i")).as(s"__gr$i"))) :+
      sum(col("__t") * col("__t") * col("__t") - col("__t"))
        .cast(DoubleType).as("__tie")
    val one = mids.agg(aggs.head, aggs.tail: _*)
    val nn = groups.indices.map(i => col(s"__gn$i")).reduce(_ + _)
    val rr = groups.indices
      .map(i => col(s"__gr$i") * col(s"__gr$i") / col(s"__gn$i"))
      .reduce(_ + _)
    val h = lit(12.0) / (nn * (nn + 1.0)) * rr - lit(3.0) * (nn + 1.0)
    val corr = lit(1.0) - col("__tie") / (nn * nn * nn - nn)
    one.select(
      lit(groups.length.toLong).as("k_groups"),
      nn.cast("long").as("n_obs"),
      round(h, 6).as("h_stat"),
      round(corr, 6).as("tie_correction"),
      round(h / corr, 6).as("h_adj"))
  }

  /** Declared q251: rank-based price shift across the 3 return flags. */
  def q251KruskalWallis(spark: SparkSession, d: String): DataFrame =
    kruskalWallis(Tables.lineitem(spark, d), "l_returnflag", "l_extendedprice")

  val q251Sql: String =
    """WITH cells AS (
      |  SELECT l_extendedprice AS v, l_returnflag AS g, count(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |sup AS (SELECT v, sum(c) AS t FROM cells GROUP BY 1),
      |mids AS (
      |  SELECT v, t,
      |    CAST(sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - t
      |      AS DOUBLE) + (CAST(t AS DOUBLE) + 1.0) / 2.0 AS mid
      |  FROM sup),
      |pg AS (
      |  SELECT g, CAST(sum(c) AS DOUBLE) AS n, sum(mid * c) AS r
      |  FROM cells JOIN mids USING (v) GROUP BY 1),
      |tie AS (
      |  SELECT CAST(sum(t * t * t - t) AS DOUBLE) AS tie FROM mids),
      |t AS (
      |  SELECT count(*) AS k, sum(n) AS nn, sum(r * r / n) AS rr FROM pg)
      |SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_obs,
      |  round(12.0 / (nn * (nn + 1.0)) * rr - 3.0 * (nn + 1.0), 6)
      |    AS h_stat,
      |  round(1.0 - tie / (nn * nn * nn - nn), 6) AS tie_correction,
      |  round((12.0 / (nn * (nn + 1.0)) * rr - 3.0 * (nn + 1.0)) /
      |    (1.0 - tie / (nn * nn * nn - nn)), 6) AS h_adj
      |FROM t CROSS JOIN tie""".stripMargin

  /** Brown–Forsythe — Levene's variance-homogeneity test with MEDIAN
    * centers (the robust variant): z = |x − median_group|, then the
    * one-way ANOVA F on z. Group medians come from
    * [[Relational.quantileContFromSupport]] (a codegen support
    * aggregate — never a per-group percentile buffer holding raw
    * values), broadcast back to the fact rows; the rest is
    * [[oneWayAnova]]'s one-aggregate shape.
    *
    * @return one row: k_groups, n_obs, df_between, df_within,
    *         f_stat (6 dp)
    */
  def brownForsythe(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast(DoubleType)
    val rows = df.where(x.isNotNull)
      .select(col(groupCol).as("__g"), x.as("__x"))
    val sup = rows.groupBy(col("__g"), col("__x").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val med = Relational.quantileContFromSupport(sup, Seq("__g"),
        Seq("__med" -> 0.5))
      .select(col("__g"), col("__med"))
    val z = rows.join(broadcast(med), Seq("__g"))
      .select(col("__g"), abs(col("__x") - col("__med")).as("__z"))
    oneWayAnova(z, "__g", "__z")
      .drop("eta_sq")
  }

  /** Declared q252: is event-value spread homogeneous across types? */
  def q252BrownForsythe(spark: SparkSession, d: String): DataFrame =
    brownForsythe(Tables.events(spark, d), "event_type", "value")

  val q252Sql: String =
    """WITH med AS (
      |  SELECT event_type, quantile_cont(value, 0.5) AS m
      |  FROM events WHERE value IS NOT NULL GROUP BY 1),
      |z AS (
      |  SELECT e.event_type, abs(e.value - med.m) AS z
      |  FROM events e JOIN med USING (event_type)
      |  WHERE e.value IS NOT NULL),
      |g AS (
      |  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
      |    sum(z) AS s, sum(z * z) AS q
      |  FROM z GROUP BY 1),
      |t AS (
      |  SELECT count(*) AS k, sum(n) AS nn, sum(s) AS ss, sum(q) AS qq,
      |    sum(s * s / n) AS b
      |  FROM g)
      |SELECT CAST(k AS BIGINT) AS k_groups, CAST(nn AS BIGINT) AS n_obs,
      |  CAST(k - 1 AS BIGINT) AS df_between,
      |  CAST(nn - k AS BIGINT) AS df_within,
      |  round(((b - ss * ss / nn) / (k - 1)) / ((qq - b) / (nn - k)), 6)
      |    AS f_stat
      |FROM t""".stripMargin

  /** Fisher's exact test on a 2×2 table — the small-cell association
    * test the chi-squared approximation ([[Relational]] q111) breaks
    * on. Exact hypergeometric enumeration: two-sided p sums every
    * support point whose pmf ≤ pmf(observed)·(1+1e-7) (the classic
    * R-style tie tolerance), one-sided tails by x ≤/≥ observed.
    *
    * Log-factorials come from the native [[graft.functions.LogGamma]]
    * codegen expression — Spark has no `lgamma`, and `factorial`
    * overflows at 21!; the identical libm-grade kernel on both engines
    * keeps the enumeration bit-comparable. The facts collapse to four
    * counts BEFORE the support grid exists; the grid is min(r1, c1)+1
    * rows — metadata scale.
    *
    * @param rowFlag first binary factor, `colFlag` second; the table is
    *        a = both, b = row only, c = col only, d = neither
    * @return one row: a, b, c, d, odds_ratio, p_two_sided, p_left,
    *         p_right (6 dp)
    */
  def fisherExact(df: DataFrame, rowFlag: org.apache.spark.sql.Column,
      colFlag: org.apache.spark.sql.Column): DataFrame = {
    import graft.functions.GraftFunctions.lgamma
    val cells = df.agg(
      sum(when(rowFlag && colFlag, 1L).otherwise(0L)).as("a"),
      sum(when(rowFlag && !colFlag, 1L).otherwise(0L)).as("b"),
      sum(when(!rowFlag && colFlag, 1L).otherwise(0L)).as("c"),
      sum(when(!rowFlag && !colFlag, 1L).otherwise(0L)).as("d"))
    // lgC(n, k) = lgamma(n+1) - lgamma(k+1) - lgamma(n-k+1)
    def lgC(n: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
      lgamma(n + 1.0) - lgamma(k + 1.0) - lgamma(n - k + 1.0)
    val r1 = col("a") + col("b")
    val r2 = col("c") + col("d")
    val c1 = col("a") + col("c")
    val n = r1 + r2
    val grid = cells
      .withColumn("__lo", greatest(lit(0L), c1 - r2))
      .withColumn("__hi", least(r1, c1))
      .select(col("a"), col("b"), col("c"), col("d"),
        explode(sequence(col("__lo"), col("__hi"))).as("x"))
      .withColumn("__lp",
        lgC(r1, col("x")) + lgC(r2, c1 - col("x")) - lgC(n, c1))
      .withColumn("__lpobs",
        lgC(r1, col("a")) + lgC(r2, c1 - col("a")) - lgC(n, c1))
    grid.agg(
      max(col("a")).as("a"), max(col("b")).as("b"),
      max(col("c")).as("c"), max(col("d")).as("d"),
      round(max(col("a") * col("d")).cast(DoubleType) /
        max(col("b") * col("c")), 6).as("odds_ratio"),
      round(sum(when(col("__lp") <= col("__lpobs") + 1e-7,
        exp(col("__lp")))), 6).as("p_two_sided"),
      round(sum(when(col("x") <= col("a"), exp(col("__lp")))), 6)
        .as("p_left"),
      round(sum(when(col("x") >= col("a"), exp(col("__lp")))), 6)
        .as("p_right"))
  }

  /** Declared q257: odd/even user parity × heavy-purchaser status. */
  def q257FisherExact(spark: SparkSession, d: String): DataFrame = {
    val users = Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("np"))
    fisherExact(users, pmod(col("user_id"), lit(2L)) === 1L,
      col("np") >= 14L)
  }

  val q257Sql: String =
    """WITH u AS (
      |  SELECT user_id % 2 AS rw,
      |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
      |      END) >= 14 THEN 1 ELSE 0 END AS cl
      |  FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT
      |    sum(CASE WHEN rw = 1 AND cl = 1 THEN 1 ELSE 0 END) AS a,
      |    sum(CASE WHEN rw = 1 AND cl = 0 THEN 1 ELSE 0 END) AS b,
      |    sum(CASE WHEN rw = 0 AND cl = 1 THEN 1 ELSE 0 END) AS c,
      |    sum(CASE WHEN rw = 0 AND cl = 0 THEN 1 ELSE 0 END) AS d
      |  FROM u),
      |grid AS (
      |  SELECT a, b, c, d, x,
      |    (lgamma(a + b + 1.0) - lgamma(x + 1.0)
      |      - lgamma(a + b - x + 1.0)) +
      |    (lgamma(c + d + 1.0) - lgamma(a + c - x + 1.0)
      |      - lgamma(c + d - (a + c - x) + 1.0)) -
      |    (lgamma(a + b + c + d + 1.0) - lgamma(a + c + 1.0)
      |      - lgamma(b + d + 1.0)) AS lp,
      |    (lgamma(a + b + 1.0) - lgamma(a + 1.0) - lgamma(b + 1.0)) +
      |    (lgamma(c + d + 1.0) - lgamma(c + 1.0) - lgamma(d + 1.0)) -
      |    (lgamma(a + b + c + d + 1.0) - lgamma(a + c + 1.0)
      |      - lgamma(b + d + 1.0)) AS lpobs
      |  FROM cells CROSS JOIN generate_series(0, 1048576) AS g(x)
      |  WHERE x BETWEEN greatest(0, (a + c) - (c + d))
      |    AND least(a + b, a + c))
      |SELECT CAST(max(a) AS BIGINT) AS a, CAST(max(b) AS BIGINT) AS b,
      |  CAST(max(c) AS BIGINT) AS c, CAST(max(d) AS BIGINT) AS d,
      |  round(CAST(max(a * d) AS DOUBLE) / max(b * c), 6) AS odds_ratio,
      |  round(sum(CASE WHEN lp <= lpobs + 1e-7 THEN exp(lp) END), 6)
      |    AS p_two_sided,
      |  round(sum(CASE WHEN x <= a THEN exp(lp) END), 6) AS p_left,
      |  round(sum(CASE WHEN x >= a THEN exp(lp) END), 6) AS p_right
      |FROM grid""".stripMargin

  /** McNemar's test on paired binary outcomes — did the same units
    * flip between two conditions (pre/post, model A/model B on the
    * same examples)? Only the DISCORDANT cells matter: b = yes→no,
    * c = no→yes; continuity-corrected χ² = (|b−c|−1)²/(b+c) and the
    * EXACT two-sided binomial p = min(1, 2·Σ_{i≤min(b,c)}
    * C(b+c,i)/2^{b+c}) via the native lgamma expression.
    *
    * One hash aggregate to four cells; the binomial tail enumerates
    * min(b,c)+1 metadata-scale grid rows.
    *
    * @return one row: n_pairs, b, c, chi2_cc, p_exact (6 dp)
    */
  def mcnemarExact(df: DataFrame, pre: org.apache.spark.sql.Column,
      post: org.apache.spark.sql.Column): DataFrame = {
    import graft.functions.GraftFunctions.lgamma
    val cells = df.agg(
      count(lit(1)).as("n_pairs"),
      sum(when(pre && !post, 1L).otherwise(0L)).as("b"),
      sum(when(!pre && post, 1L).otherwise(0L)).as("c"))
    val m = col("b") + col("c")
    val grid = cells
      .select(col("n_pairs"), col("b"), col("c"),
        explode(sequence(lit(0L), least(col("b"), col("c")))).as("i"))
      .withColumn("__lt",
        lgamma(m + 1.0) - lgamma(col("i") + 1.0) -
          lgamma(m - col("i") + 1.0) + m.cast(DoubleType) * math.log(0.5))
    grid.agg(
      max(col("n_pairs")).as("n_pairs"),
      max(col("b")).as("b"), max(col("c")).as("c"),
      round(when(max(m) > 0,
        (abs(max(col("b")) - max(col("c"))).cast(DoubleType) - 1.0) *
          (abs(max(col("b")) - max(col("c"))).cast(DoubleType) - 1.0) /
          max(m)), 6).as("chi2_cc"),
      round(least(lit(1.0), lit(2.0) * sum(exp(col("__lt")))), 6)
        .as("p_exact"))
  }

  /** Declared q263: did heavy purchasing flip between the two halves
    * of January (days 1–15 vs 16–30), per user?
    */
  def q263Mcnemar(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    def np(cond: org.apache.spark.sql.Column) =
      sum(when(col("event_type") === "purchase" && cond, 1L).otherwise(0L))
    val users = ev.groupBy(col("user_id"))
      .agg(np(to_date(col("ts")) <= "2024-01-15").as("np_pre"),
        np(to_date(col("ts")) > "2024-01-15").as("np_post"))
    mcnemarExact(users, col("np_pre") >= 7L, col("np_post") >= 7L)
  }

  val q263Sql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    sum(CASE WHEN event_type = 'purchase'
      |      AND CAST(ts AS DATE) <= DATE '2024-01-15'
      |      THEN 1 ELSE 0 END) AS np_pre,
      |    sum(CASE WHEN event_type = 'purchase'
      |      AND CAST(ts AS DATE) > DATE '2024-01-15'
      |      THEN 1 ELSE 0 END) AS np_post
      |  FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT count(*) AS n_pairs,
      |    sum(CASE WHEN np_pre >= 7 AND np_post < 7 THEN 1 ELSE 0 END)
      |      AS b,
      |    sum(CASE WHEN np_pre < 7 AND np_post >= 7 THEN 1 ELSE 0 END)
      |      AS c
      |  FROM u),
      |grid AS (
      |  SELECT n_pairs, b, c, i,
      |    lgamma(b + c + 1.0) - lgamma(i + 1.0)
      |      - lgamma(b + c - i + 1.0)
      |      + (b + c) * ln(0.5) AS lt
      |  FROM cells CROSS JOIN generate_series(0, 1048576) AS g(i)
      |  WHERE i <= least(b, c))
      |SELECT CAST(max(n_pairs) AS BIGINT) AS n_pairs,
      |  CAST(max(b) AS BIGINT) AS b, CAST(max(c) AS BIGINT) AS c,
      |  round(CASE WHEN max(b + c) > 0 THEN
      |    (abs(CAST(max(b) - max(c) AS DOUBLE)) - 1.0) *
      |    (abs(CAST(max(b) - max(c) AS DOUBLE)) - 1.0) / max(b + c)
      |    END, 6) AS chi2_cc,
      |  round(least(1.0, 2.0 * sum(exp(lt))), 6) AS p_exact
      |FROM grid""".stripMargin

  /** Two-sample Poisson rate test — event counts k over exposures t
    * per cohort: rate difference z (delta method), rate ratio with a
    * 95% log-normal CI. The incident/error-rate comparison where the
    * denominator is exposure, not trials.
    *
    * One hash aggregate to two (k, t) pairs, then scalar algebra.
    */
  def poissonRateTest(df: DataFrame, cohort: org.apache.spark.sql.Column,
      isEvent: org.apache.spark.sql.Column,
      exposure: org.apache.spark.sql.Column): DataFrame = {
    val agg = df.agg(
      sum(when(cohort, when(isEvent, 1L).otherwise(0L))).cast(DoubleType).as("k1"),
      sum(when(cohort, exposure).otherwise(lit(0L))).cast(DoubleType).as("t1"),
      sum(when(!cohort, when(isEvent, 1L).otherwise(0L))).cast(DoubleType).as("k2"),
      sum(when(!cohort, exposure).otherwise(lit(0L))).cast(DoubleType).as("t2"))
    val rr = (col("k1") / col("t1")) / (col("k2") / col("t2"))
    val se = sqrt(lit(1.0) / col("k1") + lit(1.0) / col("k2"))
    agg.select(
      col("k1").cast("long").as("k1"), col("t1").cast("long").as("t1"),
      col("k2").cast("long").as("k2"), col("t2").cast("long").as("t2"),
      round(col("k1") / col("t1"), 6).as("rate1"),
      round(col("k2") / col("t2"), 6).as("rate2"),
      round((col("k1") / col("t1") - col("k2") / col("t2")) /
        sqrt(col("k1") / (col("t1") * col("t1")) +
          col("k2") / (col("t2") * col("t2"))), 6).as("z"),
      round(rr, 6).as("rate_ratio"),
      round(exp(log(rr) - lit(1.959963984540054) * se), 6).as("rr_lo"),
      round(exp(log(rr) + lit(1.959963984540054) * se), 6).as("rr_hi"))
  }

  /** Declared q258: error-event rate per event-row, odd vs even users.
    * Exposure = 1 per event row, so t is each cohort's event volume.
    */
  def q258PoissonRate(spark: SparkSession, d: String): DataFrame =
    poissonRateTest(Tables.events(spark, d),
      pmod(col("user_id"), lit(2L)) === 1L,
      col("event_type") === "error", lit(1L))

  val q258Sql: String =
    """WITH c AS (
      |  SELECT
      |    CAST(sum(CASE WHEN user_id % 2 = 1 AND event_type = 'error'
      |      THEN 1 ELSE 0 END) AS DOUBLE) AS k1,
      |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS t1,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 AND event_type = 'error'
      |      THEN 1 ELSE 0 END) AS DOUBLE) AS k2,
      |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS t2
      |  FROM events)
      |SELECT CAST(k1 AS BIGINT) AS k1, CAST(t1 AS BIGINT) AS t1,
      |  CAST(k2 AS BIGINT) AS k2, CAST(t2 AS BIGINT) AS t2,
      |  round(k1 / t1, 6) AS rate1, round(k2 / t2, 6) AS rate2,
      |  round((k1 / t1 - k2 / t2) /
      |    sqrt(k1 / (t1 * t1) + k2 / (t2 * t2)), 6) AS z,
      |  round((k1 / t1) / (k2 / t2), 6) AS rate_ratio,
      |  round(exp(ln((k1 / t1) / (k2 / t2))
      |    - 1.959963984540054 * sqrt(1.0 / k1 + 1.0 / k2)), 6) AS rr_lo,
      |  round(exp(ln((k1 / t1) / (k2 / t2))
      |    + 1.959963984540054 * sqrt(1.0 / k1 + 1.0 / k2)), 6) AS rr_hi
      |FROM c""".stripMargin
}
