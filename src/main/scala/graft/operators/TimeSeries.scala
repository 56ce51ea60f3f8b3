package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Time-series diagnostics over event streams — autocorrelation,
  * CUSUM changepoint detection, and weekly seasonal decomposition.
  * Reference scope: the reference repo has no time-series surface
  * (SURVEY.md §2.E); these are part of the mandated LLM-pipeline
  * extension set (a crawl/ingest pipeline watches its daily volume
  * series for drift, breaks, and seasonality before trusting a batch).
  *
  * Scale shape shared by all three: raw events collapse to a DAILY
  * series with one map-side-combined hash aggregate — the only pass
  * over the full table. Everything after operates on the daily
  * relation, whose cardinality is calendar-bounded (≤ a few thousand
  * rows for a decade of data) and independent of event volume, so the
  * global-ordered windows and small self-joins downstream never see
  * data-proportional input at any scale.
  *
  * Determinism discipline: per-day counts are exact longs, so every
  * cross-engine sum is integer-exact; the few genuinely fractional
  * aggregates (seasonal index) round through decimal first (the q103
  * convention) so hash compares don't ride on float summation order.
  */
object TimeSeries {

  private val DayUs = 86400L * 1000 * 1000

  /** Events → (day, n) exact daily counts; `day` is days since epoch.
    * Integer `div` (not `/`): the day key must stay an exact long.
    */
  private def dailyCounts(events: DataFrame): DataFrame =
    events
      .select(expr(s"unix_micros(ts) div $DayUs").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n"))

  /** Sample autocorrelation of the daily event-count series at lags
    * 1..`maxLag`: acf(k) = Σ(x_t−μ)(x_{t−k}−μ) / Σ(x_t−μ)², the
    * ingest-health diagnostic for "does volume have weekly structure /
    * is yesterday predictive of today".
    *
    * Lagged pairs come from a hash self-join on `day = day + k` (after
    * exploding the lag frame) — no window needs the whole series in one
    * partition, and missing days simply contribute no pair. All pair
    * sums (Σxy, Σx, Σy) are integer-exact; the final ratio expands the
    * centered product so μ enters once, in one deterministic double
    * expression per lag.
    *
    * @return (lag, m_pairs, acf) for lags with ≥ 2 pairs
    */
  def dailyAcf(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = dailyCounts(events)
    // T, S=Σx, SS=Σx² over the full series (exact longs): μ = S/T and
    // the centered denominator SS − S²/T come out deterministically
    val stats = daily.agg(
      count(lit(1)).as("t_days"),
      sum(col("n")).as("s"),
      sum(col("n") * col("n")).as("ss"))
    val lagged = daily
      .select(col("day"), col("n").as("x_prev"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .select(col("lag"), (col("day") + col("lag")).as("day"), col("x_prev"))
    val mu = col("s").cast("double") / col("t_days")
    val denom = col("ss").cast("double") -
      col("s").cast("double") * col("s") / col("t_days")
    daily.join(lagged, Seq("day"))
      .groupBy(col("lag"))
      .agg(
        count(lit(1)).as("m_pairs"),
        sum(col("n") * col("x_prev")).as("sxy"),
        sum(col("n")).as("sx"),
        sum(col("x_prev")).as("sy"))
      .where(col("m_pairs") >= 2)
      .crossJoin(broadcast(stats))
      .select(col("lag"), col("m_pairs"),
        ((col("sxy").cast("double") - mu * col("sx") - mu * col("sy") +
          col("m_pairs") * mu * mu) / denom).as("acf"))
      .orderBy(col("lag"))
  }

  /** CUSUM changepoint scan over the daily event-count series:
    * S_t = Σ_{i≤t}(x_i − μ). A level shift at day c makes |S_t| peak at
    * c; a stable series random-walks near zero. Emits the full statistic
    * series with the argmax flagged — the monitoring primitive behind
    * "volume broke on the 14th".
    *
    * The running sum is over exact longs (S_t = cumsum_t − t·μ is one
    * deterministic double op per row); the global order-by window sees
    * only the calendar-bounded daily relation.
    *
    * @return (day, n, cusum_dev, is_changepoint) — one row per observed
    *         day; is_changepoint marks max |cusum_dev|
    */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val daily = dailyCounts(events)
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = daily.agg(count(lit(1)).as("t_days"), sum(col("n")).as("s"))
    val dev = daily
      .select(col("day"), col("n"),
        sum(col("n")).over(w).as("cum"),
        row_number().over(Window.orderBy(col("day"))).as("rn"))
      .crossJoin(broadcast(stats))
      .select(col("day"), col("n"),
        (col("cum").cast("double") -
          col("rn") * (col("s").cast("double") / col("t_days"))).as("cusum_dev"))
    val peak = dev.agg(max(abs(col("cusum_dev"))).as("max_dev"))
    dev.crossJoin(broadcast(peak))
      .select(col("day"), col("n"), col("cusum_dev"),
        (abs(col("cusum_dev")) === col("max_dev")).as("is_changepoint"))
  }

  /** Classical additive seasonal decomposition of the daily series on a
    * weekly period: trend = 7-day centered moving average, seasonal =
    * per-day-of-week mean deviation from trend, residual = remainder.
    * The corpus-ops question it answers: "is Monday's volume dip
    * seasonal or a problem?".
    *
    * The moving average requires 7 CONSECUTIVE observed days (a count
    * guard over the range frame — gaps yield null trend, matching the
    * textbook treatment of series edges). Trend is an exact long sum
    * / 7.0; the seasonal index rounds deviations through decimal(20,8)
    * before averaging so the cross-engine hash compare never rides on
    * double summation order.
    *
    * @return (day, dow, n, trend, seasonal, residual) per observed day
    */
  def seasonalDecompose(events: DataFrame): DataFrame = {
    val daily = dailyCounts(events)
    // RANGE frame on the day value (not rows): a gap in the calendar
    // must invalidate the centered week, not silently widen it
    val wk = Window.orderBy(col("day")).rangeBetween(-3, 3)
    val withTrend = daily.select(col("day"), pmod(col("day"), lit(7L)).as("dow"),
      col("n"),
      when(count(lit(1)).over(wk) === 7,
        sum(col("n")).over(wk).cast("double") / 7.0).as("trend"))
    val seasonal = withTrend
      .where(col("trend").isNotNull)
      .groupBy(col("dow"))
      .agg(avg((col("n") - col("trend")).cast("decimal(20,8)"))
        .cast("double").as("seasonal"))
    withTrend.join(broadcast(seasonal), Seq("dow"), "left")
      .select(col("day"), col("dow"), col("n"), col("trend"),
        col("seasonal"),
        (col("n") - col("trend") - col("seasonal")).as("residual"))
  }

  /** Declared q143: weekly-structure ACF (lags 1–7) of events volume. */
  def q143Acf(spark: SparkSession, d: String): DataFrame =
    dailyAcf(Tables.events(spark, d), maxLag = 7)

  val q143Sql: String =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
      |  FROM events GROUP BY 1),
      |stats AS (
      |  SELECT count(*) AS t_days, sum(n) AS s, sum(n * n) AS ss FROM daily),
      |pairs AS (
      |  SELECT l.lag, cur.n AS x, prev.n AS x_prev
      |  FROM (SELECT unnest(range(1, 8)) AS lag) l
      |  JOIN daily prev ON true
      |  JOIN daily cur ON cur.day = prev.day + l.lag)
      |SELECT CAST(lag AS INT) AS lag, CAST(count(*) AS BIGINT) AS m_pairs,
      |  (sum(x * x_prev)
      |     - (CAST(s AS DOUBLE) / t_days) * sum(x)
      |     - (CAST(s AS DOUBLE) / t_days) * sum(x_prev)
      |     + count(*) * (CAST(s AS DOUBLE) / t_days)
      |         * (CAST(s AS DOUBLE) / t_days))
      |  / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / t_days) AS acf
      |FROM pairs CROSS JOIN stats
      |GROUP BY lag, s, ss, t_days
      |HAVING count(*) >= 2""".stripMargin

  /** Declared q144: CUSUM level-shift scan of events volume. */
  def q144Cusum(spark: SparkSession, d: String): DataFrame =
    cusumChangepoint(Tables.events(spark, d))

  val q144Sql: String =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
      |  FROM events GROUP BY 1),
      |stats AS (SELECT count(*) AS t_days, sum(n) AS s FROM daily),
      |dev AS (
      |  SELECT day, n,
      |    CAST(sum(n) OVER (ORDER BY day) AS DOUBLE)
      |      - (row_number() OVER (ORDER BY day))
      |          * (CAST(s AS DOUBLE) / t_days) AS cusum_dev
      |  FROM daily CROSS JOIN stats),
      |peak AS (SELECT max(abs(cusum_dev)) AS max_dev FROM dev)
      |SELECT CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n, cusum_dev,
      |  abs(cusum_dev) = max_dev AS is_changepoint
      |FROM dev CROSS JOIN peak""".stripMargin

  /** Declared q145: weekly additive decomposition of events volume. */
  def q145Seasonal(spark: SparkSession, d: String): DataFrame =
    seasonalDecompose(Tables.events(spark, d))

  val q145Sql: String =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
      |  FROM events GROUP BY 1),
      |tr AS (
      |  SELECT day, day % 7 AS dow, n,
      |    CASE WHEN count(*) OVER wk = 7
      |         THEN CAST(sum(n) OVER wk AS DOUBLE) / 7.0 END AS trend
      |  FROM daily
      |  WINDOW wk AS (ORDER BY day RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |seas AS (
      |  SELECT dow,
      |    CAST(avg(CAST(n - trend AS DECIMAL(20,8))) AS DOUBLE) AS seasonal
      |  FROM tr WHERE trend IS NOT NULL GROUP BY dow)
      |SELECT CAST(tr.day AS BIGINT) AS day, CAST(tr.dow AS BIGINT) AS dow,
      |  CAST(tr.n AS BIGINT) AS n, tr.trend, seas.seasonal,
      |  tr.n - tr.trend - seas.seasonal AS residual
      |FROM tr LEFT JOIN seas USING (dow)""".stripMargin

  /** Theil–Sen robust trend of the daily volume series — the
    * outlier-immune complement to q117's least-squares: slope = median
    * of all pairwise day-to-day slopes (breakdown point ~29%, so a
    * burst of crawler spam days cannot drag the trend), intercept =
    * median residual at that slope.
    *
    * Scale shape: the all-pairs slope relation is quadratic ONLY in
    * the calendar-bounded daily series (a decade is ~3.6k days →
    * ~6.6M pairs, constant w.r.t. event volume); the raw table is
    * touched once by [[dailyCounts]]. Both medians are interpolated
    * percentiles — identical linear-interpolation semantics on both
    * engines.
    *
    * @return one row: n_days, n_pairs, slope, intercept
    */
  def theilSenTrend(events: DataFrame): DataFrame = {
    // three consumers of the daily series (two pair legs + residuals)
    val daily = dailyCounts(events).localCheckpoint()
    val a = daily.select(col("day").as("xi"), col("n").as("yi"))
    val b = daily.select(col("day").as("xj"), col("n").as("yj"))
    val slopes = a.join(b, col("xi") < col("xj"))
      .select(((col("yj") - col("yi")) /
        (col("xj") - col("xi")).cast("double")).as("slope"))
    val m = slopes.agg(
      percentile(col("slope"), lit(0.5)).as("slope"),
      count(lit(1)).as("n_pairs"))
    daily.crossJoin(broadcast(m))
      .select(col("day"), col("n"), col("slope"), col("n_pairs"),
        (col("n") - col("slope") * col("day")).as("__r"))
      .agg(count(lit(1)).as("n_days"), max(col("n_pairs")).as("n_pairs"),
        max(col("slope")).as("slope"),
        percentile(col("__r"), lit(0.5)).as("intercept"))
  }

  /** Declared q157: Theil–Sen trend of daily event volume. */
  def q157TheilSen(spark: SparkSession, d: String): DataFrame =
    theilSenTrend(graft.core.Tables.events(spark, d))

  val q157Sql: String =
    """WITH d AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT (b.n - a.n) / CAST(b.day - a.day AS DOUBLE) AS slope
      |  FROM d a JOIN d b ON a.day < b.day),
      |m AS (
      |  SELECT quantile_cont(slope, 0.5) AS slope, count(*) AS n_pairs
      |  FROM p),
      |r AS (
      |  SELECT d.n - m.slope * d.day AS resid, m.slope, m.n_pairs
      |  FROM d CROSS JOIN m)
      |SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
      |  CAST(max(n_pairs) AS BIGINT) AS n_pairs,
      |  max(slope) AS slope,
      |  quantile_cont(resid, 0.5) AS intercept
      |FROM r""".stripMargin

  /** Day-of-week seasonality STRENGTH per event type — the one-number
    * ANOVA companion to [[seasonalDecompose]]: η² = SS_between/SS_total
    * over the per-(type, dow) daily-count cells, i.e. the fraction of
    * daily-volume variance the weekly cycle explains. η² ≈ 0 → no
    * weekly structure; → 1 → volume is a pure weekly pattern.
    *
    * Scale shape: raw events collapse to (type, day) counts in one
    * map-combined aggregate (the [[dailyCounts]] discipline, keyed);
    * everything after runs on the calendar-bounded cell relation.
    * SS terms are expanded sums (Σn², Σn, per-dow sums), so no mean
    * is subtracted row-by-row and float order stays irrelevant at the
    * compare's rounding.
    */
  def weeklyEtaSquared(events: DataFrame): DataFrame = {
    val daily = events
      .select(col("event_type"),
        expr(s"unix_micros(ts) div $DayUs").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", pmod(col("day"), lit(7)))
      // two consumers: per-dow groups and per-type totals
      .localCheckpoint()
    val byDow = daily.groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("__m"), sum(col("n")).as("__s"))
    val tot = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("__t"), sum(col("n")).as("__st"),
        // double product: n² in longs would overflow past ~3e9
        // events/(type,day); the compare's 1e-6 rounding absorbs the
        // double-vs-exact difference
        sum(col("n").cast("double") * col("n")).as("__ss"))
    // SS_total = Σn² − (Σn)²/T; SS_between = Σ_g s_g²/m_g − (Σn)²/T
    byDow
      .groupBy(col("event_type"))
      .agg(sum(col("__s").cast("double") * col("__s") / col("__m")).as("__b"))
      .join(tot, Seq("event_type"))
      .select(col("event_type"), col("__t").as("n_days"),
        ((col("__b") - col("__st").cast("double") * col("__st") / col("__t")) /
          (col("__ss") - col("__st").cast("double") * col("__st") / col("__t")))
          .as("eta_sq"))
  }

  /** Declared q181: weekly-cycle variance share per event type. */
  def q181WeeklyEta(spark: SparkSession, d: String): DataFrame =
    weeklyEtaSquared(graft.core.Tables.events(spark, d))

  val q181Sql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |d2 AS (
      |  SELECT event_type, n, day % 7 AS dow FROM daily),
      |bd AS (
      |  SELECT event_type, dow, count(*) AS m, sum(n) AS s
      |  FROM d2 GROUP BY 1, 2),
      |tot AS (
      |  SELECT event_type, count(*) AS t, sum(n) AS st,
      |    sum(n * n) AS ss
      |  FROM d2 GROUP BY 1),
      |b AS (
      |  SELECT event_type, sum(CAST(s AS DOUBLE) * s / m) AS b
      |  FROM bd GROUP BY 1)
      |SELECT b.event_type, CAST(tot.t AS BIGINT) AS n_days,
      |  (b.b - CAST(tot.st AS DOUBLE) * tot.st / tot.t)
      |    / (tot.ss - CAST(tot.st AS DOUBLE) * tot.st / tot.t) AS eta_sq
      |FROM b JOIN tot USING (event_type)""".stripMargin

  /** Exponentially weighted moving average of the daily volume series —
    * the online-smoothing complement to q145's symmetric decomposition
    * (EWMA is causal: today's level uses only the past, which is what a
    * live ingest monitor can actually compute). s₁ = x₁,
    * sₜ = α·xₜ + (1−α)·sₜ₋₁, evaluated in CLOSED FORM on the ordered
    * prefix sum of uₜ = xₜ/(1−α)ᵗ:
    * sₜ = α·(1−α)ᵗ·Σ_{i=2..t} uᵢ + (1−α)ᵗ⁻¹·x₁ — one running-sum
    * window over the calendar-bounded daily relation (see BASELINE.md's
    * single-partition-window inventory) instead of an inherently
    * sequential recurrence.
    *
    * The rescaling is the textbook numeric caveat: (1−α)⁻ᵗ grows
    * geometrically, so the closed form is exact only while it stays
    * inside double range — `require` caps the series at 1500 steps
    * (0.7⁻¹⁵⁰⁰ ≈ 10²³², still finite; relative error stays ~1e−16 of
    * the LEVEL because numerator and denominator share the scale).
    * Longer horizons would re-anchor per block; the declared query's
    * calendar window is fixture-bounded. Output rounds to 6 dp — the
    * running sum is order-pinned by the window, so rounding only
    * absorbs `pow` last-ulp differences across engine math libraries.
    *
    * @return (day, n, ewma) per observed day, α-smoothed over the
    *         OBSERVED series (gaps carry the level forward untouched —
    *         day index is the observation rank, the q143 convention)
    */
  def ewmaDaily(events: DataFrame, alpha: Double = 0.3): DataFrame = {
    require(alpha > 0 && alpha < 1, s"need 0 < alpha < 1, got $alpha")
    val daily = dailyCounts(events).localCheckpoint()
    val nDays = daily.count()
    require(nDays <= 1500,
      s"ewmaDaily closed form caps at 1500 observed days, got $nDays " +
        "(re-anchor per block for longer horizons)")
    val base = 1.0 - alpha
    val ord = Window.orderBy(col("day"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .select(col("day"), col("n"),
        row_number().over(ord).as("__t"),
        first(col("n")).over(run).as("__x1"))
      .withColumn("__u", col("n").cast("double") / pow(lit(base), col("__t")))
      .withColumn("__cu", sum(when(col("__t") >= 2, col("__u"))
        .otherwise(0.0)).over(run))
      .select(col("day"), col("n"),
        round(lit(alpha) * pow(lit(base), col("__t")) * col("__cu") +
          pow(lit(base), col("__t") - 1) * col("__x1"), 6).as("ewma"))
  }

  /** Declared q199: α = 0.3 EWMA of daily event volume. */
  def q199Ewma(spark: SparkSession, d: String): DataFrame =
    ewmaDaily(Tables.events(spark, d), alpha = 0.3)

  val q199Sql: String =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
      |  FROM events GROUP BY 1),
      |idx AS (
      |  SELECT day, n,
      |    row_number() OVER (ORDER BY day) AS t,
      |    first_value(n) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x1
      |  FROM daily),
      |u AS (
      |  SELECT day, n, t, x1,
      |    sum(CASE WHEN t >= 2
      |          THEN CAST(n AS DOUBLE) / pow(0.7, t) ELSE 0.0 END)
      |      OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
      |        AND CURRENT ROW) AS cu
      |  FROM idx)
      |SELECT day, n,
      |  round(0.3 * pow(0.7, t) * cu + pow(0.7, t - 1) * x1, 6) AS ewma
      |FROM u""".stripMargin

  /** Offline changepoint localization by binary segmentation (first
    * split): per series, the split index k maximizing the
    * between-segment sum of squares
    * BSS(k) = k(μ_L−μ)² + (n−k)(μ_R−μ)² — i.e. the single mean-shift
    * CUSUM's sequential alarm (q144) only FLAGS; this LOCATES the
    * break for the drift postmortem. Everything derives from one
    * ordered prefix sum per series.
    *
    * Determinism discipline: the series is the DAILY COUNT series, so
    * prefix sums are exact longs and BSS is computed from identical
    * integers on every engine — the 6 dp rounding + smallest-k
    * tiebreak on the argmax is then genuinely deterministic, not
    * float-accumulation-order roulette.
    *
    * Scale shape: one map-side-combined hash aggregate to dailies
    * (the only full pass), then per-series windows over the
    * calendar-bounded relation and one series-keyed `max(struct)`
    * argmax — no corpus-scale window, no driver loop.
    *
    * @return per event_type: split day (last day of the left
    *         segment), k, n_days, mean_left, mean_right, bss
    */
  def bestMeanShift(daily: DataFrame, seriesCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    val bySeries = Window.partitionBy(col(seriesCol))
    val ordered = bySeries.orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("__k", row_number().over(bySeries.orderBy(col(ordCol))))
      .withColumn("__s", sum(col(valueCol)).over(ordered))
      .withColumn("__n", count(lit(1)).over(bySeries))
      .withColumn("__t", sum(col(valueCol)).over(bySeries))
      .where(col("__k") < col("__n"))
      .select(col(seriesCol), col(ordCol), col("__k"), col("__n"),
        {
          val k = col("__k").cast("double")
          val n = col("__n").cast("double")
          val ml = col("__s").cast("double") / k
          val mr = (col("__t") - col("__s")).cast("double") / (n - k)
          val m = col("__t").cast("double") / n
          struct(
            round(k * (ml - m) * (ml - m) + (n - k) * (mr - m) * (mr - m), 6)
              .as("bss"),
            (-col("__k")).as("negk"), col(ordCol).as("ord"),
            round(ml, 6).as("ml"), round(mr, 6).as("mr")).as("__c")
        })
    scored.groupBy(col(seriesCol))
      .agg(max(col("__c")).as("__b"), max(col("__n")).as("n_days"))
      .select(col(seriesCol), col("__b.ord").as("split_" + ordCol),
        (-col("__b.negk")).cast("long").as("k"),
        col("n_days").cast("long").as("n_days"),
        col("__b.ml").as("mean_left"), col("__b.mr").as("mean_right"),
        col("__b.bss").as("bss"))
  }

  /** Declared q206: where did each event type's daily volume break. */
  def q206Changepoint(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    bestMeanShift(daily, "event_type", "day", "n")
  }

  val q206Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, day,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
      |    sum(n) OVER (PARTITION BY event_type ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
      |    count(*) OVER (PARTITION BY event_type) AS nd,
      |    sum(n) OVER (PARTITION BY event_type) AS t
      |  FROM daily),
      |sc AS (
      |  SELECT event_type, day, k, nd,
      |    round(CAST(k AS DOUBLE) *
      |        pow(CAST(s AS DOUBLE) / k - CAST(t AS DOUBLE) / nd, 2)
      |      + CAST(nd - k AS DOUBLE) *
      |        pow(CAST(t - s AS DOUBLE) / (nd - k) - CAST(t AS DOUBLE) / nd, 2),
      |      6) AS bss,
      |    round(CAST(s AS DOUBLE) / k, 6) AS ml,
      |    round(CAST(t - s AS DOUBLE) / (nd - k), 6) AS mr
      |  FROM w WHERE k < nd)
      |SELECT event_type, day AS split_day, CAST(k AS BIGINT) AS k,
      |  CAST(nd AS BIGINT) AS n_days, ml AS mean_left, mr AS mean_right, bss
      |FROM sc
      |QUALIFY row_number() OVER (PARTITION BY event_type
      |  ORDER BY bss DESC, k) = 1""".stripMargin

  /** SAX symbolization (Lin/Keogh et al., DMKD 2007): z-normalize a
    * series, average it into w equal-occupancy PAA segments, and bin
    * each segment mean into an alphabet by standard-normal
    * breakpoints (4 symbols: −0.6745, 0, 0.6745 — the quartiles).
    * The discrete word is what makes series comparable symbolically —
    * motif mining, anomaly grammars, series indexing — and two series
    * of wildly different volume get the SAME word when their shapes
    * match (the z-normalization's entire point).
    *
    * Determinism discipline: the series is the integer daily-count
    * series; μ/σ are per-series scalar aggregates and every
    * downstream value rounds to 6 dp before compare. A constant
    * series (σ = 0) maps to z = 0 (not nulls), which bins UP to 'c'
    * — breakpoint values take the upper symbol by convention.
    *
    * Scale shape: one hash aggregate to dailies, per-series windows
    * over the calendar-bounded relation, one (series, segment)
    * aggregate. Series count scales out; series LENGTH is
    * calendar-bounded, so per-series windows never concentrate data-
    * proportional volume on one task.
    *
    * @return per (series, segment): paa (6 dp) and symbol a..d
    */
  def saxWords(daily: DataFrame, seriesCol: String, ordCol: String,
      valueCol: String, segments: Int): DataFrame = {
    require(segments >= 1)
    val bySeries = Window.partitionBy(col(seriesCol))
    val stats = daily.groupBy(col(seriesCol))
      .agg(avg(col(valueCol)).as("__mu"),
        stddev_samp(col(valueCol)).as("__sd"),
        count(lit(1)).as("__nd"))
    val z = when(col("__sd").isNull || col("__sd") === 0.0, lit(0.0))
      .otherwise((col(valueCol).cast("double") - col("__mu")) / col("__sd"))
    val seg = ((row_number().over(bySeries.orderBy(col(ordCol))) - 1)
      .cast("long") * segments / col("__nd")).cast("long")
    val paa = daily.join(stats, Seq(seriesCol))
      .select(col(seriesCol), seg.as("segment"), z.as("__z"))
      .groupBy(col(seriesCol), col("segment"))
      .agg(round(avg(col("__z")), 6).as("paa"))
    paa.select(col(seriesCol), col("segment"), col("paa"),
      when(col("paa") < -0.6745, "a")
        .when(col("paa") < 0.0, "b")
        .when(col("paa") < 0.6745, "c")
        .otherwise("d").as("symbol"))
  }

  /** Declared q211: each event type's daily volume as an 8-symbol
    * SAX word.
    */
  def q211Sax(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    saxWords(daily, "event_type", "day", "n", segments = 8)
  }

  val q211Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd,
      |    count(*) AS nd
      |  FROM daily GROUP BY 1),
      |z AS (
      |  SELECT d.event_type,
      |    ((row_number() OVER (PARTITION BY d.event_type ORDER BY day)
      |      - 1) * 8) // nd AS segment,
      |    CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
      |         ELSE (CAST(n AS DOUBLE) - mu) / sd END AS z
      |  FROM daily d JOIN st USING (event_type)),
      |paa AS (
      |  SELECT event_type, CAST(segment AS BIGINT) AS segment,
      |    round(avg(z), 6) AS paa
      |  FROM z GROUP BY 1, 2)
      |SELECT event_type, segment, paa,
      |  CASE WHEN paa < -0.6745 THEN 'a'
      |       WHEN paa < 0.0 THEN 'b'
      |       WHEN paa < 0.6745 THEN 'c'
      |       ELSE 'd' END AS symbol
      |FROM paa""".stripMargin

  /** Seasonal-naive forecast backtest with MASE scoring (Hyndman &
    * Koehler 2006) — the sanity bar every fancier forecaster must
    * clear: forecast each observation by the value 7 OBSERVED rows
    * earlier (the weekly naive on the observed grid — row-lag, not
    * calendar-lag, pinned and documented: on a gapless daily series
    * they coincide, and row-lag is what stays well-defined under
    * gaps), and scale its MAE by the one-step naive MAE so scores
    * compare across series of different volume:
    *
    *   MASE = mean|y_t − y_{t−7}| / mean|y_t − y_{t−1}|
    *
    * MASE < 1 ⇒ weekly structure is real and exploitable.
    *
    * Scale shape: one hash aggregate to dailies, two row-lags in ONE
    * per-series window pass, one series-keyed aggregate. Calendar-
    * bounded per series, series count scales out.
    */
  def seasonalNaiveBacktest(daily: DataFrame, seriesCol: String,
      ordCol: String, valueCol: String, season: Int): DataFrame = {
    require(season >= 2)
    val bySeries = Window.partitionBy(col(seriesCol)).orderBy(col(ordCol))
    daily
      .withColumn("__l1", lag(col(valueCol), 1).over(bySeries))
      .withColumn("__ls", lag(col(valueCol), season).over(bySeries))
      .groupBy(col(seriesCol))
      .agg(count(lit(1)).as("n_days"),
        round(avg(abs(col(valueCol) - col("__ls"))), 6).as("mae_snaive"),
        round(avg(abs(col(valueCol) - col("__l1"))), 6).as("mae_naive1"))
      .where(col("mae_naive1").isNotNull && col("mae_naive1") > 0)
      .select(col(seriesCol), col("n_days"), col("mae_snaive"),
        col("mae_naive1"),
        round(col("mae_snaive") / col("mae_naive1"), 6).as("mase"))
  }

  /** Declared q230: is each event type's weekly pattern exploitable. */
  def q230Mase(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    seasonalNaiveBacktest(daily, "event_type", "day", "n", season = 7)
  }

  val q230Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS DOUBLE) AS n
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, n,
      |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS l1,
      |    lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS ls
      |  FROM daily),
      |m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |    round(avg(abs(n - ls)), 6) AS mae_snaive,
      |    round(avg(abs(n - l1)), 6) AS mae_naive1
      |  FROM l GROUP BY 1)
      |SELECT event_type, n_days, mae_snaive, mae_naive1,
      |  round(mae_snaive / mae_naive1, 6) AS mase
      |FROM m WHERE mae_naive1 IS NOT NULL AND mae_naive1 > 0""".stripMargin
}
