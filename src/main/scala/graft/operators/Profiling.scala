package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Schema-driven column profiling — the `ANALYZE TABLE` / data-quality
  * sweep a pipeline runs before trusting a new 100 TB drop: per column,
  * row count, null count, exact distinct count, and type-appropriate
  * min/max (numerics as doubles, timestamps formatted, everything else
  * as strings).
  *
  * Scale shape: ONE aggregate job over the table produces a single
  * row holding every per-column statistic (count/min/max are plain
  * partial aggregates; the distinct counts share one Expand-based
  * multi-distinct aggregate), and the per-column output rows are an
  * `inline` of a literal-sized array built FROM that row — the table
  * is scanned once, no per-column passes, nothing wide ever shuffles.
  * At 100 TB the same plan holds; if exact distinct counts are not
  * worth the Expand multiplier there, [[profileColumns]] takes
  * `approxDistinct = true` and swaps in mergeable HLL sketches
  * (`approx_count_distinct`) with no other plan change.
  */
object Profiling {

  /** One profile row per column of `df`:
    * (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
    * min_str, max_str) — numeric min/max in `*_num`, formatted
    * timestamp / raw string min/max in `*_str`, the other pair null.
    */
  def profileColumns(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val nRows = count(lit(1)).as("__n")
    val perCol = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val (mnN, mxN, mnS, mxS) = f.dataType match {
        case _: NumericType =>
          (min(c).cast(DoubleType), max(c).cast(DoubleType),
            lit(null).cast(StringType), lit(null).cast(StringType))
        case TimestampType | DateType =>
          (lit(null).cast(DoubleType), lit(null).cast(DoubleType),
            date_format(min(c), "yyyy-MM-dd HH:mm:ss"),
            date_format(max(c), "yyyy-MM-dd HH:mm:ss"))
        case _ =>
          (lit(null).cast(DoubleType), lit(null).cast(DoubleType),
            min(c).cast(StringType), max(c).cast(StringType))
      }
      Seq(count(c).as(s"__cnt_${f.name}"),
        mnN.as(s"__mnn_${f.name}"), mxN.as(s"__mxn_${f.name}"),
        mnS.as(s"__mns_${f.name}"), mxS.as(s"__mxs_${f.name}"))
    }
    // the distinct counts live in their OWN aggregate: fusing them with
    // the plain stats forces every count/min/max through the Expand-
    // multiplied multi-distinct plan (measured ~3x the split cost at
    // sf0.1); two single-row aggregates joined back are each optimal
    val nds = df.schema.fields.map { f =>
      val nd =
        if (approxDistinct) approx_count_distinct(col(f.name))
        else countDistinct(col(f.name))
      nd.as(s"__nd_${f.name}")
    }
    val one = df.agg(nRows, perCol.toIndexedSeq: _*)
      .crossJoin(df.agg(nds.head, nds.tail.toIndexedSeq: _*))
    val rows: Column = array(df.schema.fields.map { f =>
      struct(
        lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_${f.name}")).as("n_nulls"),
        col(s"__nd_${f.name}").as("n_distinct"),
        col(s"__mnn_${f.name}").as("min_num"),
        col(s"__mxn_${f.name}").as("max_num"),
        col(s"__mns_${f.name}").as("min_str"),
        col(s"__mxs_${f.name}").as("max_str"))
    }.toIndexedSeq: _*)
    one.select(inline(rows))
  }

  /** Pairwise Pearson correlation matrix over numeric columns — the
    * profiling sweep's second moment: collinear feature detection,
    * redundant-signal pruning before model training. ONE map-side-
    * combined aggregate computes every per-column and per-pair
    * sufficient statistic (n, Σx, Σx², Σxy for all C(k,2) pairs), and
    * the closed-form correlations are an `inline` over that single
    * row — the table is scanned once no matter how many columns, the
    * same shape as [[profileColumns]]. The oracle replays the
    * identical formula (not DuckDB's `corr`) so both sides share one
    * floating-point story.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val n = count(lit(1)).cast(DoubleType).as("__n")
    val moments = cols.flatMap { c =>
      val x = col(c).cast(DoubleType)
      Seq(sum(x).as(s"__s_$c"), sum(x * x).as(s"__ss_$c"))
    }
    val pairs = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      sum(col(a).cast(DoubleType) * col(b).cast(DoubleType)).as(s"__sp_${a}_$b")
    }
    val one = df.agg(n, (moments ++ pairs).toIndexedSeq: _*)
    val rows = array(cols.combinations(2).toSeq.map { case Seq(a, b) =>
      val cov = col("__n") * col(s"__sp_${a}_$b") - col(s"__s_$a") * col(s"__s_$b")
      val va = col("__n") * col(s"__ss_$a") - col(s"__s_$a") * col(s"__s_$a")
      val vb = col("__n") * col(s"__ss_$b") - col(s"__s_$b") * col(s"__s_$b")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        (cov / sqrt(va * vb)).as("corr"))
    }: _*)
    one.select(inline(rows))
  }

  /** Declared q121: correlation matrix of the lineitem measures. */
  def q121Correlations(spark: SparkSession, d: String): DataFrame =
    correlationMatrix(Tables.lineitem(spark, d),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  val q121Sql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val moments = cols.flatMap(c =>
      Seq(s"sum($c) AS s_$c", s"sum($c * $c) AS ss_$c"))
    val prods = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      s"sum($a * $b) AS sp_${a}_$b"
    }
    val agg = (Seq("CAST(count(*) AS DOUBLE) AS n") ++ moments ++ prods)
      .mkString(", ")
    val rows = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      s"""SELECT '$a' AS col_x, '$b' AS col_y,
         |  (n * sp_${a}_$b - s_$a * s_$b) /
         |    sqrt((n * ss_$a - s_$a * s_$a) * (n * ss_$b - s_$b * s_$b))
         |    AS corr FROM m""".stripMargin
    }
    s"WITH m AS (SELECT $agg FROM lineitem)\n" + rows.mkString("\nUNION ALL\n")
  }

  /** Exact equi-width histogram — `bins` buckets spanning [min, max],
    * the profiling/drift primitive behind distribution dashboards.
    * Two aggregate passes over the column (global min/max, then the
    * bin counts), with the bounds riding the second pass as a
    * broadcast scalar row — never a driver action between them; empty
    * bins are absent (sparse output).
    */
  def equiWidthHistogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    val v = col(valueCol).cast(DoubleType)
    val bounds = df.agg(min(v).as("__lo"), max(v).as("__hi"))
    val w = (col("__hi") - col("__lo")) / lit(bins.toDouble)
    val idx = least(floor((v - col("__lo")) / w), lit(bins - 1L)).cast(LongType)
    df.select(v.as(valueCol))
      .crossJoin(broadcast(bounds))
      .select(idx.as("bin"), col("__lo"), w.as("__w"))
      .groupBy(col("bin"), col("__lo"), col("__w"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (col("__lo") + col("bin") * col("__w")).as("lo"),
        (col("__lo") + (col("bin") + lit(1L)) * col("__w")).as("hi"),
        col("n"))
  }

  /** Declared q122: 20-bin histogram of extended prices. */
  def q122Histogram(spark: SparkSession, d: String): DataFrame =
    equiWidthHistogram(Tables.lineitem(spark, d), "l_extendedprice", bins = 20)

  val q122Sql: String =
    """WITH b AS (
      |  SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
      |    (CAST(max(l_extendedprice) AS DOUBLE) -
      |     CAST(min(l_extendedprice) AS DOUBLE)) / 20.0 AS w
      |  FROM lineitem),
      |c AS (
      |  SELECT CAST(least(floor((l_extendedprice - b.lo) / b.w), 19) AS BIGINT)
      |      AS bin,
      |    b.lo AS blo, b.w AS bw, count(*) AS n
      |  FROM lineitem, b GROUP BY 1, 2, 3)
      |SELECT bin, blo + bin * bw AS lo, blo + (bin + 1) * bw AS hi,
      |  CAST(n AS BIGINT) AS n
      |FROM c""".stripMargin

  /** Benford first-significant-digit audit — fabricated or truncated
    * numeric columns drift from the log-law digit distribution
    * (P(d) = log10(1 + 1/d)), a standard forensic data-quality check.
    * One hash aggregate collapses the column to 9 digit counts; the
    * share/deviation algebra is a window over that 9-row relation
    * (metadata-scale by construction). Non-positive values are out of
    * Benford's domain and excluded.
    */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol).cast(DoubleType)
    val digit = floor(v / pow(lit(10.0), floor(log10(v)))).cast(LongType)
    val counts = df.where(v > 0.0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val frac = col("n").cast(DoubleType) / sum(col("n")).over(w)
    val benford = log10(lit(1.0) + lit(1.0) / col("digit"))
    counts.select(col("digit"), col("n"), frac.as("frac"),
      benford.as("benford_frac"), abs(frac - benford).as("abs_dev"))
  }

  /** Declared q120: Benford audit of order totals. */
  def q120Benford(spark: SparkSession, d: String): DataFrame =
    benfordDigits(Tables.orders(spark, d), "o_totalprice")

  val q120Sql: String =
    """WITH c AS (
      |  SELECT CAST(floor(o_totalprice /
      |      power(10, floor(log10(o_totalprice)))) AS BIGINT) AS digit,
      |    count(*) AS n
      |  FROM orders WHERE o_totalprice > 0 GROUP BY 1)
      |SELECT digit, CAST(n AS BIGINT) AS n,
      |  CAST(n AS DOUBLE) / sum(n) OVER () AS frac,
      |  log10(1 + 1.0 / digit) AS benford_frac,
      |  abs(CAST(n AS DOUBLE) / sum(n) OVER () - log10(1 + 1.0 / digit))
      |    AS abs_dev
      |FROM c""".stripMargin

  /** Winsorized per-group statistics — the robust-mean primitive for
    * metric pipelines where a handful of extreme rows (bot traffic,
    * unit-error telemetry) would otherwise own the average. Values are
    * clamped to the group's [loQ, hiQ] exact percentiles, then
    * re-aggregated. Two passes over the data by necessity (the clamp
    * bound IS a distribution statistic): pass 1 computes per-group
    * percentiles, which come back as a BROADCAST group-cardinality
    * relation; pass 2 is one hash aggregate over the clamped value.
    * Exact `percentile` keeps a per-group value buffer — correct for
    * the oracle check; at 100 TB swap in the `approx_percentile`
    * sketch (constant memory), the same substitution q05 documents
    * for distinct counts.
    */
  def winsorizedStats(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      loQ: Double,
      hiQ: Double): DataFrame = {
    val v = col(valueCol).cast(DoubleType)
    val pcts = df.groupBy(col(keyCol))
      .agg(percentile(v, lit(loQ)).as("p_lo"),
        percentile(v, lit(hiQ)).as("p_hi"))
    df.select(col(keyCol), v.as("__v"))
      .join(broadcast(pcts), Seq(keyCol))
      .groupBy(col(keyCol), col("p_lo"), col("p_hi"))
      .agg(count(lit(1)).as("n"),
        avg(col("__v")).as("raw_avg"),
        avg(least(greatest(col("__v"), col("p_lo")), col("p_hi")))
          .as("wins_avg"))
      .select(col(keyCol), col("n"), col("raw_avg"),
        col("p_lo"), col("p_hi"), col("wins_avg"))
  }

  /** Declared q130: winsorized mean of event values per event type,
    * clamped at the exact [p05, p95].
    */
  def q130Winsorize(spark: SparkSession, d: String): DataFrame =
    winsorizedStats(Tables.events(spark, d), "event_type", "value",
      loQ = 0.05, hiQ = 0.95)

  val q130Sql: String =
    """WITH p AS (
      |  SELECT event_type,
      |    CAST(quantile_cont(value, 0.05) AS DOUBLE) AS p_lo,
      |    CAST(quantile_cont(value, 0.95) AS DOUBLE) AS p_hi
      |  FROM events GROUP BY 1)
      |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
      |  avg(e.value) AS raw_avg, p.p_lo, p.p_hi,
      |  avg(least(greatest(e.value, p.p_lo), p.p_hi)) AS wins_avg
      |FROM events e JOIN p USING (event_type)
      |GROUP BY e.event_type, p.p_lo, p.p_hi""".stripMargin

  /** Median-absolute-deviation outlier screen — the robust sibling of
    * a z-score cut: a value is anomalous when its distance from the
    * group MEDIAN exceeds `cutScaled`×MAD (default 3σ-equivalent,
    * 3·1.4826, passed as ONE literal so both engines parse the same
    * double). Unlike mean/stddev screens, a batch of corrupt rows
    * cannot drag the threshold toward itself. Three passes by
    * necessity (median, MAD, flag) — each a group aggregate with the
    * group-cardinality bounds coming back BROADCAST; exact
    * `percentile` swaps for the `approx_percentile` sketch at 100 TB
    * (the q05 rule).
    */
  def madOutliers(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      cutScaled: Double = 4.4478): DataFrame = {
    val v = col(valueCol).cast(DoubleType)
    val med = df.groupBy(col(keyCol))
      .agg(percentile(v, lit(0.5)).as("med"))
    val dev = df.select(col(keyCol), v.as("__v"))
      .join(broadcast(med), Seq(keyCol))
      .withColumn("__ad", abs(col("__v") - col("med")))
    val mad = dev.groupBy(col(keyCol))
      .agg(percentile(col("__ad"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), Seq(keyCol))
      .groupBy(col(keyCol), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__ad") > lit(cutScaled) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col(keyCol), col("n"), col("med"), col("mad"),
        col("n_outliers"),
        (col("n_outliers").cast(DoubleType) / col("n")).as("outlier_frac"))
  }

  /** Declared q132: MAD screen of event values per event type. */
  def q132MadOutliers(spark: SparkSession, d: String): DataFrame =
    madOutliers(Tables.events(spark, d), "event_type", "value")

  val q132Sql: String =
    """WITH m AS (
      |  SELECT event_type, CAST(quantile_cont(value, 0.5) AS DOUBLE) AS med
      |  FROM events GROUP BY 1),
      |d AS (
      |  SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
      |  FROM events e JOIN m USING (event_type)),
      |md AS (
      |  SELECT event_type, CAST(quantile_cont(ad, 0.5) AS DOUBLE) AS mad
      |  FROM d GROUP BY 1)
      |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n, d.med, md.mad,
      |  CAST(sum(CASE WHEN d.ad > 4.4478 * md.mad THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_outliers,
      |  CAST(sum(CASE WHEN d.ad > 4.4478 * md.mad THEN 1 ELSE 0 END)
      |    AS DOUBLE) / count(*) AS outlier_frac
      |FROM d JOIN md USING (event_type)
      |GROUP BY d.event_type, d.med, md.mad""".stripMargin

  /** Poisson(1) inverse CDF as a literal threshold chain — the same
    * decimal strings on both engines, so the parsed doubles (and hence
    * every resampled weight) are bit-identical.
    */
  private val poissonCdf = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712", "0.9999897508033253", "0.999998874797402")

  /** Poisson-bootstrap confidence interval for the per-group mean —
    * THE resampling scheme that survives 100 TB: classic bootstrap
    * resampling needs n draws with replacement per replicate (a
    * shuffle of the corpus per replicate); the Poisson approximation
    * gives every row an independent Poisson(1) weight per replicate,
    * so all `reps` resamples ride ONE pass. Weights are md5-derived
    * from (row id, replicate quad, hash slice) — no RNG state, identical on any engine,
    * partitioning, or retry (the q58 determinism rule). The explode
    * amplifies rows ×`reps` INSIDE the scan pipeline (codegen, never
    * materialized); map-side combine collapses to groups×reps partial
    * sums, so the shuffle moves metadata-scale rows. The interval is
    * the [loQ, hiQ] exact percentile over the replicate means.
    */
  def bootstrapCI(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      idCol: String,
      reps: Int,
      loQ: Double = 0.025,
      hiQ: Double = 0.975): DataFrame = {
    require(reps % 4 == 0, "reps must be a multiple of 4 (four uniforms per md5)")
    // one md5 per (row, replicate QUAD): the four non-overlapping 8-hex
    // slices are independent uniforms (crypto diffusion) at 2⁻³² grain —
    // ample for the Poisson thresholds — so the hash runs reps/4 times,
    // not reps. The hex parse is the codegen [[graft.functions.HexLong]]
    // (DuckDB-pinned semantics): builtin `conv` is an interpreted
    // NumberConverter that was ~half this operator's profile
    val u = graft.functions.GraftFunctions.hexLong(col("__u8"))
      .cast(DoubleType) / lit(4294967296.0)
    val weight = poissonCdf.zipWithIndex.foldRight(
      lit(poissonCdf.length): Column) { case ((t, k), acc) =>
      when(u < lit(t.toDouble), lit(k)).otherwise(acc)
    }.cast(DoubleType)
    val h = md5(concat_ws("|", lit("boot"),
      col(idCol).cast(StringType), col("__quad").cast(StringType)))
    df.select(col(keyCol), col(valueCol).cast(DoubleType).as("__v"),
        col(idCol))
      .withColumn("__quad", explode(sequence(lit(0), lit(reps / 4 - 1))))
      .withColumn("__h", h)
      .select(col(keyCol), col("__v"), col("__quad"),
        posexplode(array(substring(col("__h"), 1, 8),
          substring(col("__h"), 9, 8), substring(col("__h"), 17, 8),
          substring(col("__h"), 25, 8))))
      .withColumnRenamed("pos", "__slice")
      .withColumnRenamed("col", "__u8")
      .withColumn("__rep", col("__quad") * 4 + col("__slice"))
      .withColumn("__w", weight)
      .groupBy(col(keyCol), col("__rep"))
      .agg(sum(col("__w") * col("__v")).as("__ws"),
        sum(col("__w")).as("__ww"))
      .where(col("__ww") > 0.0)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_reps"),
        avg(col("__ws") / col("__ww")).as("boot_mean"),
        percentile(col("__ws") / col("__ww"), lit(loQ)).as("ci_lo"),
        percentile(col("__ws") / col("__ww"), lit(hiQ)).as("ci_hi"))
  }

  /** Declared q133: 20-replicate bootstrap CI of the mean event value
    * per event type.
    */
  def q133BootstrapCI(spark: SparkSession, d: String): DataFrame =
    bootstrapCI(Tables.events(spark, d), "event_type", "value",
      "event_id", reps = 20)

  val q133Sql: String = {
    val chain = poissonCdf.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }
      .mkString(" ")
    s"""WITH x AS (
       |  SELECT e.event_type, CAST(e.value AS DOUBLE) AS v,
       |    ('0x' || substring(md5('boot' || '|' ||
       |        CAST(e.event_id AS VARCHAR) || '|' ||
       |        CAST(p.b AS VARCHAR)), 1 + 8 * h.i, 8))::BIGINT
       |      / 4294967296.0 AS u,
       |    p.b * 4 + h.i AS rep
       |  FROM events e CROSS JOIN range(0, 5) p(b)
       |       CROSS JOIN range(0, 4) h(i)),
       |w AS (
       |  SELECT event_type, rep,
       |    sum(CAST((CASE $chain ELSE 9 END) AS DOUBLE) * v) AS ws,
       |    sum(CAST((CASE $chain ELSE 9 END) AS DOUBLE)) AS ww
       |  FROM x GROUP BY 1, 2),
       |m AS (SELECT event_type, ws / ww AS mean FROM w WHERE ww > 0)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_reps,
       |  avg(mean) AS boot_mean,
       |  CAST(quantile_cont(mean, 0.025) AS DOUBLE) AS ci_lo,
       |  CAST(quantile_cont(mean, 0.975) AS DOUBLE) AS ci_hi
       |FROM m GROUP BY 1""".stripMargin
  }

  /** Declared q115: full profile of the `orders` table. */
  def q115Profile(spark: SparkSession, d: String): DataFrame =
    profileColumns(Tables.orders(spark, d))

  val q115Sql: String = {
    def row(name: String, kind: String): String = {
      val (mnN, mxN, mnS, mxS) = kind match {
        case "num" =>
          (s"CAST(min($name) AS DOUBLE)", s"CAST(max($name) AS DOUBLE)",
            "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        case "ts" =>
          ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
            s"strftime(min($name), '%Y-%m-%d %H:%M:%S')",
            s"strftime(max($name), '%Y-%m-%d %H:%M:%S')")
        case _ =>
          ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
            s"CAST(min($name) AS VARCHAR)", s"CAST(max($name) AS VARCHAR)")
      }
      s"""SELECT '$name' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(count(*) - count($name) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $name) AS BIGINT) AS n_distinct,
         |  $mnN AS min_num, $mxN AS max_num,
         |  $mnS AS min_str, $mxS AS max_str FROM orders""".stripMargin
    }
    Seq(
      row("o_orderkey", "num"), row("o_custkey", "num"),
      row("o_orderstatus", "str"), row("o_totalprice", "num"),
      row("o_orderdate", "ts"), row("o_orderpriority", "str"))
      .mkString("\nUNION ALL\n")
  }

  /** Cohen's kappa — chance-corrected agreement between two binary
    * raters over the same rows: κ = (p_o − p_e) / (1 − p_e). The
    * labeled-data QA primitive: raw percent agreement overstates
    * annotator (or model-vs-heuristic) consistency whenever the label
    * marginals are skewed, and every labeling pipeline reports κ
    * alongside it.
    *
    * Scale shape: one map-side-combined aggregate over the four
    * contingency cells — no shuffle beyond the 1-row reduce, no
    * driver state. All cell counts are exact longs; κ is one
    * deterministic double expression.
    *
    * @return one row: n, n_both_pos, n_both_neg, n_only_a, n_only_b,
    *         p_agree, kappa
    */
  def cohensKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val cells = df.agg(
      count(lit(1)).as("n"),
      sum(when(raterA && raterB, 1L).otherwise(0L)).as("n_both_pos"),
      sum(when(!raterA && !raterB, 1L).otherwise(0L)).as("n_both_neg"),
      sum(when(raterA && !raterB, 1L).otherwise(0L)).as("n_only_a"),
      sum(when(!raterA && raterB, 1L).otherwise(0L)).as("n_only_b"))
    val n = col("n").cast("double")
    val po = (col("n_both_pos") + col("n_both_neg")) / n
    val pe = ((col("n_both_pos") + col("n_only_a")) / n) *
      ((col("n_both_pos") + col("n_only_b")) / n) +
      ((col("n_both_neg") + col("n_only_b")) / n) *
        ((col("n_both_neg") + col("n_only_a")) / n)
    cells.select(col("n"), col("n_both_pos"), col("n_both_neg"),
      col("n_only_a"), col("n_only_b"),
      po.as("p_agree"), ((po - pe) / (lit(1.0) - pe)).as("kappa"))
  }

  /** Declared q147: agreement between two independent document-quality
    * heuristics — rater A passes docs whose unique-token ratio ≥ 0.5
    * (repetition gate), rater B passes docs with ≥ 300 chars (length
    * gate). The two marginals are deliberately unbalanced so κ
    * diverges from raw agreement.
    */
  def q147Kappa(spark: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), " ")
    val a = size(array_distinct(toks)).cast("double") / size(toks) >= 0.5
    val b = col("n_chars") >= 300L
    cohensKappa(Tables.documents(spark, d), a, b)
  }

  /** Spearman rank correlation between two numeric columns — the
    * robust monotone-association profile (outlier-immune, scale-free)
    * a feature-quality sweep wants next to [[correlationMatrix]]'s
    * Pearson. Computed as Pearson over MIDRANKS (average rank across
    * ties), the standard tie-corrected estimator.
    *
    * Scale shape: ONE hash aggregate collapses the table to its joint
    * (x, y) → count support; midranks then branch on the measured
    * support size (inline note below) — peers-inclusive RANGE-frame
    * windows straight over the joint support when it fits one window
    * partition, the per-marginal [[Relational.orderedPrefixSums]]
    * scaffold (range-partitioned, no single-partition window) past the
    * cutoff. One final aggregate emits count-weighted sufficient
    * statistics. The correlation is closed-form from exact-ish double
    * sums — the identical expression runs in the oracle, so the
    * compare never rides on a library's corr() implementation.
    *
    * Measured NON-fix (r7): fusing both scaffold midrank passes into
    * one [[Relational.orderedPrefixSumsBy]] call (marginals union'd
    * with a dim tag, ordered by (dim, value), y's running sum
    * recovered by subtracting n) HALVES the scaffold jobs but benched
    * 2.9 s → 3.7 s at sf0.1 — job-count reduction lost to sorting the
    * full union for both dimensions. The r8 two-window direct path
    * wins the same fight from the other side: fewer jobs AND no
    * support re-aggregation, at the price of one-partition sorts that
    * the size gate confines to supports where they are trivial.
    */
  def spearmanCorrelation(df: DataFrame, xCol: String,
      yCol: String): DataFrame = {
    // ONE pass over the data: the joint (x, y) support. Marginal
    // supports re-aggregate from it, and the sufficient statistics are
    // pair-count-weighted sums over it — raw rows are never ranked or
    // re-scanned (the first cut scanned the table three times and
    // joined ranks onto every raw row; all cost past the joint
    // aggregate is support-sized).
    val joint = df.groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    // Branch on the MEASURED joint-support size (the checkpoint above
    // makes the count a cheap cached-scan job). Small supports take the
    // direct path: both midranks come from RANGE-frame windows over the
    // joint relation itself — sum(n) OVER (ORDER BY v) with the default
    // RANGE frame is peers-INCLUSIVE, so at any row it is the raw-row
    // count of values ≤ v, and midrank = cum − c + (c+1)/2 needs no
    // marginal-support aggregate and no join back (r7's shape paid two
    // support groupBys, two prefix-sum scaffolds with their checkpoint
    // + count probes, and two equi-joins — measured 3.5 s solo at
    // sf0.1 for a ~600 k near-unique-y support vs 1.1 s for this
    // two-window plan; that whole gap was fixed job overhead, not the
    // one-thread sorts). Past the cutoff the per-marginal scaffold
    // returns: supports collapse to DISTINCT values per dimension and
    // rank via [[Relational.orderedPrefixSums]]'s range-partitioned
    // branch — no single-partition window at any size, the 100 TB path.
    val ranked =
      if (joint.count() <= (1L << 22)) {
        def mid(c: String): Column = {
          val cum = sum(col("__n")).over(Window.orderBy(col(c)))
          val cnt = sum(col("__n")).over(Window.partitionBy(col(c)))
          cum - cnt + (cnt + 1) / 2.0
        }
        joint.select(col("__n"), mid(xCol).as(s"__r_$xCol"),
          mid(yCol).as(s"__r_$yCol"))
      } else {
        def midranks(c: String): DataFrame = {
          val sup = joint.groupBy(col(c)).agg(sum(col("__n")).as("__c"))
          Relational.orderedPrefixSums(sup, c, Seq("__k" -> col("__c")))
            .select(col(c),
              (col("__k") - col("__c") + (col("__c") + 1) / 2.0).as(s"__r_$c"))
        }
        joint
          .join(midranks(xCol), Seq(xCol))
          .join(midranks(yCol), Seq(yCol))
      }
    val rx = col(s"__r_$xCol")
    val ry = col(s"__r_$yCol")
    val w = col("__n").cast("double")
    val s = ranked.agg(
      sum(w).as("__n"),
      sum(rx * w).as("__sx"), sum(ry * w).as("__sy"),
      sum(rx * ry * w).as("__sxy"),
      sum(rx * rx * w).as("__sxx"), sum(ry * ry * w).as("__syy"))
    s.select(col("__n").cast("long").as("n"),
      ((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
        sqrt((col("__n") * col("__sxx") - col("__sx") * col("__sx")) *
          (col("__n") * col("__syy") - col("__sy") * col("__sy"))))
        .as("spearman_rho"))
  }

  /** Declared q150: Spearman correlation of lineitem quantity vs
    * extended price — a heavily tied x (50 distinct quantities)
    * against a near-unique y, exercising both midrank regimes.
    */
  def q150Spearman(spark: SparkSession, d: String): DataFrame =
    spearmanCorrelation(
      Tables.lineitem(spark, d).select(
        col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y")),
      "x", "y")

  val q150Sql: String =
    """WITH pts AS (
      |  SELECT CAST(l_quantity AS DOUBLE) AS x,
      |    CAST(l_extendedprice AS DOUBLE) AS y
      |  FROM lineitem),
      |rx AS (SELECT x, count(*) AS c FROM pts GROUP BY 1),
      |rxc AS (
      |  SELECT x, CAST(sum(c) OVER (ORDER BY x) AS DOUBLE) - c
      |    + (c + 1) / 2.0 AS r_x
      |  FROM rx),
      |ry AS (SELECT y, count(*) AS c FROM pts GROUP BY 1),
      |ryc AS (
      |  SELECT y, CAST(sum(c) OVER (ORDER BY y) AS DOUBLE) - c
      |    + (c + 1) / 2.0 AS r_y
      |  FROM ry),
      |j AS (
      |  SELECT r_x, r_y FROM pts
      |  JOIN rxc USING (x) JOIN ryc USING (y)),
      |s AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS n,
      |    sum(r_x) AS sx, sum(r_y) AS sy, sum(r_x * r_y) AS sxy,
      |    sum(r_x * r_x) AS sxx, sum(r_y * r_y) AS syy
      |  FROM j)
      |SELECT CAST(n AS BIGINT) AS n,
      |  (n * sxy - sx * sy)
      |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      |    AS spearman_rho
      |FROM s""".stripMargin

  /** Gini coefficient of a numeric column — the inequality /
    * concentration profile (is 1% of the corpus 90% of the tokens? is
    * revenue concentrated in a handful of orders?). Uses the exact
    * sorted-rank identity `G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n`,
    * which is tie-invariant, so it is computable from the (value →
    * count) support without ever ranking individual rows: a run of
    * `c` equal values `v` ending at cumulative count K contributes
    * `v · (K(K+1) − P(P+1))/2` with P = K − c.
    *
    * Scale shape: one hash aggregate to the support, one
    * [[Relational.orderedPrefixSums]] pass for K (range-partitioned
    * above the small-support cutoff), one 1-row final aggregate.
    */
  def giniCoefficient(df: DataFrame, valueCol: String): DataFrame = {
    val sup = df.groupBy(col(valueCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val k = Relational.orderedPrefixSums(sup, "__v", Seq("__k" -> col("__c")))
    val kk = col("__k")
    val pp = col("__k") - col("__c")
    k.agg(
        max(col("__k_total")).as("__n"),
        sum(col("__v") * col("__c")).as("__sx"),
        sum(col("__v") * (kk * (kk + 1) - pp * (pp + 1)) / 2.0).as("__s1"))
      .select(col("__n").cast("long").as("n"),
        (col("__sx") / col("__n")).as("mean"),
        (lit(2.0) * col("__s1") / (col("__n") * col("__sx")) -
          (col("__n") + 1) / col("__n")).as("gini"))
  }

  /** Declared q151: revenue concentration — Gini of order totalprice. */
  def q151Gini(spark: SparkSession, d: String): DataFrame =
    giniCoefficient(Tables.orders(spark, d), "o_totalprice")

  val q151Sql: String =
    """WITH sup AS (
      |  SELECT CAST(o_totalprice AS DOUBLE) AS v, count(*) AS c
      |  FROM orders GROUP BY 1),
      |k AS (
      |  SELECT v, CAST(c AS DOUBLE) AS c,
      |    CAST(sum(c) OVER (ORDER BY v) AS DOUBLE) AS kk
      |  FROM sup),
      |s AS (
      |  SELECT sum(c) AS n, sum(v * c) AS sx,
      |    sum(v * (kk * (kk + 1) - (kk - c) * (kk - c + 1)) / 2.0) AS s1
      |  FROM k)
      |SELECT CAST(n AS BIGINT) AS n, sx / n AS mean,
      |  2.0 * s1 / (n * sx) - (n + 1) / n AS gini
      |FROM s""".stripMargin

  val q147Sql: String =
    """WITH r AS (
      |  SELECT (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |            / len(string_split(text, ' '))) >= 0.5 AS a,
      |    n_chars >= 300 AS b
      |  FROM documents),
      |cells AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n_both_pos,
      |    sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n_both_neg,
      |    sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n_only_a,
      |    sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n_only_b
      |  FROM r)
      |SELECT CAST(n AS BIGINT) AS n,
      |  CAST(n_both_pos AS BIGINT) AS n_both_pos,
      |  CAST(n_both_neg AS BIGINT) AS n_both_neg,
      |  CAST(n_only_a AS BIGINT) AS n_only_a,
      |  CAST(n_only_b AS BIGINT) AS n_only_b,
      |  (n_both_pos + n_both_neg) / CAST(n AS DOUBLE) AS p_agree,
      |  ((n_both_pos + n_both_neg) / CAST(n AS DOUBLE)
      |     - (((n_both_pos + n_only_a) / CAST(n AS DOUBLE))
      |          * ((n_both_pos + n_only_b) / CAST(n AS DOUBLE))
      |        + ((n_both_neg + n_only_b) / CAST(n AS DOUBLE))
      |          * ((n_both_neg + n_only_a) / CAST(n AS DOUBLE))))
      |  / (1.0 - (((n_both_pos + n_only_a) / CAST(n AS DOUBLE))
      |          * ((n_both_pos + n_only_b) / CAST(n AS DOUBLE))
      |        + ((n_both_neg + n_only_b) / CAST(n AS DOUBLE))
      |          * ((n_both_neg + n_only_a) / CAST(n AS DOUBLE)))) AS kappa
      |FROM cells""".stripMargin

  /** ROC AUC of a numeric score against a boolean label via the
    * rank-sum (Mann–Whitney) identity with midrank ties:
    * AUC = (R₁ − n₁(n₁+1)/2) / (n₁·n₀) — the
    * probability-a-random-positive-outranks-a-random-negative reading
    * of classifier quality, computed exactly without sorting rows.
    *
    * Scale shape: one hash aggregate to the (score → positives, total)
    * support, cumulative counts from [[Relational.orderedPrefixSums]],
    * one 1-row final aggregate — the q123 Mann–Whitney scaffold
    * re-pointed at classifier evaluation.
    */
  def rocAuc(df: DataFrame, scoreCol: String,
      labelCol: Column): DataFrame = {
    val sup = df
      .groupBy(col(scoreCol).cast("double").as("__v"))
      .agg(sum(when(labelCol, 1L).otherwise(0L)).as("__p"),
        count(lit(1)).as("__c"))
    val k = Relational.orderedPrefixSums(sup, "__v", Seq("__k" -> col("__c")))
    val midrank = col("__k") - col("__c") + (col("__c") + 1) / 2.0
    k.agg(
        sum(col("__p")).cast("double").as("__n1"),
        max(col("__k_total")).as("__n"),
        sum(col("__p") * midrank).as("__r1"))
      .select(col("__n1").cast("long").as("n_pos"),
        (col("__n") - col("__n1")).cast("long").as("n_neg"),
        ((col("__r1") - col("__n1") * (col("__n1") + 1) / 2.0) /
          (col("__n1") * (col("__n") - col("__n1")))).as("auc"))
  }

  /** Declared q159: does event value separate purchases from the rest? */
  def q159Auc(spark: SparkSession, d: String): DataFrame =
    rocAuc(Tables.events(spark, d).where(col("value").isNotNull),
      "value", col("event_type") === "purchase")

  val q159Sql: String =
    """WITH e AS (
      |  SELECT CAST(value AS DOUBLE) AS v,
      |    event_type = 'purchase' AS lab
      |  FROM events WHERE value IS NOT NULL),
      |sup AS (
      |  SELECT v, sum(CASE WHEN lab THEN 1 ELSE 0 END) AS p,
      |    count(*) AS c
      |  FROM e GROUP BY 1),
      |k AS (
      |  SELECT v, p, c,
      |    CAST(sum(c) OVER (ORDER BY v) AS DOUBLE) AS kk
      |  FROM sup),
      |s AS (
      |  SELECT CAST(sum(p) AS DOUBLE) AS n1,
      |    CAST((SELECT sum(c) FROM sup) AS DOUBLE) AS n,
      |    sum(p * (kk - c + (c + 1) / 2.0)) AS r1
      |  FROM k)
      |SELECT CAST(n1 AS BIGINT) AS n_pos,
      |  CAST(n - n1 AS BIGINT) AS n_neg,
      |  (r1 - n1 * (n1 + 1) / 2.0) / (n1 * (n - n1)) AS auc
      |FROM s""".stripMargin

  /** Hill estimator of the power-law tail index over the top-k order
    * statistics — α̂ = 1 / mean(ln(x₍ᵢ₎/x₍ₖ₎)) — the heavy-tail
    * health check ([[TextAnalysis.zipfFit]]'s distributional cousin
    * for numeric columns: does revenue/degree/engagement have the
    * fat tail the pipeline assumes).
    *
    * Scale shape: the top-k arrives via `TakeOrderedAndProject`
    * (no global sort; a deterministic tiebreak makes the cut set
    * engine-stable), then one k-row aggregate. k is a constant.
    */
  def hillTailIndex(df: DataFrame, valueCol: String, tieCol: String,
      k: Int): DataFrame = {
    val top = df
      .select(col(valueCol).cast("double").as("__v"), col(tieCol))
      .where(col("__v") > 0)
      .orderBy(col("__v").desc, col(tieCol))
      .limit(k)
    top.agg(count(lit(1)).as("k"), min(col("__v")).as("x_k"),
        avg(log(col("__v"))).as("__ml"))
      .select(col("k"), col("x_k"),
        (lit(1.0) / (col("__ml") - log(col("x_k")))).as("hill_alpha"))
  }

  /** Declared q168: tail index of order revenue, top-1000. */
  def q168HillTail(spark: SparkSession, d: String): DataFrame =
    hillTailIndex(Tables.orders(spark, d), "o_totalprice", "o_orderkey",
      k = 1000)

  val q168Sql: String =
    """WITH top AS (
      |  SELECT CAST(o_totalprice AS DOUBLE) AS v
      |  FROM orders WHERE o_totalprice > 0
      |  ORDER BY v DESC, o_orderkey LIMIT 1000)
      |SELECT CAST(count(*) AS BIGINT) AS k, min(v) AS x_k,
      |  1.0 / (avg(ln(v)) - ln(min(v))) AS hill_alpha
      |FROM top""".stripMargin

  /** Functional-dependency audit — does lhs → rhs hold, and how badly
    * does it fail: the schema-inference / normalization / data-contract
    * check ("is customer → segment stable, is id really a key"). Per
    * candidate pair, one hash aggregate on the lhs with a distinct
    * count of rhs; a key violates when it maps to >1 rhs value.
    *
    * @return per pair: lhs, rhs, n_keys, n_violating_keys,
    *         violation_frac, holds
    */
  def fdAudit(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty)
    pairs.map { case (a, b) =>
      df.groupBy(col(a)).agg(countDistinct(col(b)).as("__nd"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("__nd") > 1, 1L).otherwise(0L))
            .as("n_violating_keys"))
        .select(lit(a).as("lhs"), lit(b).as("rhs"),
          col("n_keys"), col("n_violating_keys"),
          (col("n_violating_keys").cast("double") / col("n_keys"))
            .as("violation_frac"),
          (col("n_violating_keys") === 0).as("holds"))
    }.reduce(_ unionByName _)
  }

  /** Declared q188: key/attribute dependency audit over customer. */
  def q188FdAudit(spark: SparkSession, d: String): DataFrame =
    fdAudit(Tables.customer(spark, d), Seq(
      ("c_custkey", "c_mktsegment"),
      ("c_nationkey", "c_mktsegment"),
      ("c_name", "c_custkey")))

  val q188Sql: String =
    """SELECT 'c_custkey' AS lhs, 'c_mktsegment' AS rhs,
      |  CAST(count(*) AS BIGINT) AS n_keys,
      |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_violating_keys,
      |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*) AS violation_frac,
      |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
      |FROM (SELECT c_custkey, count(DISTINCT c_mktsegment) AS nd
      |      FROM customer GROUP BY 1)
      |UNION ALL
      |SELECT 'c_nationkey', 'c_mktsegment',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*),
      |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
      |FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS nd
      |      FROM customer GROUP BY 1)
      |UNION ALL
      |SELECT 'c_name', 'c_custkey',
      |  CAST(count(*) AS BIGINT),
      |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*),
      |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
      |FROM (SELECT c_name, count(DISTINCT c_custkey) AS nd
      |      FROM customer GROUP BY 1)""".stripMargin

  /** Hill estimator of the upper-tail index — "how heavy is the
    * heavy tail": α̂ = m / Σᵢ₌₁..ₘ ln(x₍ᵢ₎/x₍ₘ₊₁₎) over the top-m
    * order statistics. The document-length / order-value tail
    * profile that decides padding budgets, skew handling, and
    * truncation policy; α ≤ 2 means infinite variance — sampling
    * estimates of means stop converging.
    *
    * Tie-proof formulation: the minimum of the top-(m+1) set IS
    * x₍ₘ₊₁₎ and contributes ln(1) = 0, so the sum runs over all m+1
    * rows — WHICH tied copy the top-k keeps cannot matter (the value
    * multiset is deterministic even when row identity is not).
    *
    * Scale shape: one TakeOrderedAndProject (per-partition top-(m+1)
    * then merge — no global sort, no full shuffle), then m+1-row
    * algebra.
    */
  def hillTailIndex(df: DataFrame, valueCol: String,
      m: Int = 200): DataFrame = {
    require(m >= 1)
    val top = df.select(col(valueCol).cast("double").as("__x"))
      .where(col("__x") > 0)
      .orderBy(col("__x").desc)
      .limit(m + 1)
    val mn = top.agg(min(col("__x")).as("__xmin"))
    top.crossJoin(broadcast(mn))
      .agg(count(lit(1)).as("__k"),
        max(col("__xmin")).as("xmin"),
        sum(log(col("__x") / col("__xmin"))).as("__h"))
      .select(lit(m).cast("long").as("m"), col("xmin"),
        when(col("__h") > 0, round(lit(m).cast("double") / col("__h"), 6))
          .as("tail_index"))
  }

  /** Declared q247: tail index of document lengths (n_chars). */
  def q247HillTail(spark: SparkSession, d: String): DataFrame =
    hillTailIndex(Tables.documents(spark, d), "n_chars", m = 200)

  val q247Sql: String =
    """WITH top AS (
      |  SELECT CAST(n_chars AS DOUBLE) AS x FROM documents
      |  WHERE n_chars > 0 ORDER BY x DESC LIMIT 201),
      |mn AS (SELECT min(x) AS xmin FROM top)
      |SELECT CAST(200 AS BIGINT) AS m, max(mn.xmin) AS xmin,
      |  CASE WHEN sum(ln(x / mn.xmin)) > 0
      |       THEN round(200.0 / sum(ln(x / mn.xmin)), 6) END
      |    AS tail_index
      |FROM top CROSS JOIN mn""".stripMargin

  /** Kendall's τ-b between two DISCRETE columns — the concordance
    * companion to [[q150Spearman]]'s rank correlation: robust to
    * monotone transforms, with the tau-b tie normalization
    * (C − D) / √((n₀−n₁)(n₀−n₂)). Naive τ is O(n²) over ROWS; this
    * collapses to the (x, y) CELL relation first (bounded by the two
    * value domains) and counts pairs over cells — O(cells²) with
    * integer arithmetic that stays exact until the final division, so
    * 100 TB of rows cost one hash aggregate plus a broadcast
    * self-join of a few hundred cells.
    *
    * @return one row: n_obs, n0 (all pairs), ties_x, ties_y,
    *         concordant, discordant, tau_b (6 dp)
    */
  def kendallTauB(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .groupBy(col(xCol).cast(LongType).as("__x"),
        col(yCol).cast(LongType).as("__y"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val b = cells.select(col("__x").as("__x2"), col("__y").as("__y2"),
      col("__c").as("__c2"))
    val pairs = cells.crossJoin(broadcast(b))
    val cd = pairs.agg(
      coalesce(sum(when(col("__x") < col("__x2") && col("__y") < col("__y2"),
        col("__c") * col("__c2"))), lit(0L)).as("concordant"),
      coalesce(sum(when(col("__x") < col("__x2") && col("__y") > col("__y2"),
        col("__c") * col("__c2"))), lit(0L)).as("discordant"))
    val margins = cells.agg(
      sum(col("__c")).as("__n"),
      sum(col("__c") * (col("__c") - 1)).as("__txy2"))
    val tx = cells.groupBy(col("__x")).agg(sum(col("__c")).as("__t"))
      .agg(sum(col("__t") * (col("__t") - 1)).as("__tx2"))
    val ty = cells.groupBy(col("__y")).agg(sum(col("__c")).as("__t"))
      .agg(sum(col("__t") * (col("__t") - 1)).as("__ty2"))
    val n0 = col("__n") * (col("__n") - 1) / 2
    cd.crossJoin(broadcast(margins)).crossJoin(broadcast(tx))
      .crossJoin(broadcast(ty))
      .select(col("__n").as("n_obs"), n0.cast(LongType).as("n0"),
        (col("__tx2") / 2).cast(LongType).as("ties_x"),
        (col("__ty2") / 2).cast(LongType).as("ties_y"),
        col("concordant"), col("discordant"),
        round((col("concordant") - col("discordant")).cast(DoubleType) /
          sqrt((n0 - col("__tx2") / 2).cast(DoubleType) *
            (n0 - col("__ty2") / 2).cast(DoubleType)), 6).as("tau_b"))
  }

  /** Declared q260: quantity/linenumber concordance over lineitem. */
  def q260KendallTau(spark: SparkSession, d: String): DataFrame =
    kendallTauB(Tables.lineitem(spark, d), "l_quantity", "l_linenumber")

  val q260Sql: String =
    """WITH cells AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(l_linenumber AS BIGINT) AS y, count(*) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cd AS (
      |  SELECT
      |    coalesce(sum(CASE WHEN a.x < b.x AND a.y < b.y
      |      THEN a.c * b.c END), 0) AS concordant,
      |    coalesce(sum(CASE WHEN a.x < b.x AND a.y > b.y
      |      THEN a.c * b.c END), 0) AS discordant
      |  FROM cells a CROSS JOIN cells b),
      |m AS (SELECT sum(c) AS n FROM cells),
      |tx AS (
      |  SELECT sum(t * (t - 1)) AS tx2
      |  FROM (SELECT sum(c) AS t FROM cells GROUP BY x)),
      |ty AS (
      |  SELECT sum(t * (t - 1)) AS ty2
      |  FROM (SELECT sum(c) AS t FROM cells GROUP BY y))
      |SELECT CAST(n AS BIGINT) AS n_obs,
      |  CAST(n * (n - 1) / 2 AS BIGINT) AS n0,
      |  CAST(tx2 / 2 AS BIGINT) AS ties_x,
      |  CAST(ty2 / 2 AS BIGINT) AS ties_y,
      |  CAST(concordant AS BIGINT) AS concordant,
      |  CAST(discordant AS BIGINT) AS discordant,
      |  round(CAST(concordant - discordant AS DOUBLE) /
      |    sqrt(CAST(n * (n - 1) / 2 - tx2 / 2 AS DOUBLE) *
      |      CAST(n * (n - 1) / 2 - ty2 / 2 AS DOUBLE)), 6) AS tau_b
      |FROM cd CROSS JOIN m CROSS JOIN tx CROSS JOIN ty""".stripMargin

  /** Approximate quantiles from the deterministic bottom-k sampling
    * sketch ([[graft.functions.BottomKAgg]]) — the mergeable,
    * ONE-PASS, fixed-memory alternative to an exact sort when a 100 TB
    * column needs percentile estimates: keep the k rows whose
    * md5-derived hash key is smallest (a uniform sample that is a pure
    * set function of the data — no RNG, no arrival-order dependence),
    * read quantile q as sample element ⌈q·n⌉. Rank error is the
    * uniform-sample O(1/√k); unlike `percentile_approx`'s GK sketch,
    * the sample — and therefore every estimate — is bit-reproducible
    * across engines, partitionings, and merge orders, which is what
    * lets the DuckDB oracle replay it EXACTLY (`ORDER BY hk, v
    * LIMIT k`).
    *
    * Scale shape: one aggregate with a k-bounded object buffer per
    * partial (ObjectHashAggregate, live buffers); the shuffle carries
    * one k-row heap per map task, never the column.
    */
  def bottomKQuantiles(df: DataFrame, rowKey: Column, value: Column,
      k: Int, quantiles: Seq[Double]): DataFrame = {
    val hk = graft.functions.GraftFunctions.hexLong(
      substring(md5(rowKey), 1, 15))
    df.select(hk.as("__hk"), value.cast("double").as("__v"))
      .agg(graft.functions.BottomKAgg.of(k)(
        col("__hk"), col("__v")).as("__s"))
      .select(explode(typedLit(quantiles)).as("q"), col("__s"))
      .select(col("q"),
        size(col("__s")).cast("long").as("n_sample"),
        element_at(col("__s"),
          greatest(ceil(col("q") * size(col("__s"))).cast("int"), lit(1)))
          .as("estimate"))
  }

  /** Declared q267: extended-price quantiles from a 1024-row bottom-k
    * hash sample of lineitem (~600 k rows at sf0.1).
    */
  def q267SampleQuantiles(spark: SparkSession, d: String): DataFrame =
    bottomKQuantiles(
      Tables.lineitem(spark, d),
      concat_ws("|", col("l_orderkey"), col("l_linenumber")),
      col("l_extendedprice"),
      k = 1024,
      quantiles = Seq(0.25, 0.5, 0.75, 0.9, 0.99))

  val q267Sql: String =
    """WITH h AS (
      |  SELECT ('0x' || substring(md5(
      |      CAST(l_orderkey AS VARCHAR) || '|' ||
      |      CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS hk,
      |    CAST(l_extendedprice AS DOUBLE) AS v
      |  FROM lineitem),
      |s AS (SELECT hk, v FROM h ORDER BY hk, v LIMIT 1024),
      |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rn,
      |        count(*) OVER () AS n
      |      FROM s),
      |qs AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS q)
      |SELECT q,
      |  (SELECT CAST(max(n) AS BIGINT) FROM r) AS n_sample,
      |  (SELECT v FROM r
      |   WHERE rn = greatest(CAST(ceil(q * (SELECT max(n) FROM r)) AS INT), 1))
      |    AS estimate
      |FROM qs""".stripMargin

  /** PORTABLE HyperLogLog (Flajolet et al. 2007) — distinct-count
    * sketching whose registers are a pure function of the data: the
    * hash is the engine's md5-derived 60-bit uniform ([[graft
    * .functions.HexLong]] scheme), bucket = low `b` bits, register =
    * max leading-zero rank of the remaining bits (computed by exact
    * INTEGER string math — `53 − length(bin(w))` — never a float
    * log). Unlike `approx_count_distinct`'s opaque HLL++ state (q05
    * can only band-gate it), every register — and therefore the
    * estimate, bias correction included — replays bit-for-bit in the
    * DuckDB oracle, completing the oracle-pinned sketch family
    * (q185 CMS counts, q186 Bloom membership, here HLL cardinality).
    *
    * Scale shape: one (group, bucket) aggregate — 2^b registers per
    * group regardless of input size, mergeable by max, the classic
    * sketch contract; the exact count rides along as the audit column
    * (production would drop it — documented).
    *
    * @return per group: n_exact, hll_estimate (6 dp), hll_within_band
    *         (relative error ≤ 0.15 ≈ 2.3σ at b=8)
    */
  def portableHllDistinct(df: DataFrame, groupCol: String,
      valueCol: Column, b: Int = 8): DataFrame = {
    require(b >= 4 && b <= 16)
    val m = 1 << b
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val rel = df.select(col(groupCol).as("__g"), valueCol.as("__v"))
      .localCheckpoint() // feeds registers AND the exact audit
    val h = graft.functions.GraftFunctions.hexLong(
      substring(md5(col("__v")), 1, 15))
    val w = shiftright(h, b)
    val regs = rel
      .select(col("__g"), h.bitwiseAND(lit((m - 1).toLong)).as("__bucket"),
        when(w === 0L, lit(61 - b)).otherwise(
          lit(61 - b) - length(bin(w))).as("__r"))
      .groupBy(col("__g"), col("__bucket"))
      .agg(max(col("__r")).as("__r"))
    val est = regs.groupBy(col("__g"))
      .agg(count(lit(1)).as("__present"),
        sum(expr("1.0 / shiftleft(CAST(1 AS BIGINT), __r)")).as("__sp"))
      .select(col("__g"),
        (lit(alpha * m.toDouble * m) /
          (col("__sp") + (lit(m) - col("__present")))).as("__e"),
        (lit(m) - col("__present")).cast("double").as("__zeros"))
      .select(col("__g"),
        when(col("__e") <= lit(2.5 * m) && col("__zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__zeros")))
          .otherwise(col("__e")).as("__raw"))
    val exact = rel.groupBy(col("__g"))
      .agg(countDistinct(col("__v")).as("n_exact"))
    exact.join(est, Seq("__g"))
      .select(col("__g").as(groupCol), col("n_exact"),
        round(col("__raw"), 6).as("hll_estimate"),
        (abs(col("__raw") - col("n_exact")) / col("n_exact") <= 0.15)
          .as("hll_within_band"))
  }

  /** Declared q271: per-source distinct-token cardinality via the
    * portable 256-register HLL, with the exact audit column.
    */
  def q271PortableHll(spark: SparkSession, d: String): DataFrame =
    portableHllDistinct(
      Tables.documents(spark, d)
        .select(col("source"), explode(split(col("text"), " ")).as("token")),
      "source", col("token"))

  val q271Sql: String = {
    val m = 256
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    s"""WITH tok AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS t
       |  FROM documents),
       |h AS (
       |  SELECT source, t,
       |    ('0x' || substring(md5(t), 1, 15))::BIGINT AS h
       |  FROM tok),
       |r AS (
       |  SELECT source, h & 255 AS bucket,
       |    CASE WHEN (h >> 8) = 0 THEN 53
       |         ELSE 53 - length(bin(h >> 8)) END AS rank
       |  FROM h),
       |reg AS (
       |  SELECT source, bucket, max(rank) AS r FROM r GROUP BY 1, 2),
       |est AS (
       |  SELECT source,
       |    ${alpha * m.toDouble * m} /
       |      (sum(1.0 / (CAST(1 AS BIGINT) << r)) + (256 - count(*))) AS e,
       |    CAST(256 - count(*) AS DOUBLE) AS zeros
       |  FROM reg GROUP BY 1),
       |raw AS (
       |  SELECT source,
       |    CASE WHEN e <= ${2.5 * m} AND zeros > 0
       |         THEN 256.0 * ln(256.0 / zeros) ELSE e END AS raw
       |  FROM est),
       |ex AS (
       |  SELECT source, count(DISTINCT t) AS n_exact FROM tok GROUP BY 1)
       |SELECT ex.source, CAST(n_exact AS BIGINT) AS n_exact,
       |  round(raw, 6) AS hll_estimate,
       |  (abs(raw - n_exact) / n_exact <= 0.15) AS hll_within_band
       |FROM ex JOIN raw ON raw.source = ex.source""".stripMargin
  }
}
