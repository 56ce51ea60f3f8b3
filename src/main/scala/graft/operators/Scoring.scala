package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.Tables

/** Risk/rate scoring primitives — the feature-engineering and
  * decision-support layer between raw aggregates and a model: weight of
  * evidence + information value (the credit-scoring screen for "does this
  * categorical feature separate the target at all"), empirical-Bayes
  * beta-binomial shrinkage (per-entity rates that don't explode on small
  * n — the canonical fix for ranking users/items by a ratio), and a
  * Bayesian A/B posterior (the decision readout a z-score ([[Relational
  * .twoProportionZ]]) can't give: the PROBABILITY the variant is better).
  *
  * Scale shapes: WoE and EB shrinkage are one or two hash aggregates over
  * the fact table plus metadata-scale algebra; the Bayesian posterior is
  * computed on a fixed quadrature GRID (2 001 rows) after the facts
  * collapse to four counts — the grid window is metadata-scale by
  * construction, never data-sized.
  */
object Scoring {

  /** Weight of evidence per feature bin + the feature's information
    * value: WoE_b = ln((good_b/goods)/(bad_b/bads)), IV = Σ (g% − b%)
    * · WoE. Bins where either class is empty get NULL WoE and
    * contribute 0 to IV (the standard degenerate-bin guard; binning
    * should avoid them).
    *
    * One hash aggregate to per-bin (goods, bads); totals ride a
    * broadcast scalar row.
    *
    * @return per bin: bin, n, goods, bads, woe, iv (iv repeated —
    *         it is a feature-level scalar)
    */
  def woeIv(df: DataFrame, binCol: String, target: org.apache.spark.sql.Column): DataFrame = {
    val bins = df
      .groupBy(col(binCol).as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(target, 1L).otherwise(0L)).as("goods"),
        sum(when(target, 0L).otherwise(1L)).as("bads"))
      .localCheckpoint()
    val tot = bins.agg(sum(col("goods")).cast(DoubleType).as("__g"),
      sum(col("bads")).cast(DoubleType).as("__b"))
    val gShare = col("goods") / col("__g")
    val bShare = col("bads") / col("__b")
    val woe = when(col("goods") > 0 && col("bads") > 0,
      log(gShare / bShare))
    val withWoe = bins.crossJoin(broadcast(tot))
      .withColumn("__woe", woe)
      .withColumn("__ivterm",
        coalesce((gShare - bShare) * col("__woe"), lit(0.0)))
    val iv = withWoe.agg(sum(col("__ivterm")).as("__iv"))
    withWoe.crossJoin(broadcast(iv))
      .select(col("bin"), col("n"), col("goods"), col("bads"),
        round(col("__woe"), 6).as("woe"),
        round(col("__iv"), 6).as("iv"))
  }

  /** Declared q253: does quantity separate returned lineitems? */
  def q253WoeIv(spark: SparkSession, d: String): DataFrame =
    woeIv(Tables.lineitem(spark, d), "l_quantity",
      col("l_returnflag") === "R")

  val q253Sql: String =
    """WITH bins AS (
      |  SELECT l_quantity AS bin, count(*) AS n,
      |    sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS goods,
      |    sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END) AS bads
      |  FROM lineitem GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(goods) AS DOUBLE) AS g,
      |    CAST(sum(bads) AS DOUBLE) AS b
      |  FROM bins),
      |w AS (
      |  SELECT bin, n, goods, bads,
      |    CASE WHEN goods > 0 AND bads > 0
      |      THEN ln((goods / g) / (bads / b)) END AS woe,
      |    coalesce((goods / g - bads / b) *
      |      CASE WHEN goods > 0 AND bads > 0
      |        THEN ln((goods / g) / (bads / b)) END, 0.0) AS ivterm
      |  FROM bins CROSS JOIN t)
      |SELECT bin, CAST(n AS BIGINT) AS n, CAST(goods AS BIGINT) AS goods,
      |  CAST(bads AS BIGINT) AS bads, round(woe, 6) AS woe,
      |  round((SELECT sum(ivterm) FROM w), 6) AS iv
      |FROM w""".stripMargin

  /** Empirical-Bayes beta-binomial shrinkage — per-entity success
    * rates k/n pulled toward the population prior Beta(α, β) fitted by
    * method of moments on the raw rates: shrunk = (k+α)/(n+α+β).
    * Small-n entities collapse to the prior mean; large-n entities
    * keep their observed rate — exactly the behavior naive rate
    * ranking lacks.
    *
    * Two hash aggregates (per-entity counts, then the two moments) and
    * a broadcast of the two fitted scalars back over the entities.
    *
    * @return per entity: entity, n, k, rate, eb_rate (6 dp), plus the
    *         fitted prior (alpha, beta — repeated scalars)
    */
  def ebShrinkage(df: DataFrame, entityCol: String,
      success: org.apache.spark.sql.Column): DataFrame = {
    val per = df.groupBy(col(entityCol).as("entity"))
      .agg(count(lit(1)).as("n"),
        sum(when(success, 1L).otherwise(0L)).as("k"))
      .withColumn("__r", col("k").cast(DoubleType) / col("n"))
      .localCheckpoint()
    // method of moments on the raw rates: v uses the sample variance
    // in its explicit (Σr² − (Σr)²/m)/(m−1) form so both engines share
    // one floating-point story
    val mom = per.agg(count(lit(1)).cast(DoubleType).as("__m"),
        sum(col("__r")).as("__sr"), sum(col("__r") * col("__r")).as("__srr"))
      .select(
        (col("__sr") / col("__m")).as("__mean"),
        ((col("__srr") - col("__sr") * col("__sr") / col("__m")) /
          (col("__m") - 1.0)).as("__var"))
      .select(col("__mean"), col("__var"),
        (col("__mean") * (lit(1.0) - col("__mean")) / col("__var") - 1.0)
          .as("__s"))
      .select((col("__mean") * col("__s")).as("__alpha"),
        ((lit(1.0) - col("__mean")) * col("__s")).as("__beta"))
    per.crossJoin(broadcast(mom))
      .select(col("entity"), col("n"), col("k"),
        round(col("__r"), 6).as("rate"),
        round((col("k").cast(DoubleType) + col("__alpha")) /
          (col("n").cast(DoubleType) + col("__alpha") + col("__beta")), 6)
          .as("eb_rate"),
        round(col("__alpha"), 6).as("alpha"),
        round(col("__beta"), 6).as("beta"))
  }

  /** Declared q254: per-user purchase rate, shrunk. */
  def q254EbShrinkage(spark: SparkSession, d: String): DataFrame =
    ebShrinkage(Tables.events(spark, d), "user_id",
      col("event_type") === "purchase")

  val q254Sql: String =
    """WITH per AS (
      |  SELECT user_id AS entity, count(*) AS n,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k
      |  FROM events GROUP BY 1),
      |r AS (SELECT entity, n, k, CAST(k AS DOUBLE) / n AS r FROM per),
      |mom AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS m, sum(r) AS sr,
      |    sum(r * r) AS srr
      |  FROM r),
      |prior AS (
      |  SELECT mu * sc AS alpha, (1.0 - mu) * sc AS beta
      |  FROM (
      |    SELECT mu, (mu * (1.0 - mu) / vr - 1.0) AS sc
      |    FROM (
      |      SELECT sr / m AS mu,
      |        (srr - sr * sr / m) / (m - 1.0) AS vr
      |      FROM mom)))
      |SELECT entity, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
      |  round(r, 6) AS rate,
      |  round((k + alpha) / (n + alpha + beta), 6) AS eb_rate,
      |  round(alpha, 6) AS alpha, round(beta, 6) AS beta
      |FROM r CROSS JOIN prior""".stripMargin

  /** Bayesian A/B posterior — Beta(1+k, 1+n−k) per arm, P(p_B > p_A)
    * by midpoint quadrature on a fixed 2 001-point grid. Weights are
    * computed in LOG space and normalized per arm after subtracting
    * the arm's max log-weight, so thousand-count posteriors never
    * underflow — and the identical expression runs on both engines.
    *
    * The facts collapse to four counts before the grid exists; the
    * grid window (cumulative A mass) is over 2 001 rows — metadata
    * scale, deliberately NOT a data-sized single-partition window.
    *
    * @return one row: n_a, k_a, n_b, k_b, post_mean_a, post_mean_b,
    *         prob_b_gt_a (6 dp)
    */
  def bayesianAb(users: DataFrame, variantCol: String, convCol: String,
      gridPoints: Int = 2001): DataFrame = {
    val arms = users
      .groupBy(col(variantCol).as("__v"))
      .agg(count(lit(1)).cast(DoubleType).as("n"),
        sum(col(convCol)).cast(DoubleType).as("k"))
    val w = Window.partitionBy(lit(1)).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val counts = arms
      .withColumn("__na", first(when(col("__v") === 0L, col("n")), ignoreNulls = true).over(w))
      .withColumn("__ka", first(when(col("__v") === 0L, col("k")), ignoreNulls = true).over(w))
      .withColumn("__nb", first(when(col("__v") === 1L, col("n")), ignoreNulls = true).over(w))
      .withColumn("__kb", first(when(col("__v") === 1L, col("k")), ignoreNulls = true).over(w))
      .where(col("__v") === 0L)
      .select(col("__na"), col("__ka"), col("__nb"), col("__kb"))
    val grid = counts
      .select(col("__na"), col("__ka"), col("__nb"), col("__kb"),
        explode(sequence(lit(1), lit(gridPoints))).as("__j"))
      .withColumn("__x", (col("__j").cast(DoubleType) - 0.5) / gridPoints)
      .withColumn("__lwa",
        col("__ka") * log(col("__x")) +
          (col("__na") - col("__ka")) * log(lit(1.0) - col("__x")))
      .withColumn("__lwb",
        col("__kb") * log(col("__x")) +
          (col("__nb") - col("__kb")) * log(lit(1.0) - col("__x")))
    val norm = grid
      .withColumn("__wa", exp(col("__lwa") - max(col("__lwa")).over(w)))
      .withColumn("__wb", exp(col("__lwb") - max(col("__lwb")).over(w)))
      .withColumn("__pa", col("__wa") / sum(col("__wa")).over(w))
      .withColumn("__pb", col("__wb") / sum(col("__wb")).over(w))
    val cum = Window.partitionBy(lit(1)).orderBy(col("__j"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    norm
      .withColumn("__cuma", sum(col("__pa")).over(cum) - col("__pa"))
      .agg(
        max(col("__na")).cast("long").as("n_a"),
        max(col("__ka")).cast("long").as("k_a"),
        max(col("__nb")).cast("long").as("n_b"),
        max(col("__kb")).cast("long").as("k_b"),
        round((max(col("__ka")) + 1.0) / (max(col("__na")) + 2.0), 6)
          .as("post_mean_a"),
        round((max(col("__kb")) + 1.0) / (max(col("__nb")) + 2.0), 6)
          .as("post_mean_b"),
        round(sum(col("__pb") * (col("__cuma") + lit(0.5) * col("__pa"))), 6)
          .as("prob_b_gt_a"))
  }

  /** Declared q255: the q124 heavy-purchaser A/B, as a posterior. */
  def q255BayesAb(spark: SparkSession, d: String): DataFrame = {
    val users = Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("np"))
      .select(pmod(col("user_id"), lit(2L)).as("variant"),
        when(col("np") >= 14L, 1L).otherwise(0L).as("conv"))
    bayesianAb(users, "variant", "conv")
  }

  val q255Sql: String =
    """WITH pc AS (
      |  SELECT user_id,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
      |  FROM events GROUP BY user_id),
      |u AS (
      |  SELECT user_id % 2 AS variant,
      |    CASE WHEN np >= 14 THEN 1 ELSE 0 END AS conv
      |  FROM pc),
      |c AS (
      |  SELECT
      |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS na,
      |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS DOUBLE) AS ka,
      |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
      |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS DOUBLE) AS kb
      |  FROM u),
      |grid AS (
      |  SELECT na, ka, nb, kb, j,
      |    (CAST(j AS DOUBLE) - 0.5) / 2001 AS x
      |  FROM c CROSS JOIN generate_series(1, 2001) AS g(j)),
      |lw AS (
      |  SELECT j, na, ka, nb, kb,
      |    ka * ln(x) + (na - ka) * ln(1.0 - x) AS lwa,
      |    kb * ln(x) + (nb - kb) * ln(1.0 - x) AS lwb
      |  FROM grid),
      |nm AS (
      |  SELECT j, na, ka, nb, kb,
      |    exp(lwa - max(lwa) OVER ()) AS wa,
      |    exp(lwb - max(lwb) OVER ()) AS wb
      |  FROM lw),
      |p AS (
      |  SELECT j, na, ka, nb, kb,
      |    wa / sum(wa) OVER () AS pa, wb / sum(wb) OVER () AS pb
      |  FROM nm),
      |cm AS (
      |  SELECT na, ka, nb, kb, pa, pb,
      |    sum(pa) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING) - pa AS cuma
      |  FROM p)
      |SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(ka) AS BIGINT) AS k_a,
      |  CAST(max(nb) AS BIGINT) AS n_b, CAST(max(kb) AS BIGINT) AS k_b,
      |  round((max(ka) + 1.0) / (max(na) + 2.0), 6) AS post_mean_a,
      |  round((max(kb) + 1.0) / (max(nb) + 2.0), 6) AS post_mean_b,
      |  round(sum(pb * (cuma + 0.5 * pa)), 6) AS prob_b_gt_a
      |FROM cm""".stripMargin

  /** Isotonic (PAV) calibration of a binary label against a binned
    * score — the non-parametric monotone fit behind isotonic
    * probability calibration (Zadrozny & Elkan '02): pool adjacent
    * violators until the bin means are non-decreasing. The q227 ECE
    * measures miscalibration; this REPAIRS it.
    *
    * Scale shape: the fact table collapses to a (bin → n, k) support
    * in one hash aggregate — the support is bounded by the BIN domain
    * (constant, e.g. ≤ a few hundred), so the sequential PAV pooling
    * runs on that metadata-scale relation driver-side with EXACT
    * integer block sums (merge comparisons are cross-multiplied longs,
    * no float drift); the fitted rate divides once at the end. This is
    * the same shape Spark MLlib's IsotonicRegression uses for its
    * final merge, minus its per-partition pre-pass (unneeded: the
    * support is already bounded).
    *
    * @return per bin: bin, n, k, rate_raw, rate_iso (6 dp)
    */
  def isotonicCalibrate(df: DataFrame, bin: org.apache.spark.sql.Column,
      label: org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    val sup = df.groupBy(bin.cast("long").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(label, 1L).otherwise(0L)).as("k"))
      .orderBy(col("bin"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // PAV with a block stack; (bins, n, k) per block, exact longs
    final case class Block(bins: List[Long], n: Long, k: Long)
    val blocks = sup.foldLeft(List.empty[Block]) { case (acc, (b, n, k)) =>
      var st = Block(List(b), n, k) :: acc
      // pool while the previous block's mean >= the new block's mean
      // (k1/n1 >= k2/n2  <=>  k1*n2 >= k2*n1 — integral, exact)
      while (st.tail.nonEmpty &&
          st.tail.head.k * st.head.n >= st.head.k * st.tail.head.n) {
        val merged = Block(st.head.bins ++ st.tail.head.bins,
          st.head.n + st.tail.head.n, st.head.k + st.tail.head.k)
        st = merged :: st.tail.tail
      }
      st
    }
    val perBinFit = blocks.flatMap(bl =>
      bl.bins.map(b => b -> (bl.k.toDouble / bl.n))).toMap
    import spark.implicits._
    sup.toSeq.map { case (b, n, k) =>
      (b, n, k,
        BigDecimal(k.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(perBinFit(b)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("bin", "n", "k", "rate_raw", "rate_iso")
  }

  /** Declared q259: purchase rate vs value-bin, repaired monotone. */
  def q259Isotonic(spark: SparkSession, d: String): DataFrame =
    isotonicCalibrate(Tables.events(spark, d),
      floor(col("value") / 20.0),
      col("event_type") === "purchase")

  /** Oracle via the minimax characterization of the isotonic fit:
    * fitted(i) = max_{j ≤ i} min_{k ≥ i} mean(y over bins j..k) —
    * mathematically identical to PAV, and every candidate mean is one
    * division of exact integer prefix sums, so both engines agree to
    * the ulp.
    */
  val q259Sql: String =
    """WITH sup AS (
      |  SELECT CAST(floor(value / 20.0) AS BIGINT) AS bin,
      |    count(*) AS n,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k
      |  FROM events GROUP BY 1),
      |cum AS (
      |  SELECT bin, n, k,
      |    sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cn,
      |    sum(k) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS ck
      |  FROM sup),
      |pairs AS (
      |  SELECT j.bin AS jb, kk.bin AS kb,
      |    CAST(kk.ck - (j.ck - j.k) AS DOUBLE)
      |      / CAST(kk.cn - (j.cn - j.n) AS DOUBLE) AS a
      |  FROM cum j JOIN cum kk ON j.bin <= kk.bin),
      |minimax AS (
      |  SELECT i.bin,
      |    max(inner_min.mn) AS fit
      |  FROM sup i JOIN (
      |    SELECT p.jb, ii.bin AS ib, min(p.a) AS mn
      |    FROM sup ii JOIN pairs p ON p.jb <= ii.bin AND p.kb >= ii.bin
      |    GROUP BY 1, 2) inner_min
      |    ON inner_min.ib = i.bin AND inner_min.jb <= i.bin
      |  GROUP BY 1)
      |SELECT s.bin, s.n, CAST(s.k AS BIGINT) AS k,
      |  round(CAST(s.k AS DOUBLE) / s.n, 6) AS rate_raw,
      |  round(m.fit, 6) AS rate_iso
      |FROM sup s JOIN minimax m ON m.bin = s.bin""".stripMargin

  /** Iterative proportional fitting (raking) — adjust cell weights of
    * a two-way table so both margins match TARGET totals (survey
    * reweighting, panel balancing). Three fixed row-then-column
    * iterations (deterministic; IPF's geometric convergence makes
    * more a no-op at this table size), uniform targets.
    *
    * Scale shape: the fact table collapses to the (row, col) cell
    * relation in one hash aggregate; each adjustment is a
    * metadata-scale window over cells (bounded by the two category
    * domains). Never touches rows again.
    *
    * @return per cell: rowCol, colCol, n, w_raked (6 dp)
    */
  def ipfRake(df: DataFrame, rowCol: String, colCol: String,
      iterations: Int = 3): DataFrame = {
    val w = Window.partitionBy(lit(1)).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val wr = Window.partitionBy(col("__r"))
    val wc = Window.partitionBy(col("__c"))
    var cells = df
      .groupBy(col(rowCol).as("__r"), col(colCol).as("__c"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot", sum(col("n")).over(w))
      .withColumn("__tr", col("__tot").cast("double") /
        size(collect_set(col("__r")).over(w)))
      .withColumn("__tc", col("__tot").cast("double") /
        size(collect_set(col("__c")).over(w)))
      .withColumn("__w", col("n").cast("double"))
    for (_ <- 1 to iterations) {
      cells = cells
        .withColumn("__w", col("__w") * col("__tr") / sum(col("__w")).over(wr))
      cells = cells
        .withColumn("__w", col("__w") * col("__tc") / sum(col("__w")).over(wc))
    }
    cells.select(col("__r").as(rowCol), col("__c").as(colCol),
      col("n"), round(col("__w"), 6).as("w_raked"))
  }

  /** Declared q261: rake customers to uniform nation/segment margins. */
  def q261IpfRake(spark: SparkSession, d: String): DataFrame =
    ipfRake(Tables.customer(spark, d), "c_nationkey", "c_mktsegment")

  val q261Sql: String =
    """WITH cells AS (
      |  SELECT c_nationkey AS r, c_mktsegment AS c, count(*) AS n
      |  FROM customer GROUP BY 1, 2),
      |t AS (
      |  SELECT CAST(sum(n) AS DOUBLE) / count(DISTINCT r) AS tr,
      |    CAST(sum(n) AS DOUBLE) / count(DISTINCT c) AS tc
      |  FROM cells),
      |w0 AS (SELECT r, c, n, CAST(n AS DOUBLE) AS w FROM cells),
      |r1 AS (
      |  SELECT r, c, n, w * tr / sum(w) OVER (PARTITION BY r) AS w
      |  FROM w0 CROSS JOIN t),
      |c1 AS (
      |  SELECT r, c, n, w * tc / sum(w) OVER (PARTITION BY c) AS w
      |  FROM r1 CROSS JOIN t),
      |r2 AS (
      |  SELECT r, c, n, w * tr / sum(w) OVER (PARTITION BY r) AS w
      |  FROM c1 CROSS JOIN t),
      |c2 AS (
      |  SELECT r, c, n, w * tc / sum(w) OVER (PARTITION BY c) AS w
      |  FROM r2 CROSS JOIN t),
      |r3 AS (
      |  SELECT r, c, n, w * tr / sum(w) OVER (PARTITION BY r) AS w
      |  FROM c2 CROSS JOIN t),
      |c3 AS (
      |  SELECT r, c, n, w * tc / sum(w) OVER (PARTITION BY c) AS w
      |  FROM r3 CROSS JOIN t)
      |SELECT r AS c_nationkey, c AS c_mktsegment, n,
      |  round(w, 6) AS w_raked
      |FROM c3""".stripMargin
}
