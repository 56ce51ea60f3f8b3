package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Label and preference aggregation — the operators an RLHF /
  * supervised-data pipeline runs between raw annotations and a
  * training set: many noisy votes per item → one label with a
  * quality-weighted consensus, and many pairwise preferences → one
  * scalar strength per option. Reference scope: outside the reference
  * repo's surface (SURVEY.md §2.E); part of the mandated LLM-pipeline
  * extension set.
  *
  * Determinism discipline: every aggregation input is an integer
  * count, every tie-break is pinned (min label / min id), every
  * fractional output rounds to 6 dp — the [[TimeSeries]] convention.
  *
  * Scale shape shared by both: ONE pass over the raw fact table
  * collapses to a votes/comparisons relation keyed by (item, worker)
  * or (option, option); everything after is label-domain- or
  * option-domain-bounded algebra (the annotator pool and label space
  * are small even when the item set is 100 TB-scale, and the item-
  * keyed steps are plain hash aggregates).
  */
object Labeling {

  /** One round of accuracy-weighted label aggregation — majority vote
    * bootstraps per-worker accuracy, then each worker's vote is
    * re-weighted by the log-odds of that accuracy (the first EM
    * half-step of Dawid–Skene 1979, the classic crowd-labeling
    * model; one PINNED round keeps the oracle expressible and is the
    * standard "weighted majority" production compromise).
    *
    *   1. majority label per item (tie → lexicographic min);
    *   2. worker accuracy = fraction of their votes agreeing with the
    *      majority, clamped to [0.05, 0.95] so log-odds stay finite;
    *   3. consensus label = argmax over labels of Σ log(acc/(1−acc))
    *      from supporting workers (tie → min label).
    *
    * Both argmaxes order by (value desc, label ASC) — a
    * `max(struct(n, label))` would break count ties by MAX label,
    * violating the pinned min-label rule, so the argmax is a window
    * row_number with the explicit ascending label tail.
    *
    * @param votes one row per (item, worker, label)
    * @return per item: maj_label, ds_label, n_voters, score (6 dp)
    */
  def weightedConsensus(votes: DataFrame, itemCol: String,
      workerCol: String, labelCol: String): DataFrame =
    weightedConsensusImpl(votes, itemCol, workerCol, labelCol)

  /** Declared q214: consensus event type per day. Votes derive
    * deterministically from the events fixture — worker = user_id
    * mod 50, each worker's vote on a day is their MODAL event type
    * that day (tie → min type) — so any engine rebuilds the identical
    * vote relation.
    *
    * Tie-break correctness over the naive `max(struct(n, label))`:
    * both argmaxes here order by (count/score, MIN label), realized
    * as a window row_number with explicit asc label — see the SQL.
    */
  def q214Consensus(spark: SparkSession, d: String): DataFrame = {
    val byVote = Window.partitionBy(col("day"), col("worker"))
      .orderBy(col("__n").desc, col("label"))
    val votes = Tables.events(spark, d)
      .select(to_date(col("ts")).as("day"),
        pmod(col("user_id"), lit(50L)).as("worker"),
        col("event_type").as("label"))
      .groupBy(col("day"), col("worker"), col("label"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rk", row_number().over(byVote))
      .where(col("__rk") === 1)
      .select(col("day"), col("worker"), col("label"))
    weightedConsensus(votes, "day", "worker", "label")
  }

  private def weightedConsensusImpl(votes: DataFrame, itemCol: String,
      workerCol: String, labelCol: String): DataFrame = {
    val v = votes.select(col(itemCol).as("item"),
      col(workerCol).as("worker"), col(labelCol).as("label"))
      .localCheckpoint()
    val counts = v.groupBy(col("item"), col("label"))
      .agg(count(lit(1)).as("__n"))
    val byCount = Window.partitionBy(col("item"))
      .orderBy(col("__n").desc, col("label"))
    val maj = counts
      .withColumn("__rk", row_number().over(byCount))
      .withColumn("__tot", sum(col("__n")).over(Window.partitionBy(col("item"))))
      .where(col("__rk") === 1)
      .select(col("item"), col("label").as("maj_label"),
        col("__tot").as("n_voters"))
    val acc = v.join(maj.select(col("item"), col("maj_label")), Seq("item"))
      .groupBy(col("worker"))
      .agg((sum(when(col("label") === col("maj_label"), 1L).otherwise(0L))
        .cast("double") / count(lit(1))).as("__acc"))
      .select(col("worker"),
        least(greatest(col("__acc"), lit(0.05)), lit(0.95)).as("__acc"))
    val scored = v.join(acc, Seq("worker"))
      .groupBy(col("item"), col("label"))
      .agg(round(sum(log(col("__acc") / (lit(1.0) - col("__acc")))), 6)
        .as("__s"))
    val byScore = Window.partitionBy(col("item"))
      .orderBy(col("__s").desc, col("label"))
    val best = scored
      .withColumn("__rk", row_number().over(byScore))
      .where(col("__rk") === 1)
      .select(col("item"), col("label").as("ds_label"), col("__s").as("score"))
    maj.join(best, Seq("item"))
      .select(col("item").as(itemCol), col("maj_label"), col("ds_label"),
        col("n_voters"), col("score"))
  }

  val q214Sql: String =
    """WITH raw AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id % 50 AS worker,
      |    event_type AS label, count(*) AS n
      |  FROM events GROUP BY 1, 2, 3),
      |votes AS (
      |  SELECT day, worker, label FROM raw
      |  QUALIFY row_number() OVER (PARTITION BY day, worker
      |    ORDER BY n DESC, label) = 1),
      |counts AS (
      |  SELECT day, label, count(*) AS n FROM votes GROUP BY 1, 2),
      |maj AS (
      |  SELECT day, label AS maj_label,
      |    sum(n) OVER (PARTITION BY day) AS n_voters
      |  FROM counts
      |  QUALIFY row_number() OVER (PARTITION BY day
      |    ORDER BY n DESC, label) = 1),
      |acc AS (
      |  SELECT worker,
      |    least(greatest(
      |      CAST(sum(CASE WHEN v.label = m.maj_label THEN 1 ELSE 0 END)
      |        AS DOUBLE) / count(*), 0.05), 0.95) AS acc
      |  FROM votes v JOIN maj m USING (day) GROUP BY worker),
      |scored AS (
      |  SELECT day, label,
      |    round(sum(ln(acc / (1.0 - acc))), 6) AS s
      |  FROM votes JOIN acc USING (worker) GROUP BY 1, 2),
      |best AS (
      |  SELECT day, label AS ds_label, s FROM scored
      |  QUALIFY row_number() OVER (PARTITION BY day
      |    ORDER BY s DESC, label) = 1)
      |SELECT m.day, m.maj_label, b.ds_label,
      |  CAST(m.n_voters AS BIGINT) AS n_voters, b.s AS score
      |FROM maj m JOIN best b USING (day)""".stripMargin

  /** Bradley–Terry preference strengths by Hunter's (2004) MM
    * updates, a PINNED number of iterations (run-to-convergence is
    * neither oracle-expressible nor stage-count-deterministic; two
    * iterations from the uniform start is the documented contract):
    *
    *   s_i ← W_i / Σ_{j≠i} n_ij / (s_i + s_j),   then normalize Σ s = 1
    *
    * where n_ij = comparisons between i and j, W_i = i's wins. This
    * is the model under RLHF reward-preference fitting; here the
    * comparison relation is option-domain-bounded so every iteration
    * is metadata-scale algebra after the one big aggregate.
    *
    * @param comparisons one row per (winner, loser) duel
    * @return per option: wins, n_comparisons, strength (6 dp)
    */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String,
      loserCol: String, iterations: Int = 2): DataFrame = {
    require(iterations >= 1)
    val duels = comparisons
      .select(col(winnerCol).as("w"), col(loserCol).as("l"))
      .localCheckpoint()
    // symmetric pair counts n_ij and per-option wins
    val nij = duels
      .select(explode(array(
        struct(col("w").as("i"), col("l").as("j")),
        struct(col("l").as("i"), col("w").as("j")))).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n"))
    val wins = duels.groupBy(col("w").as("i"))
      .agg(count(lit(1)).as("wins"))
    val opts = nij.select(col("i")).distinct()
    var s = opts.select(col("i"), lit(1.0).as("s"))
    for (_ <- 1 to iterations) {
      val denom = nij
        .join(s.select(col("i"), col("s").as("si")), Seq("i"))
        .join(s.select(col("i").as("j"), col("s").as("sj")), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("n") / (col("si") + col("sj"))).as("__d"))
      val raw = denom
        .join(wins, Seq("i"), "left")
        .select(col("i"),
          (coalesce(col("wins"), lit(0L)).cast("double") / col("__d"))
            .as("__raw"))
      val tot = raw.agg(sum(col("__raw")).as("__t"))
      s = raw.crossJoin(broadcast(tot))
        .select(col("i"), (col("__raw") / col("__t")).as("s"))
    }
    s.join(wins, Seq("i"), "left")
      .join(nij.groupBy(col("i")).agg(sum(col("n")).as("n_comparisons")),
        Seq("i"))
      .select(col("i"), coalesce(col("wins"), lit(0L)).as("wins"),
        col("n_comparisons"), round(col("s"), 6).as("strength"))
  }

  /** Declared q215: event types dueling by daily total value — per
    * day, every type pair with strictly different totals produces one
    * duel won by the larger; strengths after 2 MM iterations.
    */
  def q215BradleyTerry(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .where(col("value").isNotNull)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(round(sum(col("value")), 6).as("tot"))
    val a = daily.select(col("day"), col("event_type").as("ta"),
      col("tot").as("va"))
    val b = daily.select(col("day"), col("event_type").as("tb"),
      col("tot").as("vb"))
    val duels = a.join(b, Seq("day"))
      .where(col("ta") < col("tb") && col("va") =!= col("vb"))
      .select(when(col("va") > col("vb"), col("ta")).otherwise(col("tb"))
        .as("winner"),
        when(col("va") > col("vb"), col("tb")).otherwise(col("ta"))
          .as("loser"))
    bradleyTerry(duels, "winner", "loser", iterations = 2)
      .select(col("i").as("event_type"), col("wins"),
        col("n_comparisons"), col("strength"))
  }

  val q215Sql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, event_type,
      |    round(sum(value), 6) AS tot
      |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
      |duels AS (
      |  SELECT CASE WHEN a.tot > b.tot THEN a.event_type
      |              ELSE b.event_type END AS w,
      |         CASE WHEN a.tot > b.tot THEN b.event_type
      |              ELSE a.event_type END AS l
      |  FROM daily a JOIN daily b
      |    ON a.day = b.day AND a.event_type < b.event_type
      |  WHERE a.tot <> b.tot),
      |nij AS (
      |  SELECT i, j, count(*) AS n FROM (
      |    SELECT w AS i, l AS j FROM duels
      |    UNION ALL SELECT l, w FROM duels)
      |  GROUP BY 1, 2),
      |wins AS (SELECT w AS i, count(*) AS wins FROM duels GROUP BY 1),
      |s0 AS (SELECT DISTINCT i, 1.0 AS s FROM nij),
      |d1 AS (
      |  SELECT nij.i, sum(nij.n / (si.s + sj.s)) AS d
      |  FROM nij JOIN s0 si ON si.i = nij.i JOIN s0 sj ON sj.i = nij.j
      |  GROUP BY 1),
      |r1 AS (
      |  SELECT d1.i, coalesce(wins.wins, 0) / d1.d AS raw
      |  FROM d1 LEFT JOIN wins ON wins.i = d1.i),
      |s1 AS (SELECT i, raw / (SELECT sum(raw) FROM r1) AS s FROM r1),
      |d2 AS (
      |  SELECT nij.i, sum(nij.n / (si.s + sj.s)) AS d
      |  FROM nij JOIN s1 si ON si.i = nij.i JOIN s1 sj ON sj.i = nij.j
      |  GROUP BY 1),
      |r2 AS (
      |  SELECT d2.i, coalesce(wins.wins, 0) / d2.d AS raw
      |  FROM d2 LEFT JOIN wins ON wins.i = d2.i),
      |s2 AS (SELECT i, raw / (SELECT sum(raw) FROM r2) AS s FROM r2)
      |SELECT s2.i AS event_type,
      |  CAST(coalesce(wins.wins, 0) AS BIGINT) AS wins,
      |  CAST(tc.n_comparisons AS BIGINT) AS n_comparisons,
      |  round(s2.s, 6) AS strength
      |FROM s2
      |LEFT JOIN wins ON wins.i = s2.i
      |JOIN (SELECT i, sum(n) AS n_comparisons FROM nij GROUP BY 1) tc
      |  ON tc.i = s2.i""".stripMargin

  /** Fleiss' kappa — chance-corrected agreement among MANY raters
    * (Fleiss 1971), the pool-level companion to the two-rater Cohen's
    * kappa ([[Profiling.cohensKappa]]): "are the annotators producing
    * signal or noise?" is THE gate before any crowd-labeled set is
    * trusted. Uses the variable-raters-per-item generalization: items
    * with fewer than 2 ratings carry no agreement information and are
    * excluded from BOTH the per-item agreement mean and the chance
    * marginals (documented contract; keeps the two sides consistent).
    *
    *   P_i  = Σ_k n_ik(n_ik−1) / (n_i(n_i−1))      (per-item agreement)
    *   P̄   = mean_i P_i          p_k = Σ_i n_ik / Σ_i n_i
    *   P_e  = Σ_k p_k²           κ = (P̄ − P_e) / (1 − P_e)
    *
    * κ is NULL when P_e = 1 (every rating one label — agreement is
    * vacuous, the standard degenerate case).
    *
    * Scale shape: one hash aggregate collapses ratings to (item,
    * label) integer counts; everything after is item-keyed integer
    * algebra plus a label-domain-bounded aggregate — two scalar
    * frames broadcast-combined at the end. No window, no join wider
    * than the count relation.
    *
    * @param ratings one row per individual rating (item, label)
    * @return one row: n_items, n_ratings, p_bar, p_e, kappa (6 dp)
    */
  def fleissKappa(ratings: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val nik = ratings
      .select(col(itemCol).as("item"), col(labelCol).as("label"))
      .groupBy(col("item"), col("label"))
      .agg(count(lit(1)).as("__nik"))
      .localCheckpoint()
    val perItem = nik.groupBy(col("item"))
      .agg(sum(col("__nik")).as("__ni"),
        sum(col("__nik") * (col("__nik") - 1)).as("__agree"))
      .where(col("__ni") >= 2)
    val pbar = perItem.agg(
      count(lit(1)).as("n_items"),
      sum(col("__ni")).as("n_ratings"),
      avg(col("__agree").cast("double") /
        (col("__ni") * (col("__ni") - 1)).cast("double")).as("__pbar"))
    val pe = nik
      .join(perItem.select(col("item")), Seq("item"), "left_semi")
      .groupBy(col("label"))
      .agg(sum(col("__nik")).as("__ck"))
      .agg(sum(col("__ck") * col("__ck")).cast("double")
        .as("__num"), sum(col("__ck")).cast("double").as("__den"))
      .select((col("__num") / (col("__den") * col("__den"))).as("__pe"))
    pbar.crossJoin(broadcast(pe))
      .select(col("n_items"), col("n_ratings"),
        round(col("__pbar"), 6).as("p_bar"),
        round(col("__pe"), 6).as("p_e"),
        when(col("__pe") < 1.0,
          round((col("__pbar") - col("__pe")) / (lit(1.0) - col("__pe")), 6))
          .as("kappa"))
  }

  /** Declared q234: rater agreement over the q214 vote fixture — per
    * day, the 50 derived workers' modal-event-type votes rated by
    * Fleiss' kappa. Same deterministic vote relation as q214, so any
    * engine rebuilds it identically.
    */
  def q234FleissKappa(spark: SparkSession, d: String): DataFrame = {
    val byVote = Window.partitionBy(col("day"), col("worker"))
      .orderBy(col("__n").desc, col("label"))
    val votes = Tables.events(spark, d)
      .select(to_date(col("ts")).as("day"),
        pmod(col("user_id"), lit(50L)).as("worker"),
        col("event_type").as("label"))
      .groupBy(col("day"), col("worker"), col("label"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rk", row_number().over(byVote))
      .where(col("__rk") === 1)
      .select(col("day"), col("worker"), col("label"))
    fleissKappa(votes, "day", "label")
  }

  val q234Sql: String =
    """WITH raw AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id % 50 AS worker,
      |    event_type AS label, count(*) AS n
      |  FROM events GROUP BY 1, 2, 3),
      |votes AS (
      |  SELECT day, worker, label FROM raw
      |  QUALIFY row_number() OVER (PARTITION BY day, worker
      |    ORDER BY n DESC, label) = 1),
      |nik AS (
      |  SELECT day, label, count(*) AS nik FROM votes GROUP BY 1, 2),
      |per_item AS (
      |  SELECT day, sum(nik) AS ni, sum(nik * (nik - 1)) AS agree
      |  FROM nik GROUP BY 1 HAVING sum(nik) >= 2),
      |pbar AS (
      |  SELECT count(*) AS n_items, sum(ni) AS n_ratings,
      |    avg(CAST(agree AS DOUBLE) / CAST(ni * (ni - 1) AS DOUBLE))
      |      AS pbar
      |  FROM per_item),
      |pe AS (
      |  SELECT sum(CAST(ck AS DOUBLE) * ck)
      |    / (sum(CAST(ck AS DOUBLE)) * sum(CAST(ck AS DOUBLE))) AS pe
      |  FROM (
      |    SELECT label, sum(nik) AS ck FROM nik
      |    WHERE day IN (SELECT day FROM per_item) GROUP BY 1))
      |SELECT CAST(n_items AS BIGINT) AS n_items,
      |  CAST(n_ratings AS BIGINT) AS n_ratings,
      |  round(pbar, 6) AS p_bar, round(pe, 6) AS p_e,
      |  CASE WHEN pe < 1.0 THEN round((pbar - pe) / (1.0 - pe), 6) END
      |    AS kappa
      |FROM pbar, pe""".stripMargin

  /** Krippendorff's alpha (nominal metric) — the agreement
    * coefficient that handles MISSING ratings natively: items rated
    * by any subset of the pool contribute exactly their pairable
    * ratings, which is the realistic crowd-labeling regime (Fleiss
    * assumes everyone rates everything; [[fleissKappa]] generalizes
    * loosely, alpha is the principled fix). Exact small-sample form
    * over items with n_i ≥ 2 ratings:
    *
    *   D_o = (1/n) Σ_i Σ_k n_ik(n_i − n_ik)/(n_i − 1)
    *   D_e = Σ_k n_k(n − n_k) / (n(n − 1))        n = Σ_i n_i
    *   α   = 1 − D_o/D_e       (NULL when D_e = 0: one category)
    *
    * Scale shape: identical to [[fleissKappa]] — one hash aggregate
    * to (item, label) counts, item-keyed integer algebra, one
    * label-domain aggregate, two scalars broadcast-combined.
    */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
      labelCol: String): DataFrame = {
    val nik = ratings
      .select(col(itemCol).as("item"), col(labelCol).as("label"))
      .groupBy(col("item"), col("label"))
      .agg(count(lit(1)).as("__nik"))
      .localCheckpoint()
    val perItem = nik.groupBy(col("item"))
      .agg(sum(col("__nik")).as("__ni"))
      .where(col("__ni") >= 2)
    val paired = nik.join(perItem, Seq("item"))
    val doSum = paired.agg(
      countDistinct(col("item")).as("n_items"),
      sum(col("__ni") * col("__nik")).as("__chk"),
      sum(col("__nik") * (col("__ni") - col("__nik"))
        .cast("double") / (col("__ni") - 1).cast("double")).as("__dsum"))
    val cat = paired.groupBy(col("label"))
      .agg(sum(col("__nik")).as("__nk"))
      .agg(sum(col("__nk")).as("__n"),
        sum(col("__nk") * col("__nk")).as("__nk2"))
      .select(col("__n"),
        ((col("__n") * col("__n") - col("__nk2")).cast("double") /
          (col("__n") * (col("__n") - 1)).cast("double")).as("__de"))
    doSum.crossJoin(broadcast(cat))
      .select(col("n_items"), col("__n").as("n_pairable"),
        round(col("__dsum") / col("__n"), 6).as("d_o"),
        round(col("__de"), 6).as("d_e"),
        when(col("__de") > 0,
          round(lit(1.0) - (col("__dsum") / col("__n")) / col("__de"), 6))
          .as("alpha"))
  }

  /** Declared q249: Krippendorff's alpha over the q214 vote fixture
    * (variable raters per day — exactly alpha's home regime).
    */
  def q249Krippendorff(spark: SparkSession, d: String): DataFrame = {
    val byVote = Window.partitionBy(col("day"), col("worker"))
      .orderBy(col("__n").desc, col("label"))
    val votes = Tables.events(spark, d)
      .select(to_date(col("ts")).as("day"),
        pmod(col("user_id"), lit(50L)).as("worker"),
        col("event_type").as("label"))
      .groupBy(col("day"), col("worker"), col("label"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rk", row_number().over(byVote))
      .where(col("__rk") === 1)
      .select(col("day"), col("worker"), col("label"))
    krippendorffAlpha(votes, "day", "label")
  }

  val q249Sql: String =
    """WITH raw AS (
      |  SELECT CAST(ts AS DATE) AS day, user_id % 50 AS worker,
      |    event_type AS label, count(*) AS n
      |  FROM events GROUP BY 1, 2, 3),
      |votes AS (
      |  SELECT day, worker, label FROM raw
      |  QUALIFY row_number() OVER (PARTITION BY day, worker
      |    ORDER BY n DESC, label) = 1),
      |nik AS (
      |  SELECT day, label, count(*) AS nik FROM votes GROUP BY 1, 2),
      |per_item AS (
      |  SELECT day, sum(nik) AS ni FROM nik GROUP BY 1
      |  HAVING sum(nik) >= 2),
      |paired AS (
      |  SELECT nik.day, nik.label, nik.nik, per_item.ni
      |  FROM nik JOIN per_item USING (day)),
      |ds AS (
      |  SELECT count(DISTINCT day) AS n_items,
      |    sum(CAST(nik * (ni - nik) AS DOUBLE) / (ni - 1)) AS dsum
      |  FROM paired),
      |cat AS (
      |  SELECT sum(nk) AS n,
      |    CAST(sum(nk) * sum(nk) - sum(nk * nk) AS DOUBLE)
      |      / (sum(nk) * (sum(nk) - 1)) AS de
      |  FROM (SELECT label, sum(nik) AS nk FROM paired GROUP BY 1))
      |SELECT CAST(n_items AS BIGINT) AS n_items,
      |  CAST(n AS BIGINT) AS n_pairable,
      |  round(dsum / n, 6) AS d_o, round(de, 6) AS d_e,
      |  CASE WHEN de > 0 THEN round(1.0 - (dsum / n) / de, 6) END
      |    AS alpha
      |FROM ds, cat""".stripMargin
}
