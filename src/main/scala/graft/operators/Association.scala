package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Market-basket association rules — "orders containing part A also
  * contain part B" with the classic support / confidence / lift
  * metrics. The same machinery is a recommender primitive (item-item
  * co-occurrence) and a corpus-curation one (tag/domain co-occurrence).
  *
  * Scale shape: baskets collapse to distinct (basket, item) in one
  * shuffle; co-occurrence pairs explode MAP-SIDE from each basket's
  * collected item set (Σ k·(k−1) per basket, k bounded by basket
  * size — never items², the q107 co-build shape), and the min-count
  * gate prunes the pair relation BEFORE the two metric joins, which
  * AQE turns into broadcasts whenever the item side is small. The only
  * driver value is the scalar basket count.
  */
object Association {

  /** Directed rules a→b over baskets: n_ab co-baskets, per-item basket
    * counts, support = n_ab/N, confidence = n_ab/n_a and
    * lift = confidence·N/n_b, keeping rules with n_ab ≥ `minCount`.
    */
  def associationRules(items: DataFrame, basketCol: String, itemCol: String,
      minCount: Long): DataFrame = {
    // ONE shuffle of the raw basket rows: collect_set dedups within
    // each basket, so no pre-distinct pass is needed — per-item basket
    // counts, the basket total, and the pair explode all derive from
    // the 1-row-per-basket sets relation, sharing its partial-aggregate
    // exchange via ReuseExchange (measured against both an eager and a
    // lazy checkpoint of `sets`: exchange reuse wins — the checkpoint's
    // cache write costs more than the re-run merges it saves)
    val sets = items
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .groupBy(col("bk")).agg(collect_set(col("it")).as("is"))
    // double codegen explode + filter, NOT a higher-order `filter`
    // lambda inside the explode: interpreted lambdas cost ~7x per
    // element and baskets are tiny, so k² generated rows are cheaper
    // than k·(k−1)/2 interpreted ones. Only CANONICAL a < b pairs are
    // generated and counted — co-occurrence is symmetric, so counting
    // one orientation and mirroring AFTER the aggregate halves the
    // rows entering the groupBy(a,b) exchange, the operator's only
    // super-linear shuffle
    val pairs = sets
      .select(explode(col("is")).as("a"), col("is"))
      .select(col("a"), explode(col("is")).as("b"))
      .where(col("a") < col("b"))
    val nAbCanon = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
    val nAb = nAbCanon.unionByName(
      nAbCanon.select(col("b").as("a"), col("a").as("b"), col("n_ab")))
    val itemN = sets.select(explode(col("is")).as("it"))
      .groupBy(col("it")).agg(count(lit(1)).as("n"))
    // the basket total rides the SAME execution as a broadcast scalar
    // instead of a separate driver action
    val totals = sets.agg(count(lit(1)).as("__nb"))
    nAb
      .join(itemN.select(col("it").as("a"), col("n").as("n_a")), Seq("a"))
      .join(itemN.select(col("it").as("b"), col("n").as("n_b")), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / col("__nb")).as("support"),
        (col("n_ab").cast("double") / col("n_a")).as("confidence"),
        (col("n_ab").cast("double") / col("n_a") * col("__nb") / col("n_b"))
          .as("lift"))
  }

  /** Declared q116: part co-purchase rules over order baskets. */
  def q116AssocRules(spark: SparkSession, d: String): DataFrame =
    associationRules(
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", minCount = 3L)

  val q116Sql: String =
    """WITH bi AS (
      |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
      |tot AS (SELECT count(DISTINCT bk) AS n FROM bi),
      |ab AS (
      |  SELECT x.it AS a, y.it AS b, count(*) AS n_ab
      |  FROM bi x JOIN bi y ON x.bk = y.bk AND x.it <> y.it
      |  GROUP BY 1, 2 HAVING count(*) >= 3),
      |itemn AS (SELECT it, count(*) AS n FROM bi GROUP BY 1)
      |SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
      |  CAST(ia.n AS BIGINT) AS n_a, CAST(ib.n AS BIGINT) AS n_b,
      |  CAST(n_ab AS DOUBLE) / t.n AS support,
      |  CAST(n_ab AS DOUBLE) / ia.n AS confidence,
      |  CAST(n_ab AS DOUBLE) / ia.n * t.n / ib.n AS lift
      |FROM ab
      |JOIN itemn ia ON ab.a = ia.it
      |JOIN itemn ib ON ab.b = ib.it
      |CROSS JOIN tot t""".stripMargin
}
