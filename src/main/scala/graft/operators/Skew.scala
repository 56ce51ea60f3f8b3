package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (SURVEY.md north star: "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when a single key's rows exceed what one
  * task should hold even after AQE splitting (e.g. a null-key flood or
  * one viral entity), or when AQE is unavailable (streaming joins).
  */
object Skew {

  /** Equi-join `large ⋈ small` on `key`, spreading each hot key of the
    * large side over `saltFactor` partitions: the large side gets a
    * deterministic per-row salt (hash of the whole row, so identical
    * keys scatter), the small side is replicated `saltFactor`×, and the
    * join runs on (key, salt).
    *
    * Result equality with the plain join holds for `inner` and `left`
    * (large-preserving) joins; small-preserving types would duplicate
    * unmatched small rows and are rejected.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"salted join preserves the large side only; got $joinType")
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val saltCol = "__graft_salt"
    val salted = large.withColumn(saltCol,
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = small
      .withColumn(saltCol, explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted.join(replicated, Seq(key, saltCol), joinType).drop(saltCol)
  }

  /** Join-key skew report — the pre-flight check before keying a
    * shuffle on a column: distinct keys, the heaviest key's row count
    * and share, frequency percentiles, and the skew factor
    * (max/mean) that predicts whether AQE splitting or [[saltedJoin]]
    * will be needed. One hash aggregate to the key-frequency support,
    * then a support-sized summary aggregate.
    *
    * @return one row: n_rows, n_keys, max_key_rows, top1_share,
    *         p50_rows, p99_rows, skew_factor
    */
  def keySkewReport(df: DataFrame, keyCol: String): DataFrame = {
    val freq = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    freq.agg(
        sum(col("__c")).as("__n"),
        count(lit(1)).as("__k"),
        max(col("__c")).as("__mx"),
        percentile(col("__c"), lit(0.5)).as("__p50"),
        percentile(col("__c"), lit(0.99)).as("__p99"))
      .select(col("__n").as("n_rows"), col("__k").as("n_keys"),
        col("__mx").as("max_key_rows"),
        (col("__mx").cast("double") / col("__n")).as("top1_share"),
        col("__p50").as("p50_rows"), col("__p99").as("p99_rows"),
        (col("__mx") / (col("__n").cast("double") / col("__k")))
          .as("skew_factor"))
  }

  /** Declared q180: how safe is user_id as a shuffle key. */
  def q180KeySkew(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    keySkewReport(graft.core.Tables.events(spark, d), "user_id")

  val q180Sql: String =
    """WITH f AS (
      |  SELECT user_id, count(*) AS c FROM events GROUP BY 1),
      |s AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
      |    CAST(max(c) AS BIGINT) AS mx,
      |    quantile_cont(c, 0.5) AS p50, quantile_cont(c, 0.99) AS p99
      |  FROM f)
      |SELECT n AS n_rows, k AS n_keys, mx AS max_key_rows,
      |  CAST(mx AS DOUBLE) / n AS top1_share,
      |  p50 AS p50_rows, p99 AS p99_rows,
      |  mx / (CAST(n AS DOUBLE) / k) AS skew_factor
      |FROM s""".stripMargin

  /** Declared q275: the salted join's RESULT-EQUALITY contract, run as
    * a declared relation — events (the large side; `event_type` has
    * only 5 distinct values, the maximally-skewed shuffle key) join a
    * per-type dimension through [[saltedJoin]] at salt factor 8, then
    * a per-type readout. The DuckDB oracle computes the PLAIN join —
    * hash equality IS the proof that salting changed execution, not
    * semantics (the spec proves the same locally; this pins it against
    * an independent engine every round at data scale).
    */
  def q275SaltedJoin(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val ev = graft.core.Tables.events(spark, d)
      .select(col("event_type"), col("value"))
    val dim = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("type_avg"))
    saltedJoin(ev, dim, "event_type", saltFactor = 8)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > col("type_avg"), 1L).otherwise(0L))
          .as("n_above_avg"),
        round(max(col("type_avg")), 6).as("type_avg"))
  }

  val q275Sql: String =
    """WITH dim AS (
      |  SELECT event_type, avg(value) AS type_avg
      |  FROM events GROUP BY 1)
      |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN e.value > d.type_avg THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_above_avg,
      |  round(max(d.type_avg), 6) AS type_avg
      |FROM events e JOIN dim d ON d.event_type = e.event_type
      |GROUP BY 1""".stripMargin
}
