package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Point-in-time (as-of) join — for each left row, the latest right row
  * with the same key whose time is ≤ the left row's time (optionally
  * within a tolerance). Spark has no native operator for this; per the
  * extension preference order (compose built-ins before custom
  * Catalyst), it is built from a UNION + one window pass:
  *
  *   1. Tag both sides and union them (right rows sort before left rows
  *      at equal timestamps, giving ≤ semantics).
  *   2. One window per key ordered by (time, side):
  *      `last(right payload, ignoreNulls)` over unbounded-preceding..
  *      current carries the most recent right row forward.
  *   3. Keep left rows; null out matches older than the tolerance.
  *
  * Cost: exactly ONE shuffle + sort on (key), regardless of side sizes —
  * versus the naive correlated-subquery form, which is a join explosion
  * + per-group sort. This is the shape that survives 100 TB event
  * tables: both inputs stream through the same partitioning.
  */
object AsOfJoin {

  /** @param rightValueCols right columns carried to the output (as
    *                       `right_<name>`, null when no match)
    * @param toleranceUs    max (leftTime − rightTime) in µs; < 0 = ∞
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTimeCol: String,
      rightTimeCol: String,
      rightValueCols: Seq[String],
      toleranceUs: Long = -1L): DataFrame = {
    val leftCols = left.columns.toSeq
    val matchStruct = struct(
      (col(rightTimeCol).as("__rt") +: rightValueCols.map(col)): _*)

    val taggedRight = right.select(
      col(keyCol).as("__key"),
      col(rightTimeCol).as("__t"),
      lit(0).as("__side"),
      matchStruct.as("__match"),
      typedLit[Option[Long]](None).as("__left_id"))
    // row id keeps duplicate left rows distinct through the union
    val withId = left.withColumn("__left_id", monotonically_increasing_id())
    val taggedLeft = withId.select(
      col(keyCol).as("__key"),
      col(leftTimeCol).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(taggedRight.schema("__match").dataType).as("__match"),
      col("__left_id").as("__left_id"))

    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__match"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val withinTol =
      if (toleranceUs < 0) col("__asof")
      else when(
        unix_micros(col("__t")) - unix_micros(col("__asof.__rt")) <= toleranceUs,
        col("__asof"))
    val matched = carried.select(col("__left_id"), withinTol.as("__asof"))

    withId.join(matched, Seq("__left_id"))
      .select(leftCols.map(col) ++
        (col("__asof.__rt").as(s"right_$rightTimeCol") +:
          rightValueCols.map(c => col(s"__asof.$c").as(s"right_$c"))): _*)
  }

  /** For each purchase, the user's most recent error at-or-before it,
    * within 2 hours — the classic "what went wrong before they bought"
    * point-in-time lookup, oracle-checked against DuckDB's native
    * ASOF JOIN.
    */
  def q49AsOfJoin(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.where(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id").as("error_id"),
        col("value").as("error_value"))
    asOf(purchases, errors,
      keyCol = "user_id", leftTimeCol = "ts", rightTimeCol = "ts",
      rightValueCols = Seq("error_id", "error_value"),
      toleranceUs = 2L * 3600 * 1000000)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("right_error_id").as("error_id"),
        col("right_error_value").as("error_value"))
  }

  val q49Sql: String =
    """SELECT p.event_id, p.user_id, p.ts,
      | CASE WHEN e.ts >= p.ts - INTERVAL 2 HOUR THEN e.error_id END AS error_id,
      | CASE WHEN e.ts >= p.ts - INTERVAL 2 HOUR THEN e.error_value END AS error_value
      |FROM (SELECT event_id, user_id, ts FROM events
      |      WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS error_id,
      |                 value AS error_value FROM events
      |                 WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id AND e.ts <= p.ts""".stripMargin
}
