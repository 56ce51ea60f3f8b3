package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming slice (SURVEY.md §2.E16): the same event-time
  * logic runs in batch and on an unbounded file stream.
  *
  * Design rule: the aggregation is ONE function over a DataFrame —
  * `readStream` vs `read` is the only difference between the modes, so
  * batch-vs-stream equivalence is testable and the 100 TB batch pipeline
  * and its incremental streaming twin can't drift apart.
  */
object EventStream {

  /** events-shaped schema as produced by [[graft.core.Tables.events]]
    * after its ns→µs normalization.
    */
  val eventSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** Tumbling event-time windows per event type — identical expression to
    * the batch q33 aggregation. On a stream, add a watermark upstream.
    */
  def windowedByType(events: DataFrame, windowDur: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(12, 4))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Unbounded file-source stream over a directory of events parquet. */
  def readEventStream(
      spark: SparkSession,
      dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Streaming windowed aggregation with watermarking: late events more
    * than `lateness` behind the max seen ts are dropped; closed windows
    * are emitted finally (append mode) and their state evicted — bounded
    * state on an unbounded stream.
    */
  def windowedWithWatermark(
      stream: DataFrame,
      windowDur: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    windowedByType(stream.withWatermark("ts", lateness), windowDur)

  // ---- custom keyed state: per-user running profile -------------------

  case class EventRow(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  case class UserProfile(
      user_id: Long, n_events: Long, sum_value: Double, last_ts: java.sql.Timestamp)

  /** Per-user running profile via `mapGroupsWithState` — the custom-state
    * extension point (arbitrary accumulator logic, here count/sum/last
    * seen). State is per key, partitioned by user: at scale this is one
    * shuffle and O(users) state, evictable by timeout in production.
    */
  def userProfiles(events: Dataset[EventRow]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](
        GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EventRow], state: GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(
            UserProfile(user, 0L, 0.0, new java.sql.Timestamp(0L)))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserProfile(
              user,
              acc.n_events + 1,
              // decimal-cent arithmetic: associative, partition-order-proof
              (BigDecimal(acc.sum_value) + BigDecimal(e.value)).toDouble,
              if (e.ts.after(acc.last_ts)) e.ts else acc.last_ts)
          }
          state.update(next)
          next
      }
  }

  /** Batch twin of [[userProfiles]] for the equivalence spec. */
  def userProfilesBatch(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(20, 10))).cast(DoubleType).as("sum_value"),
        max(col("ts")).as("last_ts"))
}
