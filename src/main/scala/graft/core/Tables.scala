package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed accessors for the driver-generated fixture tables
  * (`TESTDATA.md`, `FIXTURES.md` §1). One parquet file per table under
  * `sfDir` (e.g. `/root/testdata/sf0.01`).
  *
  * At 100 TB each of these would be a partitioned parquet dataset (or a
  * [[graft.tables.DeltaLikeTable]]); `spark.read.parquet` on a directory
  * scales identically, so callers never assume single-file layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any realistic scale
    * (TPC-H region/nation are fixed-cardinality; supplier/part/customer
    * grow with sf but stay orders of magnitude under fact tables).
    * Used by query code to decide broadcast hints.
    */
  val broadcastableDims: Set[String] = Set("region", "nation", "supplier")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  /** `events.ts` has shipped under two parquet physical types, both of
    * which need normalizing to a session-TZ TIMESTAMP:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses to read it as a timestamp. Read
    *    nanos as LONG (legacy conf) and truncate to microseconds with
    *    integer division (a double division would lose precision at
    *    1.7e18 ns) — DuckDB's ns→µs read truncates identically.
    *  - TIMESTAMP_MICROS with `isAdjustedToUTC=false`: Spark 4 infers
    *    TIMESTAMP_NTZ (`spark.sql.parquet.inferTimestampNTZ.enabled`
    *    defaults true), and `unix_micros`/watermark sites reject NTZ.
    *    Cast to TIMESTAMP — under the UTC session every entry point sets,
    *    the cast is wall-clock identity and matches DuckDB's `epoch_us`.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
