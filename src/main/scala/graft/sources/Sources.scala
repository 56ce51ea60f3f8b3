package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-declared file sources (SURVEY.md §2.A1/A2).
  *
  * The reference never infers schemas: it reads CSV with an explicit DDL
  * string, `header=True` only to skip the header row, and a non-default
  * `;` separator (`/root/reference/sparkcode/titanic_example_delta.py:18-22`).
  * Declared schemas are also the scale-correct choice — inference costs
  * an extra pass over the data and can mis-type columns on a sample.
  */
object Sources {

  /** CSV directory/file → DataFrame with an explicit DDL schema.
    * Defaults mirror the reference: header row skipped, `;` separator.
    */
  def csv(
      spark: SparkSession,
      path: String,
      ddl: String,
      sep: String = ";",
      header: Boolean = true): DataFrame =
    spark.read
      .schema(StructType.fromDDL(ddl))
      .option("header", header.toString)
      .option("sep", sep)
      .csv(path)

  /** Parquet with a declared schema (skips footer merging at planning
    * time and pins reader types at scale).
    */
  def parquet(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddl)).parquet(path)

  /** JSON-lines with a declared schema (no sampling pass). */
  def jsonLines(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddl)).json(path)
}
