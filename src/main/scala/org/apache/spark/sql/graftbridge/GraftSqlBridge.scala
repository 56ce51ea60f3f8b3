package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge into `private[sql]` surface, the established pattern
  * for Spark-ecosystem connectors that must turn an analyzer-captured
  * `LogicalPlan` back into a `DataFrame` (the public API offers no
  * constructor for that). Kept to this single call.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Clone a session INCLUDING its current SQL conf (unlike the public
    * `newSession()`, which resets to the context defaults — losing e.g.
    * the tuned shuffle-partition count). Used for per-operator conf
    * overrides that must not mutate the caller's session.
    */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[classic.SparkSession].cloneSession()

  /** Re-wrap a batch DataFrame as a STREAMING one (`isStreaming = true`)
    * — what a DSv1 `Source.getBatch` must return so MicroBatchExecution
    * accepts the plan. The established custom-source pattern
    * (`internalCreateDataFrame` over the batch's InternalRow RDD); the
    * only other `private[sql]` call this bridge exposes.
    */
  def asStreamingBatch(spark: SparkSession, df: DataFrame): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    cs.internalCreateDataFrame(
      df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]].queryExecution.toRdd,
      df.schema, isStreaming = true)
  }
}
